"""Flax linen building blocks.

Pure-functional replacements for the reference's model zoo: pseudo-3D resnet
blocks (reference magicanimate/models/resnet.py), spatial/cross transformers
(reference magicanimate/models/attention.py), AnimateDiff-style temporal
modules (reference magicanimate/models/motion_module.py), EMO conditioners
(reference Net.py: SpeedEncoder, FaceLocator, FaceRegionController). All
attention flows through emox.ops.dot_product_attention; reference-image
features are explicit arguments (no monkey-patched banks).
"""

from emox.nn.embeddings import timestep_embedding, TimestepEmbedder, sinusoidal_positions
from emox.nn.blocks import FusedGroupNorm, ResBlock, Downsample, Upsample
from emox.nn.attention_blocks import (
    Attention,
    TransformerBlock,
    SpatialTransformer,
    TemporalTransformer,
    AudioCrossAttention,
)
from emox.nn.conditioners import SpeedEncoder, FaceLocator, FaceMaskEncoder

__all__ = [
    "timestep_embedding",
    "TimestepEmbedder",
    "sinusoidal_positions",
    "FusedGroupNorm",
    "ResBlock",
    "Downsample",
    "Upsample",
    "Attention",
    "TransformerBlock",
    "SpatialTransformer",
    "TemporalTransformer",
    "AudioCrossAttention",
    "SpeedEncoder",
    "FaceLocator",
    "FaceMaskEncoder",
]
