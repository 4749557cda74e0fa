"""Pallas TPU kernels + XLA fallbacks for the hot ops.

One blockwise flash-attention kernel serves all four attention layouts in the
framework (spatial self-attention, reference-image K/V-concat attention,
audio/text cross-attention, temporal attention) — replacing the reference's
xformers `memory_efficient_attention` and sliced-attention paths
(reference magicanimate/models/orig_attention.py:516-737,
magicanimate/models/unet_controlnet.py:259-322).
"""

from emox.ops.attention import (
    attention_xla,
    dot_product_attention,
    dot_product_attention_nlc,
    flash_attention,
    flash_attention_nlc,
)
from emox.ops.ff import (
    fused_geglu_ff,
    fused_ln_geglu_ff,
    fused_ln_qkv,
    geglu_ff,
    geglu_ff_xla,
    ln_geglu_ff_xla,
    ln_qkv_xla,
)
from emox.ops.groupnorm import group_norm, group_norm_silu

__all__ = [
    "geglu_ff",
    "geglu_ff_xla",
    "fused_geglu_ff",
    "fused_ln_geglu_ff",
    "fused_ln_qkv",
    "ln_geglu_ff_xla",
    "ln_qkv_xla",
    "dot_product_attention",
    "dot_product_attention_nlc",
    "attention_xla",
    "flash_attention",
    "flash_attention_nlc",
    "group_norm",
    "group_norm_silu",
]
