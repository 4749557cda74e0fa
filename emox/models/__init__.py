"""Model compositions: VAE, UNet (2D reference-net + 3D denoiser modes),
wav2vec2-style audio encoder, and the full EMO bundle."""

from emox.models.vae import AutoencoderKL, DiagonalGaussian
from emox.models.unet import UNet, UNetOutputs
from emox.models.audio import AudioEncoder, align_audio_to_frames
from emox.models.emo import EMOModel, EMOModules

__all__ = [
    "AutoencoderKL",
    "DiagonalGaussian",
    "UNet",
    "UNetOutputs",
    "AudioEncoder",
    "align_audio_to_frames",
    "EMOModel",
    "EMOModules",
]
