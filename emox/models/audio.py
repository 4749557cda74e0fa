"""wav2vec2-compatible audio encoder + audio->video-frame alignment.

Replaces the reference's frozen HuggingFace Wav2Vec2 feature extraction
(reference Net.py:607-797 Wav2VecFeatureExtractor, wav2vec2-base-960h).
The architecture mirrors wav2vec2-base exactly (conv front-end with
group-norm on layer 0 only, post-LayerNorm transformer, grouped positional
conv) so pretrained PyTorch weights import losslessly via emox.interop;
random init trains fine from scratch at any smaller AudioConfig scale.

Framing: per-video-frame windows of 2*context+1 feature vectors with zero
edge padding (reference Net.py:646-667 semantics).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from emox.core.config import AudioConfig
from emox.nn.attention_blocks import Attention


class ConvFeatureExtractor(nn.Module):
    """Raw waveform [B, S] -> [B, T_a, conv_dim] (wav2vec2 conv stack:
    group-norm after layer 0 only, no biases, GELU)."""

    cfg: AudioConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        h = wav.astype(self.dtype)[..., None]  # [B, S, 1]
        for i, (k, s) in enumerate(zip(self.cfg.conv_kernels, self.cfg.conv_strides)):
            h = nn.Conv(
                self.cfg.conv_dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv{i}",
            )(h)
            if i == 0:
                h = nn.GroupNorm(
                    num_groups=self.cfg.conv_dim, epsilon=1e-5,  # torch GroupNorm default
                    dtype=self.dtype, param_dtype=self.param_dtype, name="gn0"
                )(h)
            h = nn.gelu(h, approximate=False)
        return h


class EncoderLayer(nn.Module):
    """Post-LN transformer layer (wav2vec2-base, do_stable_layer_norm=False)."""

    cfg: AudioConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        head_dim = self.cfg.hidden_dim // self.cfg.num_heads
        a = Attention(self.cfg.num_heads, head_dim, qkv_bias=True, name="attn", **kw)(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm1", **kw)(h + a)
        f = nn.Dense(4 * self.cfg.hidden_dim, name="ff1", **kw)(h)
        f = nn.Dense(self.cfg.hidden_dim, name="ff2", **kw)(nn.gelu(f, approximate=False))
        return nn.LayerNorm(epsilon=1e-5, name="norm2", **kw)(h + f)


class AudioEncoder(nn.Module):
    """waveform [B, S] -> features [B, T_a, hidden_dim] at 50 Hz."""

    cfg: AudioConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        cfg = self.cfg
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = ConvFeatureExtractor(cfg, name="feature_extractor", **kw)(wav)
        h = nn.LayerNorm(epsilon=1e-5, name="feat_norm", **kw)(h)
        h = nn.Dense(cfg.hidden_dim, name="feat_proj", **kw)(h)
        # grouped positional conv, kernel 128 pad 64, drop last step (wav2vec2)
        pos = nn.Conv(
            cfg.hidden_dim, (128,), padding=((64, 64),), feature_group_count=16, name="pos_conv", **kw
        )(h)[:, :-1]
        h = h + nn.gelu(pos, approximate=False)
        h = nn.LayerNorm(epsilon=1e-5, name="enc_norm", **kw)(h)
        for i in range(cfg.num_layers):
            h = EncoderLayer(cfg, name=f"layer_{i}", **kw)(h)
        return h


def align_audio_to_frames(
    features: jax.Array,  # [B, T_a, D] encoder output
    num_frames: int,
    feature_rate: float,  # features per second (sample_rate / total_stride)
    video_fps: float = 25.0,
    context: int = 2,
    frame_offset: float = 0.0,
) -> jax.Array:
    """Per-video-frame audio windows [B, T, 2*context+1, D].

    Frame f's window covers feature indices nearest to the frame timestamps
    f-context .. f+context; out-of-range positions are zero (reference
    Net.py:646-667: zero padding at clip edges). frame_offset shifts frame 0
    relative to the waveform start (used when the loader prepends `context`
    frames of audio margin).
    """
    b, ta, d = features.shape
    frame_idx = jnp.arange(num_frames, dtype=jnp.float32) + frame_offset
    offsets = jnp.arange(-context, context + 1, dtype=jnp.float32)
    pos = (frame_idx[:, None] + offsets[None, :]) / video_fps * feature_rate
    idx = jnp.round(pos).astype(jnp.int32)  # [T, A]
    valid = (idx >= 0) & (idx < ta)
    idx_c = jnp.clip(idx, 0, ta - 1)
    gathered = features[:, idx_c.reshape(-1), :].reshape(b, num_frames, offsets.shape[0], d)
    return jnp.where(valid[None, :, :, None], gathered, 0.0)


def audio_feature_rate(cfg: AudioConfig) -> float:
    return cfg.sample_rate / cfg.total_stride
