"""AutoencoderKL-shaped VAE in Flax (NHWC).

Same topology family as the frozen SD VAE the reference loads
(stabilityai/sd-vae-ft-mse, reference train_stage_1_referencenet.py:124-127):
conv encoder with channel multipliers, mid-block single-head attention,
diagonal-Gaussian latent (4 channels, x0.18215 scaling,
reference train_stage_1_referencenet.py:162-164), symmetric decoder.
Weights can be imported from a PyTorch checkpoint via emox.interop.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from emox.core.config import VAEConfig
from emox.nn.blocks import FusedGroupNorm, ResBlock, Downsample, Upsample
from emox.nn.attention_blocks import Attention


class DiagonalGaussian:
    """Latent distribution: moments [..., 2*C] -> sample/mode/kl."""

    def __init__(self, moments: jax.Array):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        return 0.5 * jnp.sum(self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar, axis=(-3, -2, -1))


class MidAttention(nn.Module):
    """Single-head full attention over H*W tokens (SD VAE mid block)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        hdn = FusedGroupNorm(self.groups, param_dtype=self.param_dtype, name="norm")(x)
        tokens = hdn.reshape(n, h * w, c)
        out = Attention(heads=1, head_dim=c, qkv_bias=True, dtype=self.dtype, param_dtype=self.param_dtype, name="attn")(tokens)
        return x + out.reshape(n, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        chans = [cfg.base_channels * m for m in cfg.channel_multipliers]
        h = nn.Conv(chans[0], (3, 3), name="conv_in", **kw)(x)
        for level, ch in enumerate(chans):
            for i in range(cfg.num_res_blocks):
                h = ResBlock(ch, groups=cfg.norm_groups, name=f"down_{level}_res_{i}", **kw)(h)
            if level < len(chans) - 1:
                h = Downsample(ch, padding="SAME", name=f"down_{level}_ds", **kw)(h)
        h = ResBlock(chans[-1], groups=cfg.norm_groups, name="mid_res_0", **kw)(h)
        h = MidAttention(groups=cfg.norm_groups, name="mid_attn", **kw)(h)
        h = ResBlock(chans[-1], groups=cfg.norm_groups, name="mid_res_1", **kw)(h)
        h = FusedGroupNorm(cfg.norm_groups, silu=True, param_dtype=self.param_dtype, name="norm_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), name="conv_out", **kw)(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        chans = [cfg.base_channels * m for m in cfg.channel_multipliers]
        h = nn.Conv(chans[-1], (3, 3), name="conv_in", **kw)(z)
        h = ResBlock(chans[-1], groups=cfg.norm_groups, name="mid_res_0", **kw)(h)
        h = MidAttention(groups=cfg.norm_groups, name="mid_attn", **kw)(h)
        h = ResBlock(chans[-1], groups=cfg.norm_groups, name="mid_res_1", **kw)(h)
        for level, ch in reversed(list(enumerate(chans))):
            for i in range(cfg.num_res_blocks + 1):
                h = ResBlock(ch, groups=cfg.norm_groups, name=f"up_{level}_res_{i}", **kw)(h)
            if level > 0:
                h = Upsample(ch, name=f"up_{level}_us", **kw)(h)
        h = FusedGroupNorm(cfg.norm_groups, silu=True, param_dtype=self.param_dtype, name="norm_out")(h)
        return nn.Conv(cfg.in_channels, (3, 3), name="conv_out", **kw)(h)


class AutoencoderKL(nn.Module):
    """encode: image [B, H, W, 3] in [-1, 1] -> DiagonalGaussian over
    [B, H/8, W/8, 4]; decode: latent -> image. Callers multiply by
    cfg.scaling_factor after sampling (SD convention)."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(self.cfg, **kw)
        self.decoder = Decoder(self.cfg, **kw)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1), **kw)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1), **kw)

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        return DiagonalGaussian(self.quant_conv(self.encoder(x)))

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None):
        dist = self.encode(x)
        z = dist.sample(key) if key is not None else dist.mode()
        return self.decode(z), dist
