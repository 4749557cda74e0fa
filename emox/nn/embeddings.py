"""Timestep + positional embeddings.

Sinusoidal timestep embedding with the SD convention (downscale_freq_shift=0,
max_period 10000, cos/sin concat — matching the semantics of the reference's
vendored diffusers embeddings, reference magicanimate/models/embeddings.py:28-68)
and the temporal positional encoding used by the motion modules (reference
magicanimate/models/motion_module.py:230-248, max_len 24).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0, flip_sin_to_cos: bool = True) -> jax.Array:
    """Sinusoidal embedding of integer timesteps -> [B, dim] (fp32)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def sinusoidal_positions(max_len: int, dim: int) -> jax.Array:
    """[max_len, dim] sin/cos table (interleaved sin at even, cos at odd)."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim))
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div)[:, : dim // 2])
    return pe


class TimestepEmbedder(nn.Module):
    """sinusoidal -> Dense -> SiLU -> Dense (reference embeddings.py TimestepEmbedding)."""

    dim: int
    sinusoidal_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        emb = timestep_embedding(timesteps, self.sinusoidal_dim)
        emb = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(emb.astype(self.dtype))
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(emb)
        return emb
