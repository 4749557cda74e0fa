"""Latent frame interpolation (reference magicanimate/utils/util.py:116-138
linear/slerp; reference EMOAnimationPipeline.py:479-512): upsample the frame
rate post-hoc by interpolating between adjacent latent frames."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lerp_latents(a: jax.Array, b: jax.Array, t: float) -> jax.Array:
    return (1.0 - t) * a + t * b


def slerp_latents(a: jax.Array, b: jax.Array, t: float, dot_threshold: float = 0.9995) -> jax.Array:
    """Spherical interpolation on flattened latents; falls back to lerp when
    nearly parallel."""
    af = a.reshape(-1).astype(jnp.float32)
    bf = b.reshape(-1).astype(jnp.float32)
    dot = jnp.sum(af * bf) / (jnp.linalg.norm(af) * jnp.linalg.norm(bf) + 1e-12)
    omega = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    so = jnp.sin(omega)
    slerped = (jnp.sin((1.0 - t) * omega) / so) * af + (jnp.sin(t * omega) / so) * bf
    lerped = (1.0 - t) * af + t * bf
    out = jnp.where(jnp.abs(dot) > dot_threshold, lerped, slerped)
    return out.reshape(a.shape).astype(a.dtype)


def interpolate_latents(latents: jax.Array, factor: int, mode: str = "slerp") -> jax.Array:
    """[B, T, ...] -> [B, (T-1)*factor + 1, ...] inserting factor-1
    interpolated frames between each adjacent pair."""
    if factor <= 1:
        return latents
    b, t = latents.shape[:2]
    fn = slerp_latents if mode == "slerp" else lerp_latents
    frames = [latents[:, 0]]
    for i in range(t - 1):
        for j in range(1, factor):
            frames.append(fn(latents[:, i], latents[:, i + 1], j / factor))
        frames.append(latents[:, i + 1])
    return jnp.stack(frames, axis=1)
