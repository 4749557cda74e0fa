"""AOT export for serving: compile-once, deploy-many.

The reference has no deployment story (inference.py is a dead script,
reference inference.py:14-26 calls a constructor that does not exist).
TPU-native serving here = `jax.export`: trace + lower the full denoise
pipeline once, serialize the StableHLO artifact, and reload it in a server
process without Python model code — version-stable, compile-cache-friendly,
and runnable under pure libtpu runtimes.

    exp = export_denoise_step(model, params_shape, T=16, size=256)
    save_exported(exp, "emox_step.bin")
    ...
    fn = load_exported("emox_step.bin")   # callable, jit-compatible
    out = fn(params, noisy, t, ref_latent, audio, speeds, face_mask)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from emox.models.emo import EMOModel


def _export_mod():
    from jax import export as jax_export  # jax >= 0.4.30

    return jax_export


def export_denoise_step(
    model: EMOModel,
    params,
    num_frames: int = 16,
    image_size: int = 256,
    batch: int = 1,
    dtype=jnp.bfloat16,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the fully-conditioned denoise step (the bench/entry graph).

    `params` may be real arrays or jax.ShapeDtypeStruct shapes. Returns a
    jax.export.Exported object.
    """
    cfg = model.config
    lat = image_size // cfg.vae.downscale

    def step(params, noisy, t, ref_latent, audio, speeds, face_mask):
        return model.predict_noise(
            params, noisy, t, ref_latent, audio_windows=audio, speeds=speeds, face_mask=face_mask
        )

    a_win = 2 * cfg.audio.context_frames + 1
    args = (
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params),
        jax.ShapeDtypeStruct((batch, num_frames, lat, lat, cfg.model.in_channels), dtype),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch, lat, lat, cfg.model.in_channels), dtype),
        jax.ShapeDtypeStruct((batch, num_frames, a_win, cfg.audio.hidden_dim), dtype),
        jax.ShapeDtypeStruct((batch, num_frames), dtype),
        jax.ShapeDtypeStruct((batch, image_size, image_size, 1), dtype),
    )
    kw = {}
    if platforms is not None:
        kw["platforms"] = list(platforms)
    return _export_mod().export(jax.jit(step), **kw)(*args)


def save_exported(exported, path: str) -> str:
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_exported(path: str):
    """Deserialize to a callable usable under jax.jit."""
    with open(path, "rb") as f:
        data = f.read()
    exported = _export_mod().deserialize(bytearray(data))
    return exported.call
