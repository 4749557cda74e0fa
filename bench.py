"""Benchmark: denoise-step throughput on the flagship config.

Measures the BASELINE.json north-star metric: denoise steps/sec/chip for a
16-frame 256^2 clip through the full conditioned denoise step — exactly
what the reference pipeline does per timestep (reference
EMOAnimationPipeline.py:698-821): ReferenceNet/writer forward at this
timestep + UNet3D with reference/temporal/audio/speed/face conditioning,
bf16. Per-clip work (VAE encode of the reference image, wav2vec2 audio
features) is computed once outside the timed loop, as in any real sampler.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver-defined target of 1.0 flagship
denoise steps/sec/chip (the reference publishes no numbers — SURVEY.md §6 —
so the target anchors round-over-round comparison on the same metric).

Env knobs: EMOX_BENCH_PRESET=flagship|flagship512|small|tiny (default
flagship), EMOX_BENCH_ITERS (default 10).
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent XLA compile cache: the flagship program cold-compiles in
# minutes (packed pallas kernels ~5 min/shape through the axon compile
# helper); cached reruns start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emox_tpu_cache")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from emox.core.presets import PRESETS
    from emox.models.emo import EMOModel

    preset = os.environ.get("EMOX_BENCH_PRESET", "flagship")
    iters = int(os.environ.get("EMOX_BENCH_ITERS", "10"))
    num_frames = 16
    sizes = {"flagship": 256, "flagship512": 512, "small": 128, "tiny": 32}
    image_size = sizes[preset]
    cfg = PRESETS["flagship" if preset == "flagship512" else preset](
        image_size=image_size, num_frames=num_frames
    )
    model = EMOModel(cfg, dtype=jnp.bfloat16)

    params = jax.jit(lambda k: model.init_params(k, num_frames=num_frames, image_size=image_size))(
        jax.random.PRNGKey(0)
    )
    # serving-style bf16 weights: cast once instead of converting 2.2 GB of
    # fp32 params to bf16 inside every step (training keeps fp32 masters)
    params = jax.jit(lambda p: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p
    ))(params)
    jax.block_until_ready(params)
    lat = image_size // cfg.vae.downscale

    # per-clip conditioning, computed once (mirrors the real sampler)
    prep = jax.jit(lambda p, im, w: (
        model.encode_images(p, im), model.encode_audio(p, w, num_frames)
    ))
    ref_latent, audio = prep(
        params,
        jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16),
        jnp.zeros((1, int(16000 * (num_frames + 4) / 25.0)), jnp.bfloat16),
    )

    @jax.jit
    def denoise_step(params, noisy, t, ref_latent, audio, speeds, face_mask):
        return model.predict_noise(
            params, noisy, t, ref_latent, audio_windows=audio, speeds=speeds, face_mask=face_mask
        )

    key = jax.random.PRNGKey(1)
    noisy = jax.random.normal(key, (1, num_frames, lat, lat, 4), jnp.bfloat16)
    args = (
        params,
        noisy,
        jnp.array([500], jnp.int32),
        ref_latent,
        audio,
        jnp.zeros((1, num_frames, cfg.model.speed_axes), jnp.bfloat16)
        if cfg.model.speed_axes > 1 else jnp.zeros((1, num_frames), jnp.bfloat16),
        jnp.ones((1, image_size, image_size, 1), jnp.bfloat16),
    )
    # Sync via a host scalar fetch, NOT block_until_ready: over the axon
    # TPU tunnel block_until_ready returns before execution finishes
    # (measured 2 ms "steps" vs 84 ms real), so only a device->host value
    # dependency gives honest timing.
    fsum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    check = float(fsum(denoise_step(*args)))  # compile both
    assert check == check, "NaN in benchmark output"

    t0 = time.perf_counter()
    for _ in range(iters):
        out = denoise_step(*args)
    float(fsum(out))  # device executes dispatches serially; fetch syncs all
    dt = (time.perf_counter() - t0) / iters
    steps_per_sec = 1.0 / dt

    result = {
        "metric": f"denoise steps/sec/chip ({preset}, {num_frames}f {image_size}^2, bf16, full conditioning)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 1.0, 4),
        "extra": {
            "ms_per_step": round(dt * 1e3, 2),
            "frames_per_sec_equiv": round(steps_per_sec * num_frames, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
