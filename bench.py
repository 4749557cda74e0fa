"""Benchmark: denoise-step throughput on the flagship config.

Measures the BASELINE.json north-star metric: denoise steps/sec/chip for a
16-frame 256^2 clip through the full conditioned denoise step — exactly
what the reference pipeline does per timestep (reference
EMOAnimationPipeline.py:698-821): ReferenceNet/writer forward at this
timestep + UNet3D with reference/temporal/audio/speed/face conditioning,
bf16. Per-clip work (VAE encode of the reference image, wav2vec2 audio
features) is computed once outside the timed loop, as in any real sampler.

Timing protocol (round-3 reconciliation of the flat r1/r2 numbers): the
old single-loop timing included ~45-50 ms of FIXED overhead — the first
dispatch after an idle device plus the final device->host fetch round-trip
through the axon tunnel — which inflated per-step time by overhead/iters
(2.4 ms at 10 iters, 1.2 ms at 20; this is the whole 21.6-vs-22.8
discrepancy between the driver runs and BASELINE.md). The fix measures
T(2n) - T(n): two loops whose fixed costs cancel exactly, leaving the pure
steady-state per-step time. Device work is still serialised and synced via
a host scalar fetch (block_until_ready returns early through the tunnel).

Un-time-out-able by construction (round 4): the headline JSON line is
printed AND flushed the moment it is measured; every extra that completes
re-prints the full merged line. If the harness kills the process mid-extra,
the last complete line on stdout is still a valid record. One global
wall-clock ceiling (EMOX_BENCH_CEILING seconds, default 1500, measured
from FIRST process start — it survives the re-exec) covers backend wait,
builds, compiles and extras together; each stage checks the remaining
ceiling before starting.

Secondary driver-visible metrics land in extra, budget permitting, in
order: warm 48-frame long clip, 512^2 denoise step, 512^2 stage-2 train
step (reference train res, configs/training/stage1.yaml).

Prints one JSON line per completed milestone; the LAST line is the most
complete: {"metric", "value", "unit", "vs_baseline", "extra"}.

Env knobs: EMOX_BENCH_PRESET=flagship|flagship512|small|tiny (default
flagship), EMOX_BENCH_ITERS (default 20; the measured loop runs 3n total),
EMOX_BENCH_CEILING (seconds, default 1500), EMOX_BENCH_WAIT (backend-wait
cap, default 600 — additionally capped so >=10 min of ceiling remains),
EMOX_BENCH_NO_EXTRAS=1, EMOX_BENCH_TRAIN512=0 to skip the train extra.

`python bench.py --warm-cache` runs the same programs under a huge ceiling
purely to populate the persistent XLA compile cache before a timed run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# persistent XLA compile cache: flagship programs cold-compile in minutes
# through the axon compile helper; cached reruns start in seconds. NB the
# env-var route does NOT work here (sitecustomize pre-imports jax before
# any application code runs, freezing the config default) — _build calls
# emox.core.compile_cache.enable_persistent_cache, which uses
# jax.config.update and therefore applies regardless of import order.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emox_tpu_cache")

# the ceiling is anchored at the FIRST interpreter start: a re-exec (see
# below) re-enters this module, and the ceiling must not reset with it
T_START = float(os.environ.get("EMOX_BENCH_T0", "") or time.time())
os.environ["EMOX_BENCH_T0"] = repr(T_START)


def _build(preset: str, image_size: int, num_frames: int):
    import jax
    import jax.numpy as jnp

    from emox.core.compile_cache import enable_persistent_cache
    from emox.core.presets import PRESETS
    from emox.models.emo import EMOModel

    enable_persistent_cache()

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
    return cfg, model, params


def _step_args(cfg, model, params, image_size: int, num_frames: int):
    import jax
    import jax.numpy as jnp

    lat = image_size // cfg.vae.downscale
    prep = jax.jit(lambda p, im, w: (
        model.encode_images(p, im), model.encode_audio(p, w, num_frames)
    ))
    ref_latent, audio = prep(
        params,
        jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16),
        jnp.zeros((1, int(16000 * (num_frames + 4) / 25.0)), jnp.bfloat16),
    )
    noisy = jax.random.normal(jax.random.PRNGKey(1), (1, num_frames, lat, lat, 4), jnp.bfloat16)
    speeds = (
        jnp.zeros((1, num_frames, cfg.model.speed_axes), jnp.bfloat16)
        if cfg.model.speed_axes > 1 else jnp.zeros((1, num_frames), jnp.bfloat16)
    )
    # per-clip conditioning prep also covers the face-mask residual (it
    # depends only on the static mask — the sampler encodes it once, the
    # step consumes face_feat; exactly the per-step encoder's math)
    face_feat = jax.jit(lambda p, m: model.encode_face_mask(p, m, lat))(
        params, jnp.ones((1, image_size, image_size, 1), jnp.bfloat16)
    )
    return (
        params, noisy, jnp.array([500], jnp.int32), ref_latent, audio, speeds, face_feat,
    )


def _measure_step_ms(model, args, iters: int):
    """Steady-state ms/step via fixed-overhead cancellation: T(2n) - T(n)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def denoise_step(params, noisy, t, ref_latent, audio, speeds, face_feat):
        return model.predict_noise(
            params, noisy, t, ref_latent, audio_windows=audio, speeds=speeds, face_feat=face_feat
        )

    # Sync via a host scalar fetch, NOT block_until_ready: over the axon
    # TPU tunnel block_until_ready returns before execution finishes
    # (measured 2 ms "steps" vs 84 ms real).
    fsum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    check = float(fsum(denoise_step(*args)))  # compile both
    assert check == check, "NaN in benchmark output"

    def loop(n: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n):
            out = denoise_step(*args)
        float(fsum(out))  # device executes dispatches serially; fetch syncs all
        return time.perf_counter() - t0

    loop(2)  # warm the dispatch path
    t_n = loop(iters)
    t_2n = loop(2 * iters)
    step_ms = (t_2n - t_n) / iters * 1e3
    naive_ms = t_2n / (2 * iters) * 1e3
    if step_ms <= 0:
        # sub-ms steps (tiny preset) or host contention can leave the
        # cancellation in the noise; the naive loop is then the honest
        # upper bound — never emit a negative rate
        step_ms = naive_ms
    return step_ms, naive_ms


def _train512_setup(b: int = 2, t: int = 8, hw: int = 512):
    """Trainer + synthetic batch for the stage-2 train step at the
    reference train res (512^2, bs2 8f, bf16 compute / fp32 trainable
    masters, frozen spatial stack in bf16) — matches reference
    configs/training/stage{1,2}.yaml. Shared with examples/profile_step.py
    --train512 so the profiled program is the benched program."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from emox.core.presets import flagship_config
    from emox.train.trainer import Trainer

    cfg = flagship_config(image_size=hw, num_frames=t)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, batch_size=b),
        train=dataclasses.replace(
            cfg.train, stage=2, learning_rate=1e-5, ema_decay=0.0, resume=False,
            checkpoint_dir="/tmp/emox_bench_train512",
        ),
    )
    tr = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    batch = {
        "frames": 0.1 * jax.random.normal(key, (b, t, hw, hw, 3), jnp.float32),
        "ref_image": 0.1 * jax.random.normal(key, (b, hw, hw, 3), jnp.float32),
        "wav": jnp.zeros((b, int(16000 * (t + 2 * cfg.audio.context_frames) / 25.0)), jnp.float32),
    }
    return tr, batch, key


def _measure_train512_ms(iters: int = 3) -> dict:
    """T(2n)-T(n) protocol over the shared train512 program, synced via
    host fetch of the loss scalar."""
    b, t = 2, 8
    tr, batch, key = _train512_setup(b=b, t=t)
    state = tr.state

    def loop(n: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = tr.train_step(state, batch, key)
        float(m["loss"])
        return time.perf_counter() - t0

    # Two warm steps: call 1 pays the compile; call 2 used to compile a
    # SECOND program (init state.step carried SingleDeviceSharding vs the
    # step output's NamedSharding — fixed at the source in Trainer.__init__,
    # ADVICE r4) — loop(2) stays as belt-and-braces so a regression can
    # never leave a compile inside t_n (r4: -102 s/step).
    loop(2)
    t_n = loop(iters)
    t_2n = loop(2 * iters)
    ms = (t_2n - t_n) / iters * 1e3
    timing = "T(2n)-T(n)"
    if ms <= 0:
        # same negative-guard as the headline — but TAG it: the naive loop
        # would silently include any stray compile (ADVICE r4)
        ms = t_2n / (2 * iters) * 1e3
        timing = "naive-fallback"
    return {"train512_ms_per_step": round(ms, 1),
            "train512_frames_per_sec": round(b * t * 1e3 / ms, 1),
            "train512_timing": timing}


def _prev_round_headline():
    """Latest recorded driver headline (BENCH_r*.json) -> (name, value).

    vs_baseline then means "this run vs the last recorded round" — a real
    round-over-round ratio instead of the meaningless /1.0 it was
    (VERDICT r4 hygiene)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
            if d.get("rc") != 0:
                continue
            m = re.search(r'\\?"value\\?":\s*([0-9.]+)', str(d.get("tail", "")))
            if m:
                best = (os.path.basename(p), float(m.group(1)))
        except Exception:
            continue
    return best


def _budget_left(budget_s: float) -> float:
    return budget_s - (time.time() - T_START)


def _wait_for_backend(wait_s: float) -> None:
    """Ride out a tunnel outage BEFORE touching jax in this process.

    A backend-init failure inside this process is cached for its lifetime,
    and during an outage `jax.devices()` HANGS (~25 min) rather than
    failing fast — so probe in short-lived subprocesses with a hard
    timeout and only proceed once one succeeds (or the wait budget is
    spent, leaving the old two-attempt behaviour as the last resort)."""
    deadline = time.time() + wait_s
    probe = [sys.executable, "-c", "import jax; jax.devices()"]
    while True:
        remaining = deadline - time.time()
        if remaining <= 0:
            return
        try:
            if subprocess.run(
                probe, timeout=min(120, max(10, remaining)), capture_output=True
            ).returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - time.time()
        if remaining <= 0:
            return
        time.sleep(min(60, remaining))


def _emit(result: dict) -> None:
    """One complete JSON line per milestone, flushed immediately: if the
    harness kills this process later, the record is already on stdout."""
    sys.stdout.write(json.dumps(result) + "\n")
    sys.stdout.flush()


def main() -> None:
    if "--warm-cache" in sys.argv:
        # populate the persistent compile cache ahead of a timed run: same
        # programs, no ceiling pressure, tiny measurement loops
        os.environ["EMOX_BENCH_CEILING"] = "100000"
        os.environ.setdefault("EMOX_BENCH_ITERS", "3")
    ceiling_s = float(os.environ.get("EMOX_BENCH_CEILING", "1500"))
    # backend-wait shares the global ceiling; always leave >=10 min for
    # build + compile + the headline measurement
    wait_s = min(
        float(os.environ.get("EMOX_BENCH_WAIT", "600")),
        max(0.0, _budget_left(ceiling_s) - 600.0),
    )
    # In-process CPU validation runs configure jax for cpu before calling
    # main(); the axon sitecustomize pre-imports jax on every interpreter,
    # so "jax in sys.modules" says nothing — inspect its configured
    # platforms instead (import != backend init, so this is hang-safe).
    cpu_forced = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    if not cpu_forced and "jax" in sys.modules:
        try:
            cpu_forced = "cpu" in str(sys.modules["jax"].config.jax_platforms or "")
        except Exception:
            pass
    if wait_s > 0 and not os.environ.get("EMOX_BENCH_REEXEC") and not cpu_forced:
        _wait_for_backend(wait_s)

    import jax

    preset = os.environ.get("EMOX_BENCH_PRESET", "flagship")
    iters = int(os.environ.get("EMOX_BENCH_ITERS", "20"))
    num_frames = 16
    sizes = {"flagship": 256, "flagship512": 512, "small": 128, "tiny": 32}
    image_size = sizes[preset]

    try:
        cfg, model, params = _build(preset, image_size, num_frames)
        args = _step_args(cfg, model, params, image_size, num_frames)
    except Exception:
        # Backend-init failures ("Unable to initialize backend 'axon':
        # UNAVAILABLE") are cached for the life of the process — only a
        # fresh process can recover once the tunnel blips. Re-exec exactly
        # once; a genuinely down tunnel still fails fast the second time.
        if os.environ.get("EMOX_BENCH_REEXEC"):
            raise
        os.environ["EMOX_BENCH_REEXEC"] = "1"
        time.sleep(30)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    try:
        step_ms, naive_ms = _measure_step_ms(model, args, iters)
    except Exception:
        # the axon tunnel occasionally aborts a run transiently ("TPU
        # backend error (Aborted)" / compile-helper HTTP 500); one retry
        # protects the headline metric from a one-off infrastructure blip
        time.sleep(10)
        step_ms, naive_ms = _measure_step_ms(model, args, iters)
    steps_per_sec = 1e3 / step_ms

    extra = {
        "ms_per_step": round(step_ms, 2),
        "ms_per_step_naive_loop": round(naive_ms, 2),
        "timing": "T(2n)-T(n) fixed-overhead cancellation, host-scalar sync",
        "frames_per_sec_equiv": round(steps_per_sec * num_frames, 2),
        "device": str(jax.devices()[0]),
    }
    prev = _prev_round_headline()
    if prev is not None:
        extra["vs_baseline_ref"] = f"{prev[0]}: {prev[1]}"
    result = {
        "metric": f"denoise steps/sec/chip ({preset}, {num_frames}f {image_size}^2, bf16, full conditioning)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / (prev[1] if prev else 1.0), 4),
        "extra": extra,
    }
    _emit(result)  # the headline is on stdout NOW; extras only improve it

    if preset != "flagship" or os.environ.get("EMOX_BENCH_NO_EXTRAS"):
        return

    # ---- warm 48-frame long clip (reuses the 256^2 model) ----------------
    if _budget_left(ceiling_s) > 180:
        try:
            import numpy as np
            import jax.numpy as jnp

            from emox.infer.pipeline import EMOPipeline

            pipe = EMOPipeline(model, cfg)
            ref = jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
            wav = jnp.zeros((1, int(16000 * 50 / 25.0)), jnp.bfloat16)
            kw = dict(total_frames=48, segment_length=16, num_motion_frames=2,
                      num_inference_steps=20)
            np.asarray(pipe.generate_long(params, ref, wav, **kw))  # compile
            t0 = time.perf_counter()
            np.asarray(pipe.generate_long(params, ref, wav, **kw))
            extra["long_clip_48f_s"] = round(time.perf_counter() - t0, 2)
            del pipe
        except Exception as e:
            extra["long_clip_48f_s"] = f"error: {type(e).__name__}: {str(e)[:160]}"
    else:
        extra["long_clip_48f_s"] = "skipped: ceiling spent"
    _emit(result)

    # ---- 512^2 denoise step (reference train res) ------------------------
    # free the 256^2 model's 2.2 GB of device params FIRST — two flagship
    # param sets + activations do not fit 16 GB HBM together
    import gc

    del args, model, params
    args = model = params = None
    gc.collect()
    if _budget_left(ceiling_s) > 240:
        try:
            cfg5, model5, params5 = _build("flagship512", 512, num_frames)
            args5 = _step_args(cfg5, model5, params5, 512, num_frames)
            ms5, _ = _measure_step_ms(model5, args5, max(3, iters // 4))
            extra["steps_per_sec_512"] = round(1e3 / ms5, 3)
            extra["ms_per_step_512"] = round(ms5, 1)
            del args5, model5, params5
            gc.collect()
        except Exception as e:  # record, don't fail the headline metric
            extra["steps_per_sec_512"] = f"error: {type(e).__name__}: {str(e)[:160]}"
    else:
        extra["steps_per_sec_512"] = "skipped: ceiling spent"
    _emit(result)

    # ---- 512^2 stage-2 train step (reference train res) ------------------
    if os.environ.get("EMOX_BENCH_TRAIN512", "1") != "0":
        if _budget_left(ceiling_s) > 300:
            try:
                extra.update(_measure_train512_ms())
            except Exception as e:
                extra["train512_ms_per_step"] = f"error: {type(e).__name__}: {str(e)[:160]}"
        else:
            extra["train512_ms_per_step"] = "skipped: ceiling spent"
        _emit(result)


if __name__ == "__main__":
    sys.exit(main())
