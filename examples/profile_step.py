"""Capture + bucket an xplane op profile of the flagship denoise step.

The methodology behind BASELINE.md's "step op profile" rows: run the
bench's exact step program N times under jax.profiler, then parse the
xplane.pb device plane and bucket XLA op time by kind (fusion, reduce,
custom-call/pallas, conv, copy, ...). This is the roofline accounting
that decides which HBM bucket the next kernel should attack (reference
point: the per-timestep loop at EMOAnimationPipeline.py:698-821).

Usage (chip):   python examples/profile_step.py [--steps 3] [--preset flagship]
Output: a bucket table (ms/step) + the top-20 individual ops, and the
raw profile dir for xprof/tensorboard.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _op_kind(name: str) -> str:
    """The HLO op kind (`fusion`, `custom-call`, `copy`, ...) of a trace
    event named like `%attn1.6 = bf16[...]{...} custom-call(bf16[...] %x)`.

    Classify on this, NOT on substrings of the full text — operand lists
    mention producer ops (`fusion(... %custom-call.254 ...)`), and bucketing
    on those once inflated the pallas bucket from 9 to 24 ms/step."""
    import re

    after = name.split(" = ", 1)[-1]
    m = re.search(r"(?<![%\w])([a-z][a-z\-]*)\(", after)
    return m.group(1) if m else name.lstrip("%").split(".", 1)[0]


def _bucket(name: str) -> str:
    kind = _op_kind(name)
    head = name.split(" ", 1)[0].lstrip("%").lower()
    n = f"{kind} {head}"
    if "custom-call" in n or "pallas" in n:
        return "pallas/custom-call"
    if n.startswith("copy") or ".copy" in n or "copy-start" in n or "copy-done" in n:
        return "copy"
    if "convolution" in n or n.startswith("conv"):
        return "conv"
    if n.startswith("reduce") or "reduce." in n or ".reduce" in n or "reduce_fusion" in n:
        return "reduce (GN/LN stats)"
    if n.startswith("dot") or "dot." in n:
        return "dot"
    if "dynamic-update-slice" in n or "dynamic-slice" in n:
        return "dyn-slice"
    if n.startswith("fusion") or ".fusion" in n or "fused" in n:
        return "fusion"
    if "all-reduce" in n or "all-gather" in n or "collective" in n or "permute" in n:
        return "collective"
    return "other"


def parse_profile(logdir: str, steps: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    device_planes = [p for p in space.planes if "TPU" in p.name or "/device:" in p.name]
    if not device_planes:
        device_planes = [p for p in space.planes if "Host Threads" not in p.name]
    # Async ops (`copy-start`, `slice-start`, ... paired with `*-done`) are
    # SPANS that overlap synchronous compute — their duration covers issue →
    # completion-wait, so summing them alongside sync ops double-counts
    # (a 3-step capture once "summed" to 265 ms/step against a measured
    # 38.9). Account them separately; the sync buckets are the roofline.
    def _is_async(name: str) -> bool:
        head = name.split(" ", 1)[0].lstrip("%")
        head = head.split(".", 1)[0]
        return head.endswith("-start") or head.endswith("-done")

    buckets: dict = collections.defaultdict(float)
    per_op: dict = collections.defaultdict(float)
    async_ms = 0.0
    t_min, t_max = float("inf"), 0.0
    for plane in device_planes:
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            lname = line.name.lower()
            # the XLA op-by-op line; skip step/module summary lines
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                dur_ms = ev.duration_ps / 1e9
                t0 = line.timestamp_ns * 1e-6 + ev.offset_ps / 1e9
                t_min, t_max = min(t_min, t0), max(t_max, t0 + dur_ms)
                if _is_async(name):
                    async_ms += dur_ms
                    continue
                per_op[name] += dur_ms
                buckets[_bucket(name)] += dur_ms
    if not per_op:
        print("planes found:", [p.name for p in space.planes])
        print("lines:", [(p.name, [l.name for l in p.lines]) for p in device_planes])
        return
    total = sum(buckets.values())
    wall = t_max - t_min
    print(f"\n== sync op-time buckets (ms/step over {steps} steps, sync total "
          f"{total / steps:.2f} ms/step, trace wall {wall / steps:.2f} ms/step) ==")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:20s} {v / steps:8.2f} ms  ({100 * v / total:4.1f}%)")
    print(f"  [async spans (overlapped copies/slices), not in total: "
          f"{async_ms / steps:.2f} ms/step summed]")
    print("\n== top 20 sync ops (ms/step) ==")
    for name, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v / steps:8.3f}  {name[:110]}")
    print("\nraw profile:", paths[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="flagship")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--parse-only", default=None, help="skip capture; parse this dir")
    ap.add_argument("--train512", action="store_true",
                    help="profile the stage-2 512^2 bs2 8f TRAIN step (the BENCH "
                    "train512 program, fwd+bwd+optimizer) instead of the denoise step")
    args = ap.parse_args()

    if args.parse_only:
        parse_profile(args.parse_only, args.steps)
        return 0

    import jax

    import bench

    if args.train512:
        tr, batch, key = bench._train512_setup()
        state = tr.state
        for _ in range(2):  # compile outside the trace (one program post r5 fix)
            state, m = tr.train_step(state, batch, key)
        float(m["loss"])
        logdir = args.logdir or tempfile.mkdtemp(prefix="emox_profile_train512_")
        jax.profiler.start_trace(logdir)
        for _ in range(args.steps):
            state, m = tr.train_step(state, batch, key)
        float(m["loss"])  # host-scalar sync inside the trace window
        jax.profiler.stop_trace()
        print("captured", args.steps, "train steps to", logdir)
        parse_profile(logdir, args.steps)
        return 0

    sizes = {"flagship": 256, "flagship512": 512, "small": 128, "tiny": 32}
    image_size, num_frames = sizes[args.preset], 16
    cfg, model, params = bench._build(args.preset, image_size, num_frames)
    step_args = bench._step_args(cfg, model, params, image_size, num_frames)

    @jax.jit
    def step(params, noisy, t, ref_latent, audio, speeds, face_feat):
        return model.predict_noise(
            params, noisy, t, ref_latent, audio_windows=audio, speeds=speeds, face_feat=face_feat
        )

    # warm-up/compile outside the trace
    out = step(*step_args)
    jax.block_until_ready(out)
    logdir = args.logdir or tempfile.mkdtemp(prefix="emox_profile_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.steps):
        out = step(*step_args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print("captured", args.steps, "steps to", logdir)
    parse_profile(logdir, args.steps)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
