"""Host data-path throughput proof at the flagship train rate.

The reference's declared target is CelebV-HQ — 36,000 clips
(reference README.md:113-117) — fed through per-item Python CV work
(reference Net.py:1254-1445 EMODataset.__getitem__: decode, crop,
resize, augment). SURVEY §7 hard part 7 says "the TPU never waits on
Python CV code"; this script MEASURES that claim instead of asserting
it:

  1. generate N fixture clips, precompute them, `pack-records` into
     sharded mmap records (the corpus-scale storage format),
  2. build the exact production loader (`emox.cli.build_train_data`:
     augmentation, motion-frame priming, multi-worker prefetch),
  3. time stage-2 train steps at the reference train res (512^2 bs2 8f,
     the BENCH train512 config) twice: fed a resident in-memory batch
     (the compute ceiling) vs fed by the records loader,
  4. report both rates + the host wait inside next() (loader idle).

Input-bound iff loader steps/s < in-memory steps/s beyond noise.

    python examples/datapath_bench.py --clips 64 --steps 100 --workers 4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=64)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8, help="frames per train sample")
    ap.add_argument("--clip-frames", type=int, default=16, help="frames per fixture clip")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/emox_datapath")
    args = ap.parse_args()

    from emox.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import numpy as np

    from emox.cli import build_train_data
    from emox.core.presets import flagship_config
    from emox.train.trainer import Trainer

    # ---- corpus: fixtures -> precompute -> sharded records ---------------
    records = os.path.join(args.workdir, f"records_{args.clips}x{args.size}")
    if not os.path.exists(os.path.join(records, "index.json")):
        from emox.data.fixtures import write_fixture_dataset
        from emox.data.precompute import precompute_dataset
        from emox.data.records import write_shards

        t0 = time.time()
        vdir = os.path.join(args.workdir, "videos")
        cache = os.path.join(args.workdir, "cache")
        meta = write_fixture_dataset(
            vdir, num_clips=args.clips, num_frames=args.clip_frames, size=args.size
        )
        t1 = time.time()
        precompute_dataset(str(meta), vdir, cache, width=args.size, height=args.size)
        t2 = time.time()
        write_shards(cache, records)
        t3 = time.time()
        print(f"corpus: {args.clips} clips x {args.clip_frames}f {args.size}^2 — "
              f"fixtures {t1 - t0:.0f}s, precompute {t2 - t1:.0f}s, pack {t3 - t2:.0f}s")
    else:
        print(f"corpus: reusing {records}")

    # ---- the BENCH train512 config, fed by the production loader ---------
    cfg = flagship_config(image_size=args.size, num_frames=args.frames)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, batch_size=args.batch, cache_dir=records,
            num_workers=args.workers,
        ),
        train=dataclasses.replace(
            cfg.train, stage=2, learning_rate=1e-5, ema_decay=0.0, resume=False,
            checkpoint_dir=os.path.join(args.workdir, "ckpt"),
        ),
    )
    _, loader = build_train_data(cfg, 2, "stage2")
    tr = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    it = iter(loader)
    first = next(it)
    print("batch keys:", {k: v.shape for k, v in first.items()})

    state = tr.state
    # warm: compile (single program post ADVICE-r4 fix; loop twice anyway)
    for _ in range(2):
        state, m = tr.train_step(state, first, key)
    float(m["loss"])

    # ---- phase A: resident in-memory batch (compute ceiling) -------------
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = tr.train_step(state, first, key)
    float(m["loss"])  # host-scalar sync (axon: block_until_ready lies)
    mem_s = time.perf_counter() - t0
    mem_ms = mem_s / args.steps * 1e3

    # ---- phase B: the records loader feeds the chip -----------------------
    wait_s = 0.0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        tw = time.perf_counter()
        batch = next(it)
        wait_s += time.perf_counter() - tw
        key, sub = jax.random.split(key)
        state, m = tr.train_step(state, batch, sub)
    float(m["loss"])
    load_s = time.perf_counter() - t0
    load_ms = load_s / args.steps * 1e3

    fps = args.batch * args.frames * 1e3
    out = {
        "config": f"stage2 {args.size}^2 bs{args.batch} {args.frames}f bf16, "
                  f"{args.clips}-clip sharded records, {args.workers} workers",
        "in_memory_ms_per_step": round(mem_ms, 1),
        "loader_ms_per_step": round(load_ms, 1),
        "loader_overhead_pct": round((load_ms / mem_ms - 1.0) * 100.0, 1),
        "host_wait_in_next_ms_per_step": round(wait_s / args.steps * 1e3, 1),
        "in_memory_frames_per_sec": round(fps / mem_ms, 1),
        "loader_frames_per_sec": round(fps / load_ms, 1),
        "input_bound": bool(load_ms > 1.05 * mem_ms),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
