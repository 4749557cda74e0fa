"""Host data-path throughput proof: does the records loader keep up with
the chip at flagship train rate?

The reference's declared target is CelebV-HQ — 36,000 clips
(reference README.md:113-117) — fed through per-item Python CV work
(reference Net.py:1254-1445). emox moves that work to precompute +
sharded mmap records + a multi-worker prefetch loader
(emox/data/records.py, emox/data/dataset.py); SURVEY §7 hard part 7 says
"the TPU never waits on Python CV code". This script measures that claim
instead of asserting it:

  1. corpus phase (CPU, resumable): N synthetic fixture clips ->
     precompute cache -> `emox pack-records` sharded mmap store,
  2. bench phase (chip): the EXACT stage-2 512^2 bs2 8f train program
     bench.py times (shared _train512_setup recipe) driven two ways —
     (a) one loader batch reused in-memory (the BASELINE.md 824 ms/step
     protocol) and (b) the multi-worker records loader in the loop —
     reporting ms/step for both plus the fraction of wall time the host
     spent blocked waiting on the loader.

    python examples/datapath_bench.py --clips 64 --steps 100 --workers 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(corpus: str, clips: int, size: int, frames: int) -> str:
    """fixtures -> precompute cache -> sharded records; every phase skips
    work that already exists (the corpus is multi-GB at 512^2 — a crashed
    run must not start over)."""
    from emox.data.fixtures import write_fixture_dataset
    from emox.data.precompute import precompute_clip
    from emox.data.records import is_sharded, write_shards

    vdir = os.path.join(corpus, "videos")
    cache = os.path.join(corpus, "cache")
    records = os.path.join(corpus, "records")
    meta_path = os.path.join(vdir, "metadata.json")
    if not os.path.exists(meta_path) or len(
        [f for f in os.listdir(vdir) if f.endswith(".npz")]
    ) < clips:
        print(f"writing {clips} fixture clips ({size}^2 x {frames}f) -> {vdir}")
        write_fixture_dataset(vdir, num_clips=clips, num_frames=frames, size=size)
    os.makedirs(cache, exist_ok=True)
    todo = []
    for f in sorted(os.listdir(vdir)):
        if not f.endswith(".npz"):
            continue
        dst = os.path.join(cache, f)
        if not os.path.exists(dst):
            todo.append((os.path.join(vdir, f), dst))
    if todo:
        t0 = time.time()
        for i, (src, dst) in enumerate(todo):
            precompute_clip(src, dst, width=size, height=size)
            if (i + 1) % 16 == 0:
                print(f"precomputed {i + 1}/{len(todo)} ({time.time() - t0:.0f}s)")
    if not is_sharded(records):
        print(f"packing records -> {records}")
        write_shards(cache, records)
    return records


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/emox_datapath")
    ap.add_argument("--clips", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=24, help="frames per fixture clip")
    ap.add_argument("--train-frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--gen-only", action="store_true", help="build the corpus and exit (CPU phase)")
    args = ap.parse_args()

    records = build_corpus(args.corpus, args.clips, args.size, args.frames)
    if args.gen_only:
        print("corpus ready:", records)
        return 0

    from emox.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from bench import _train512_setup
    from emox.data.dataset import DataLoader, EMODataset

    # the benched program: identical Trainer/recipe to bench.py's
    # train512 extra, so "with loader" is comparable to BASELINE.md's
    # in-memory 824 ms/step row
    tr, _synth_batch, key = _train512_setup(b=args.batch, t=args.train_frames, hw=args.size)

    ds = EMODataset(
        records, "stage2", num_frames=args.train_frames, ref_mode="first",
        num_motion_frames=0,
    )
    dl = DataLoader(ds, batch_size=args.batch, seed=0,
                    num_workers=args.workers, prefetch=4)
    it = iter(dl)
    batch0 = next(it)
    print("loader batch:", {k: v.shape for k, v in batch0.items()})

    state = tr.state

    def run(n: int, pull) -> tuple:
        """n steps; returns (wall_s, data_wait_s). Syncs via a host fetch
        of the loss scalar each step — with the loader in the loop the
        step cadence IS per-step dispatch, matching real training (fit()
        logs the same way), not the pipelined T(2n)-T(n) lower bound."""
        nonlocal state
        m = None
        t0 = time.perf_counter()
        wait = 0.0
        for _ in range(n):
            td = time.perf_counter()
            b = pull()
            wait += time.perf_counter() - td
            state, m = tr.train_step(state, b, key)
            float(m["loss"])
        return time.perf_counter() - t0, wait

    # warm: compile once (loader batch drives the program so both legs
    # share one compiled signature)
    run(2, lambda: batch0)

    wall_mem, _ = run(args.steps, lambda: batch0)
    wall_dl, wait_dl = run(args.steps, lambda: next(it))

    ms_mem = wall_mem / args.steps * 1e3
    ms_dl = wall_dl / args.steps * 1e3
    out = {
        "in_memory_ms_per_step": round(ms_mem, 1),
        "with_loader_ms_per_step": round(ms_dl, 1),
        "loader_overhead_pct": round((ms_dl - ms_mem) / ms_mem * 100, 1),
        "loader_wait_frac": round(wait_dl / wall_dl, 4),
        "frames_per_sec_with_loader": round(args.batch * args.train_frames * 1e3 / ms_dl, 1),
        "clips": args.clips, "workers": args.workers, "steps": args.steps,
        "size": args.size, "batch": args.batch, "train_frames": args.train_frames,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
