"""On-chip A/B driver for the staged round-3 kernels.

Runs bench.py in fresh subprocesses (env-keyed dispatch is resolved at
trace time, so each variant needs its own process) over the variant
matrix from BASELINE.md's A/B queue and writes one JSON table. The
headline loop is the arbiter per the measured-default protocol
(docs/KERNELS.md) — kernel microbenches through the axon tunnel are not
trusted.

Usage (on a machine with the TPU tunnel up):
    python examples/kernel_ab.py [--preset flagship] [--iters 20]
    python examples/kernel_ab.py --variants base,ff   # subset

Budget note: each variant cold-compiles its own step program (~minutes
through the axon compile helper; the persistent cache only helps exact
HLO re-runs), so a full matrix is a ~30-60 min commitment.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

VARIANTS = {
    "base": {},
    "ff": {"EMOX_FF_IMPL": "auto"},
    "qkv": {"EMOX_FUSED_QKV": "1"},
    "lnqkv": {"EMOX_LN_QKV": "1"},
    "ff_lnqkv": {"EMOX_FF_IMPL": "auto", "EMOX_LN_QKV": "1"},
    "ff_qkv": {"EMOX_FF_IMPL": "auto", "EMOX_FUSED_QKV": "1"},
    # r4 follow-up: base now HAS the FF default; ffbm512 widens the narrow
    # kernel's row block 256 -> 512 (fewer grid iters, LN/gate VPU work
    # amortised over a bigger MXU tile; VMEM-checked in ff_block_plan)
    "ffbm512": {"EMOX_FF_BLOCK_M": "512"},
}


def run_variant(name: str, extra_env: dict, preset: str, iters: int) -> dict:
    env = dict(os.environ)
    env.update(extra_env)
    env.update(
        EMOX_BENCH_PRESET=preset,
        EMOX_BENCH_ITERS=str(iters),
        EMOX_BENCH_NO_EXTRAS="1",
        EMOX_BENCH_WAIT="120",
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    wall = round(time.time() - t0, 1)
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    try:
        result = json.loads(line)
        return {"variant": name, "env": extra_env, "steps_per_sec": result["value"],
                "ms_per_step": result["extra"]["ms_per_step"], "wall_s": wall}
    except Exception:
        return {"variant": name, "env": extra_env,
                "error": (proc.stderr or line)[-400:], "wall_s": wall}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="flagship")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--out", default="/tmp/kernel_ab.json")
    args = ap.parse_args()

    rows = []
    for name in args.variants.split(","):
        name = name.strip()
        if name not in VARIANTS:
            print(f"unknown variant {name!r}; known: {list(VARIANTS)}", file=sys.stderr)
            return 2
        print(f"[{time.strftime('%H:%M:%S')}] running {name} ...", flush=True)
        row = run_variant(name, VARIANTS[name], args.preset, args.iters)
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
