"""Stage-1 learning-rate probe at the on-chip quality-loop scale.

Diagnoses the r4/r5 overfit plateau: stage-1 denoise loss pinned at
~0.97 for 2000 steps (the predict-zero floor) with adamw at lr 2e-3 on
the small preset — collapse, not capacity. Restores the already-trained
stage-5 VAE checkpoint and sweeps stage-1 lr for a few hundred steps
each, printing the loss trend, so the full quality run only relaunches
with an lr that demonstrably learns.

    python examples/lr_probe.py --workdir /tmp/emox_overfit_r5 \
        --scaling 3.109 --lrs 3e-4,1e-3 --steps 300
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/emox_overfit_r5")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--scaling", type=float, required=True,
                    help="vae scaling_factor from the stage-5 run's printout")
    ap.add_argument("--lrs", default="3e-4,1e-3")
    ap.add_argument("--optimizer", default="adamw")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from emox.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from emox.core.config import InferenceConfig, MeshConfig, TrainConfig
    from emox.core.presets import PRESETS
    from emox.data.dataset import DataLoader, EMODataset
    from emox.train.trainer import Checkpointer, Trainer

    cache = os.path.join(args.workdir, "cache")
    s = args.size
    base = PRESETS["small"](image_size=s, num_frames=args.frames)
    cfg = base.replace(
        mesh=MeshConfig(data=1, context=1, model=1),
        vae=dataclasses.replace(base.vae, scaling_factor=args.scaling),
        data=dataclasses.replace(base.data, batch_size=1, cache_dir=cache),
        inference=InferenceConfig(context_frames=max(8, args.frames),
                                  video_length=args.frames, width=s, height=s),
    )

    # reuse the trained stage-5 VAE instead of re-running 4000 steps
    ck5 = Checkpointer(os.path.join(args.workdir, "ckpt", "stage5"))
    vae_params = ck5.restore_params()
    assert vae_params is not None, "run the stage-5 leg first"

    ds = EMODataset(cache, "stage1", num_frames=args.frames, ref_mode="first")
    for lr in [float(x) for x in args.lrs.split(",")]:
        cfg1 = cfg.replace(train=TrainConfig(
            stage=1, num_steps=args.steps, learning_rate=lr,
            log_every=max(1, args.steps // 12), optimizer=args.optimizer,
            checkpoint_every=0, vae_encode="mode", compute_dtype=args.dtype,
            checkpoint_dir=os.path.join(args.workdir, f"probe_{lr:g}_{args.dtype}"),
        ))
        t1 = Trainer(cfg1, init_params=vae_params)
        m = t1.fit(DataLoader(ds, batch_size=1, seed=0), num_steps=args.steps)
        print(f"lr={lr:g} opt={args.optimizer} final loss {m['loss']:.4f} "
              f"(see {cfg1.train.checkpoint_dir}/stage1_metrics.jsonl)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
