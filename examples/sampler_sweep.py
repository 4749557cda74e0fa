"""Sampler-protocol sweep over saved overfit checkpoints.

The r5 quality-loop payoff run (BASELINE.md) trains 1->2->3(->4) to a
0.04 denoise loss but samples at CFG 1.5 x 20 DDIM steps — a protocol
that extrapolates AWAY from the memorised conditional trajectory
(CFG > 1) and carries 20-step discretisation error. This script
disambiguates training quality from sampler protocol by re-sampling the
SAME saved checkpoints across a (guidance_scale, num_inference_steps)
grid and scoring every cell with the quality-eval subsystem.

Run examples/overfit_one_clip.py with --workdir first; then:

    python examples/sampler_sweep.py --workdir /tmp/emox_payoff \
        --guidance 1.0 1.5 --num-steps 20 50

Reference anchor: the per-timestep CFG loop and DDIM step count the
reference hardcodes (EMOAnimationPipeline.py:550-551,698-821) are
exactly the two knobs swept here.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True,
                    help="an overfit_one_clip.py --workdir (holds run.json, ckpt/, cache/)")
    ap.add_argument("--guidance", type=float, nargs="+", default=[1.0, 1.5])
    ap.add_argument("--num-steps", type=int, nargs="+", default=[20, 50])
    ap.add_argument("--stage", type=int, default=3, choices=(3, 4),
                    help="which stage's checkpoint to sample (4 = control-composed)")
    ap.add_argument("--ema", action="store_true", help="sample the EMA shadow weights")
    args = ap.parse_args()

    from emox.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from overfit_one_clip import build_cfg

    from emox.eval import evaluate_clip, frechet_distance
    from emox.eval.metrics import psnr
    from emox.infer.pipeline import EMOPipeline
    from emox.models.emo import EMOModel
    from emox.train.trainer import Checkpointer

    work = args.workdir
    with open(os.path.join(work, "run.json")) as f:
        meta = json.load(f)
    cache = os.path.join(work, "cache")

    cfg = build_cfg(
        preset=meta["preset"], size=meta["size"], frames=meta["frames"],
        steps=meta["steps"], lr=meta["lr"], dtype=meta["dtype"],
        stage4=meta["stage4"], cache=cache, work=work,
    )
    if meta.get("scaling_factor"):
        cfg = cfg.replace(
            vae=dataclasses.replace(cfg.vae, scaling_factor=meta["scaling_factor"]),
            train=dataclasses.replace(cfg.train, vae_encode=meta["vae_encode"]),
        )

    ck = Checkpointer(os.path.join(work, "ckpt", f"stage{args.stage}"))
    params = ck.restore_params(use_ema=args.ema)
    if params is None:
        print(f"no stage-{args.stage} checkpoint under {work}/ckpt", file=sys.stderr)
        return 1

    clip = dict(np.load(os.path.join(cache, "clip.npz")))
    F = meta["frames"]
    ref = jnp.asarray(clip["frames"][0][None])
    wav = jnp.asarray(clip["wav"][: int(F / 25.0 * 16000)][None])
    target = clip["frames"][:F]

    model = EMOModel(cfg)
    pipe = EMOPipeline(model, cfg)

    control = None
    if args.stage == 4 and "control" in clip:
        ctrl = clip["control"][:F]
        if ctrl.dtype == np.uint8:
            ctrl = ctrl.astype(np.float32) / 255.0
        control = jnp.asarray(ctrl[None])

    # the achievable anchor: no sampler protocol beats decode(encode(gt))
    gt_lat = model.encode_images(params, jnp.asarray(target))
    gt_rt = model.decode_latents(params, gt_lat)
    ceiling = float(psnr(gt_rt, jnp.asarray(target)))
    print(f"vae round-trip ceiling: {ceiling:.2f} dB")

    def _lat_feats(fr):
        lat = model.encode_images(params, jnp.asarray(fr))
        pooled = jax.image.resize(lat, (lat.shape[0], 4, 4, lat.shape[-1]), "linear")
        return pooled.reshape(lat.shape[0], -1)

    ft = _lat_feats(target)

    rows = []
    print(f"| guidance | steps | PSNR dB | SSIM | flicker | audio_sync | latent_frechet |")
    print(f"|---|---|---|---|---|---|---|")
    for g in args.guidance:
        for s in args.num_steps:
            frames = pipe(params, ref, wav, video_length=F,
                          num_inference_steps=s, guidance_scale=g,
                          control_cond=control)
            fr = np.asarray(frames[0])
            m = evaluate_clip(fr, gt=target, masks=clip["face_masks"][:F], wav=clip["wav"])
            m["latent_frechet"] = float(frechet_distance(_lat_feats(fr), ft))
            row = dict(guidance=g, steps=s, **{k: round(v, 4) for k, v in m.items()})
            rows.append(row)
            print(f"| {g} | {s} | {m['psnr_db']:.2f} | {m['ssim']:.3f} | "
                  f"{m['temporal_flicker']:.3f} | {m.get('audio_sync', float('nan')):.2f} | "
                  f"{m['latent_frechet']:.2f} |", flush=True)

    print(json.dumps({"ceiling_psnr": round(ceiling, 2), "stage": args.stage,
                      "ema": bool(args.ema), "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
