"""Overfit one clip end-to-end — the reference's declared dev strategy
(reference README.md:119-121, data/overfit.json): train every stage on a
single clip until the model reproduces it, then sample from frame 1 + audio.

Runs on any backend (CPU is fine at the default tiny scale; pass
--preset small on a TPU chip). Uses a synthetic fixture clip unless
--video points at a real mp4.

    python examples/overfit_one_clip.py --steps 200 --out overfit.mp4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(*, preset, size, frames, steps, lr, dtype, stage4, cache, work):
    """The overfit-protocol Config — shared with examples/sampler_sweep.py so
    the sweep re-samples the SAME program the training run used."""
    from emox.core.config import (
        AudioConfig, Config, DataConfig, InferenceConfig, MeshConfig, ModelConfig, TrainConfig, VAEConfig,
    )

    s = size
    train_cfg = TrainConfig(
        stage=1, num_steps=steps, learning_rate=lr or 2e-3, log_every=max(1, steps // 10),
        # mid-stage checkpoints so a crashed multi-hour payoff run resumes
        # where it died instead of re-training the stage (the axon tunnel
        # drops connections; see Trainer._step_with_retry)
        checkpoint_every=min(steps, 500), checkpoint_dir=os.path.join(work, "ckpt"),
        compute_dtype=dtype or "float32",
    )
    infer_cfg = InferenceConfig(
        context_frames=max(8, frames), video_length=frames, width=s, height=s,
        num_inference_steps=20, guidance_scale=1.5,
    )
    if preset != "custom":
        from emox.core.presets import PRESETS

        base = PRESETS[preset](image_size=s, num_frames=frames)
        cfg = base.replace(
            mesh=MeshConfig(data=1, context=1, model=1),
            data=dataclasses.replace(base.data, batch_size=1, cache_dir=cache),
            train=train_cfg,
            inference=infer_cfg,
        )
    else:
        cfg = Config(
            vae=VAEConfig(base_channels=16, channel_multipliers=(1, 2), num_res_blocks=1, norm_groups=8),
            model=ModelConfig(
                base_channels=16, channel_multipliers=(1, 2), layers_per_block=1, norm_groups=8,
                attention_head_dim=8, cross_attention_dim=16, attention_levels=(1,),
                audio_context_dim=32, use_cross_attention=False,
            ),
            audio=AudioConfig(hidden_dim=32, num_layers=1, num_heads=2, conv_dim=16),
            mesh=MeshConfig(data=1, context=1, model=1),
            data=DataConfig(width=s, height=s, num_frames=frames, batch_size=1, cache_dir=cache),
            train=train_cfg,
            inference=infer_cfg,
        )

    if stage4:
        # the ControlNet branch must exist in the param tree from stage 1 on
        # (zero-init: frozen + output-identical until stage 4 trains it)
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, use_controlnet=True, control_cond_channels=3))
    return cfg


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default=None, help="mp4/npz clip (default: synthetic fixture)")
    ap.add_argument("--steps", type=int, default=200, help="train steps per stage")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", default="overfit_sample.npz")
    ap.add_argument("--workdir", default=None)
    ap.add_argument(
        "--preset", default="custom", choices=("custom", "tiny", "small"),
        help="model scale: 'custom' = the inline dev config below; 'tiny'/'small' "
        "= emox.core.presets at --size (the on-chip quality-loop protocol is "
        "--preset small --size 256)",
    )
    ap.add_argument("--dtype", default=None, help="compute dtype override (e.g. bfloat16 on chip)")
    ap.add_argument(
        "--lr", type=float, default=None,
        help="override the per-stage adamw lrs (stage1=lr, stage2=lr/2, "
        "stage3=lr/4, stage4=lr/2). The inline defaults (2e-3/1e-3/5e-4) "
        "suit the 16-channel CPU dev config; at preset scale they collapse "
        "the denoiser to predicting 0 (r5 on-chip lr probe: loss pinned at "
        "~0.97 for 2000 steps at 2e-3 vs learning at 1e-4..3e-4)",
    )
    ap.add_argument(
        "--stage4-steps", type=int, default=0,
        help="train the ControlNet branch on the precomputed landmark-"
        "skeleton renders after stage 3 (reference magicanimate/models/"
        "controlnet.py:267-330 from_unet flow) and sample one control-"
        "composed clip. 0 = skip stage 4",
    )
    ap.add_argument(
        "--vae-steps", type=int, default=0,
        help="stage-5 VAE pretraining steps before stage 1 (the zero-weight "
        "stand-in for the reference's pretrained SD VAE; also calibrates "
        "vae.scaling_factor to 1/latent_std, the SD-0.18215 derivation). "
        "0 = keep the random-init VAE (smoke mode)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from emox.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from emox.data.dataset import DataLoader, EMODataset
    from emox.data.precompute import precompute_clip
    from emox.infer.pipeline import EMOPipeline
    from emox.infer.video_io import save_video
    from emox.models.emo import EMOModel
    from emox.train.trainer import Trainer

    work = args.workdir or tempfile.mkdtemp(prefix="emox_overfit_")
    cache = os.path.join(work, "cache")
    os.makedirs(cache, exist_ok=True)
    print(f"workdir: {work} (checkpoints + run.json reusable by examples/sampler_sweep.py)")

    src = args.video
    if src is None:
        from emox.data.fixtures import write_fixture_dataset

        vdir = os.path.join(work, "videos")
        write_fixture_dataset(vdir, num_clips=1, num_frames=max(8, 2 * args.frames), size=args.size)
        src = os.path.join(vdir, os.listdir(vdir)[0].replace(".json", ""))
        src = next(os.path.join(vdir, f) for f in os.listdir(vdir) if f.endswith(".npz"))
    precompute_clip(src, os.path.join(cache, "clip.npz"), width=args.size, height=args.size)

    s = args.size
    cfg = build_cfg(
        preset=args.preset, size=args.size, frames=args.frames, steps=args.steps,
        lr=args.lr, dtype=args.dtype, stage4=args.stage4_steps > 0, cache=cache, work=work,
    )

    # persist the run recipe so examples/sampler_sweep.py can rebuild the
    # exact Config and re-sample the saved checkpoints later
    run_meta = dict(
        preset=args.preset, size=args.size, frames=args.frames, steps=args.steps,
        lr=args.lr, dtype=args.dtype, stage4=args.stage4_steps > 0,
        scaling_factor=None, vae_encode=cfg.train.vae_encode,
    )

    def _write_meta():
        with open(os.path.join(work, "run.json"), "w") as f:
            json.dump(run_meta, f)

    _write_meta()

    def _last_logged(stage: int) -> dict:
        """Last full metrics record a completed stage logged (for the
        resume-skip path, where fit() never runs)."""
        path = os.path.join(work, "ckpt", f"stage{stage}_metrics.jsonl")
        last = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    rec = json.loads(line)
                    if "loss" in rec:
                        last = rec
        return last

    def run_stage(stage_cfg, ds_key: str, steps: int, init_params) -> tuple:
        """Train one stage, resuming from its own checkpoints: a re-run of a
        crashed payoff run skips completed stages and continues partial ones
        (Trainer.resume + the mid-stage checkpoint_every above)."""
        t = Trainer(stage_cfg, init_params=init_params)
        stage = stage_cfg.train.stage
        resumed = t.resume()
        if resumed >= steps:
            print(f"stage{stage}: already complete at step {resumed}, skipping")
            return t, _last_logged(stage)
        if resumed:
            print(f"stage{stage}: resuming from step {resumed}")
        ds = EMODataset(cache, ds_key, num_frames=args.frames, ref_mode="first")
        m = t.fit(DataLoader(ds, batch_size=1, seed=0), num_steps=steps)
        return t, m

    # stage 5 (optional): VAE pretraining — the reference loads SD's
    # pretrained VAE (train_stage_1_referencenet.py:124-133); with no
    # weights available we bootstrap one on the clip, then calibrate
    # scaling_factor = 1/latent_std exactly how SD derived 0.18215.
    # Without this the frozen random-init VAE (a) caps pixel fidelity at
    # decode(encode(gt)) mush and (b) injects unit-scale posterior noise
    # into every denoise-stage latent (its random logvar head ~ N(0,1)),
    # flooring the eps-prediction loss near 1.0.
    vae_params = None
    if args.vae_steps > 0:
        cfg5 = cfg.replace(train=dataclasses.replace(
            cfg.train, stage=5, learning_rate=1e-4))
        t5, m5 = run_stage(cfg5, "stage1", args.vae_steps, None)
        std = float(m5.get("latent_std", 0.0)) or 1.0
        print(f"stage5 (VAE) final recon_mse {m5['recon_mse']:.4f}, "
              f"latent_std {std:.4f} -> scaling_factor {1.0 / std:.4f}")
        cfg = cfg.replace(
            vae=dataclasses.replace(cfg.vae, scaling_factor=1.0 / std),
            # deterministic encode: the bootstrapped VAE's posterior stays
            # wide (std ~0.9 vs signal ~0.4 measured), so sampling it would
            # drown the latents — see TrainConfig.vae_encode
            train=dataclasses.replace(cfg.train, vae_encode="mode"),
        )
        vae_params = t5.state.params
        run_meta.update(scaling_factor=1.0 / std, vae_encode="mode")
        _write_meta()

    # stage 1: spatial denoising on single frames
    t1, m1 = run_stage(cfg, "stage1", args.steps, vae_params)
    print(f"stage1 final loss {m1['loss']:.4f}")

    # stage 2: temporal + audio on clips, init from stage 1
    cfg2 = cfg.replace(train=dataclasses.replace(
        cfg.train, stage=2, learning_rate=args.lr / 2 if args.lr else 1e-3))
    t2, m2 = run_stage(cfg2, "stage2", args.steps, t1.state.params)
    print(f"stage2 final loss {m2['loss']:.4f}")

    # stage 3: speed/face refinement (masked face loss), init from stage 2
    # (reference train_stage_3.py protocol — completes the 1->2->3 chain)
    cfg3 = cfg.replace(train=dataclasses.replace(
        cfg.train, stage=3, learning_rate=args.lr / 4 if args.lr else 5e-4, face_loss_weight=0.5))
    t3, m3 = run_stage(cfg3, "stage3", args.steps, t2.state.params)
    print(f"stage3 final loss {m3['loss']:.4f}")

    # stage 4 (optional): ControlNet branch on the precomputed landmark-
    # skeleton renders, frozen denoiser (reference trains the controlnet
    # separately from the UNet, magicanimate/models/controlnet.py:267-330)
    final_trainer = t3
    if args.stage4_steps > 0:
        cfg4 = cfg.replace(train=dataclasses.replace(
            cfg.train, stage=4, learning_rate=args.lr / 2 if args.lr else 1e-3))
        t4, m4 = run_stage(cfg4, "stage4-control", args.stage4_steps, t3.state.params)
        print(f"stage4 final loss {m4['loss']:.4f}")
        final_trainer = t4

    # sample: first frame + the clip's own audio
    clip = dict(np.load(os.path.join(cache, "clip.npz")))
    ref = jnp.asarray(clip["frames"][0][None])
    sr = 16000
    wav = jnp.asarray(clip["wav"][: int(args.frames / 25.0 * sr)][None])
    pipe = EMOPipeline(EMOModel(cfg3), cfg3)
    # "before" sample from random init — the eval table's untrained anchor
    p0 = EMOModel(cfg3).init_params(jax.random.PRNGKey(7), num_frames=2, image_size=s)
    frames0 = pipe(p0, ref, wav, video_length=args.frames)
    trained_params = final_trainer.state.params
    frames = pipe(trained_params, ref, wav, video_length=args.frames)
    frames_ctrl = None
    if args.stage4_steps > 0 and "control" in clip:
        # control-composed sample: the clip's own skeleton renders steer the
        # trained ControlNet branch (reference EMOAnimationPipeline controlnet
        # conditioning path)
        ctrl = clip["control"][: args.frames]
        if ctrl.dtype == np.uint8:
            ctrl = ctrl.astype(np.float32) / 255.0
        frames_ctrl = pipe(trained_params, ref, wav, video_length=args.frames,
                           control_cond=jnp.asarray(ctrl[None]))
    out = save_video(np.asarray(frames[0]), args.out, fps=25.0, wav=np.asarray(wav[0]))
    target = clip["frames"][: args.frames]
    mse = float(np.mean((np.asarray(frames[0]) - target) ** 2))
    print(f"wrote {out}; pixel MSE vs source clip: {mse:.4f}")

    # close the loop with the quality-eval subsystem: fidelity + temporal
    # stability vs the source clip, audio-sync proxy of both (gt_audio_sync
    # is the achievable anchor; sync needs more than a handful of frames to
    # be meaningful — see emox.eval.audio_sync_score)
    from emox.eval import evaluate_clip
    from emox.eval.metrics import psnr

    # the VAE round-trip ceiling: no denoiser can beat decode(encode(gt))
    # through the frozen autoencoder — report it as the achievable anchor
    # (with --vae-steps this is the stage-5-trained VAE, else random init)
    model3 = EMOModel(cfg3)
    gt_lat = model3.encode_images(trained_params, jnp.asarray(target))
    gt_rt = np.asarray(model3.decode_latents(trained_params, gt_lat))
    print(f"vae round-trip ceiling: psnr {float(psnr(jnp.asarray(gt_rt), jnp.asarray(target))):.2f} dB")

    metrics0 = evaluate_clip(
        np.asarray(frames0[0]), gt=target,
        masks=clip["face_masks"][: args.frames], wav=clip["wav"],
    )
    metrics = evaluate_clip(
        np.asarray(frames[0]), gt=target,
        masks=clip["face_masks"][: args.frames], wav=clip["wav"],
    )
    metrics_ctrl = None
    if frames_ctrl is not None:
        save_video(np.asarray(frames_ctrl[0]),
                   args.out.replace(".npz", "_ctrl.npz").replace(".mp4", "_ctrl.mp4"),
                   fps=25.0, wav=np.asarray(wav[0]))
        metrics_ctrl = evaluate_clip(
            np.asarray(frames_ctrl[0]), gt=target,
            masks=clip["face_masks"][: args.frames], wav=clip["wav"],
        )

    # distribution-level column (the FID/FVD stand-in, same pooling as
    # `emox eval`): Frechet distance between gaussian fits of per-frame
    # VAE latents of generated vs ground-truth frames
    from emox.eval import frechet_distance

    def _lat_feats(fr):
        lat = model3.encode_images(trained_params, jnp.asarray(fr))
        pooled = jax.image.resize(lat, (lat.shape[0], 4, 4, lat.shape[-1]), "linear")
        return pooled.reshape(lat.shape[0], -1)

    if args.frames >= 2:
        ft = _lat_feats(target)
        metrics0["latent_frechet"] = float(frechet_distance(_lat_feats(np.asarray(frames0[0])), ft))
        metrics["latent_frechet"] = float(frechet_distance(_lat_feats(np.asarray(frames[0])), ft))

    # identity drift vs the reference frame, when the preset carries a
    # CLIP-vision tower (reference EMOAnimationPipeline.py:867 identity role)
    if cfg3.clip.vision_enabled and "clip_vision" in trained_params:
        from emox.data.native import resize_bilinear
        from emox.eval import identity_similarity
        from emox.models.clip import clip_normalize

        cs = cfg3.clip.image_size
        def _id_sim(fr):
            small = np.stack([resize_bilinear(np.ascontiguousarray(f, np.float32), cs, cs) for f in fr])
            emb = model3.encode_image_embedding(
                trained_params, clip_normalize(jnp.asarray((small + 1.0) / 2.0)))
            rs = resize_bilinear(np.ascontiguousarray(np.asarray(ref[0]), np.float32), cs, cs)
            remb = model3.encode_image_embedding(
                trained_params, clip_normalize(jnp.asarray((rs[None] + 1.0) / 2.0)))
            return float(identity_similarity(emb, remb[0]))

        metrics0["identity_similarity"] = _id_sim(np.asarray(frames0[0]))
        metrics["identity_similarity"] = _id_sim(np.asarray(frames[0]))

    print("eval (random init):", {k: round(v, 4) for k, v in metrics0.items()})
    print("eval (trained 1->2->3):", {k: round(v, 4) for k, v in metrics.items()})
    if metrics_ctrl is not None:
        print("eval (trained 1->2->3->4, control-composed):",
              {k: round(v, 4) for k, v in metrics_ctrl.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
