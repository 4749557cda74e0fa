"""Command-line entry points.

Replaces the reference's per-stage scripts and distributed driver
(reference train_stage_{1,2,3}*.py __main__ blocks,
magicanimate/pipelines/animation.py:274-282 argparse,
EMOAnimationPipeline.py:950-955) with one `python -m emox` CLI:

  python -m emox precompute --metadata data/overfit.json --videos data/videos --cache data/cache
  python -m emox train --stage 1 --config configs/stage1.yaml
  python -m emox train --stage 2 --from-stage 1
  python -m emox infer --config configs/inference.yaml --ref-image face.png --audio speech.wav --out out.mp4
  python -m emox import-weights --vae vae.safetensors --unet unet.safetensors --out sd_params
  python -m emox eval --gen out.npz --gt data/cache/clip.npz
  python -m emox bench --preset tiny

No torch.multiprocessing.spawn / NCCL rendezvous equivalent is needed:
multi-device execution is a jax.sharding.Mesh inside one process per host
(`jax.distributed.initialize` for multi-host, emox.comm.runtime).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, List, Optional


def _parse_overrides(pairs: List[str]) -> Dict[str, Dict[str, Any]]:
    """--set section.key=value (YAML-typed) -> nested override dict."""
    import yaml

    out: Dict[str, Dict[str, Any]] = {}
    for p in pairs:
        if "=" not in p or "." not in p.split("=", 1)[0]:
            raise SystemExit(f"--set expects section.key=value, got {p!r}")
        k, v = p.split("=", 1)
        sec, key = k.split(".", 1)
        val = yaml.safe_load(v)
        if isinstance(val, str):
            try:  # YAML 1.1 doesn't parse '1e-3' as a float; users expect it
                val = float(val)
            except ValueError:
                pass
        out.setdefault(sec, {})[key] = val
    return out


def _load_config(args) -> "Config":
    from emox.core.config import load_config, stage_presets

    overrides = _parse_overrides(args.set or [])
    if getattr(args, "stage", None) is not None and args.config is None:
        # stage presets as the base when no YAML given
        base = stage_presets(args.stage) if args.stage in (1, 2, 3, 5) else {}
        for sec, vals in overrides.items():
            base.setdefault(sec, {}).update(vals)
        overrides = base
    cfg = load_config(args.config, overrides)
    if getattr(args, "stage", None) is not None:
        from emox.core.config import TrainConfig
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(cfg.train, stage=args.stage))
    return cfg


def cmd_precompute(args) -> int:
    from emox.data.precompute import precompute_dataset

    face_helper = None
    if getattr(args, "face_ckpt", None):
        # trained stage-0 FaceLocator + FaceLandmarkNet replace MediaPipe as
        # the mask/pose provider (reference Net.py:861-1156 FaceHelper)
        from emox.core.config import load_config
        from emox.data.face import FaceHelper
        from emox.models.emo import EMOModel
        from emox.train.trainer import Checkpointer

        cfg = load_config(args.config) if getattr(args, "config", None) else None
        if cfg is None:
            from emox.core.config import Config

            cfg = Config()
        params = Checkpointer(args.face_ckpt).restore_params()
        if params is None:
            raise SystemExit(f"no checkpoint under {args.face_ckpt}")
        face_helper = FaceHelper.from_model(EMOModel(cfg), params)
        print(f"face provider: trained stage-0 nets from {args.face_ckpt}")

    man = precompute_dataset(
        args.metadata, args.videos, args.cache, width=args.width, height=args.height, fps=args.fps,
        face_helper=face_helper, with_control=not args.skip_control,
    )
    with open(man) as f:
        manifest = json.load(f)
    if getattr(args, "debug_overlays", False):
        # head-pose axis overlays per clip, the reference's *_debug.jpg
        # dataset-prep artifact (reference Net.py:1077-1087 draw_axis)
        import numpy as np

        from emox.data.face import pose_debug_overlay
        from emox.infer.video_io import frames_to_uint8

        for cid, entry in manifest.items():
            with np.load(entry["path"]) as z:
                if "landmarks" not in z:
                    continue
                ov = pose_debug_overlay(z["frames"], z["landmarks"])
            if ov is None:
                continue
            dbg = os.path.join(args.cache, f"{cid}_debug.png")
            try:
                import imageio.v3 as iio

                iio.imwrite(dbg, frames_to_uint8(ov))
            except Exception:
                dbg = os.path.join(args.cache, f"{cid}_debug.npy")
                np.save(dbg, ov)
            print(f"pose debug overlay: {dbg}")
    print(f"precomputed {len(manifest)} clips -> {args.cache}")
    return 0


def cmd_pack_records(args) -> int:
    from emox.data.records import write_shards

    idx = write_shards(args.cache, args.out, shard_bytes=args.shard_mb * 1024 * 1024)
    with open(idx) as f:
        meta = json.load(f)
    print(f"packed {len(meta['clips'])} clips into {len(meta['shards'])} shard(s) -> {args.out}")
    return 0


def build_train_data(cfg, stage: int, stage_name: str):
    """Dataset + loader exactly as DataConfig/AugmentConfig specify
    (augmentation, motion-frame priming, stage>=2 first-frame reference,
    multi-worker prefetch) — the round-2 CLI ignored all of these."""
    from emox.data.dataset import DataLoader, EMODataset

    ds = EMODataset(
        cfg.data.cache_dir, stage_name, num_frames=cfg.data.num_frames,
        audio_context_frames=cfg.audio.context_frames, sample_rate=cfg.audio.sample_rate,
        fps=cfg.audio.video_fps, speed_axes=cfg.model.speed_axes,
        augment=cfg.augment if cfg.augment.enabled else None,
        num_motion_frames=cfg.data.num_motion_frames if stage >= 1 else 0,
        # stage >= 2: clip frame 0 is the identity reference (the reference's
        # convention, reference train_stage_2_temporal_audio.py first frame)
        ref_mode="first" if stage >= 2 else "random",
    )
    dl = DataLoader(
        ds, batch_size=cfg.data.batch_size, seed=cfg.data.seed,
        num_workers=max(1, cfg.data.num_workers),
        prefetch=0 if cfg.data.num_workers == 0 else 2,
    )
    return ds, dl


def cmd_train(args) -> int:
    from emox.comm.runtime import initialize_distributed
    from emox.core.config import save_config
    from emox.train.stages import STAGE_DESCRIPTIONS
    from emox.train.trainer import Trainer

    if args.coordinator or args.num_processes:
        info = initialize_distributed(args.coordinator, args.num_processes, args.process_id)
        print(f"process {info.process_index}/{info.process_count}, "
              f"{info.local_devices} local / {info.global_devices} global devices")
    cfg = _load_config(args)
    stage = cfg.train.stage
    stage_name = {0: "stage0-facelocator", 1: "stage1", 2: "stage2", 3: "stage3",
                  4: "stage4-control", 5: "stage1"}[stage]  # stage 5 (VAE) trains on stage-1 single frames
    print(f"stage {stage}: {STAGE_DESCRIPTIONS[stage]}")

    init_params = None
    trainer = Trainer(cfg, init_params=init_params)
    if args.from_stage is not None:
        if not trainer.load_params_from_stage(args.from_stage):
            raise SystemExit(f"no stage-{args.from_stage} checkpoint under {cfg.train.checkpoint_dir}")
        print(f"initialised from stage-{args.from_stage} checkpoint")
    resumed = trainer.resume()
    if resumed:
        print(f"resumed at step {resumed}")
    os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
    save_config(cfg, os.path.join(cfg.train.checkpoint_dir, f"stage{stage}_config.yaml"))

    ds, dl = build_train_data(cfg, stage, stage_name)
    metrics = trainer.fit(dl)
    print(json.dumps({"final_step": int(trainer.state.step), **metrics}))
    return 0


def cmd_infer(args) -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from emox.infer.pipeline import EMOPipeline
    from emox.infer.video_io import save_video, save_videos_grid
    from emox.models.emo import EMOModel
    from emox.train.trainer import Checkpointer

    cfg = _load_config(args)
    model = EMOModel(cfg)
    if args.params:
        ckpt = Checkpointer(args.params)
        params = ckpt.restore_params(use_ema=args.ema)
        if params is None:
            raise SystemExit(f"no checkpoint under {args.params}")
    else:
        print("WARNING: no --params given; using random init (smoke test)")
        params = model.init_params(
            jax.random.PRNGKey(0), num_frames=2, image_size=cfg.inference.height
        )

    ref = _load_image(args.ref_image, cfg.inference.width, cfg.inference.height)
    wav, sr = _load_audio(args.audio, cfg.audio.sample_rate)
    fps = cfg.inference.fps
    total = args.frames or int(len(wav) / sr * fps) or cfg.inference.video_length

    face_mask = None
    if args.face_mask == "auto":
        # stage-0 FaceLocator on the reference image (geometric prior via
        # FaceHelper if the locator is untrained)
        logits = model.locate_face(params, jnp.asarray(ref[None]))
        face_mask = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        if float(face_mask.mean()) < 0.01:
            from emox.data.face import geometric_prior_mask

            face_mask = jnp.asarray(
                geometric_prior_mask(cfg.inference.height, cfg.inference.width)[None]
            )
    elif args.face_mask:
        face_mask = jnp.asarray(_load_image(args.face_mask, cfg.inference.width, cfg.inference.height)[None, ..., :1])

    speeds = _parse_speeds(args.speeds, total, cfg.model.speed_axes)
    tokenizer = None
    if args.prompt is not None:
        from emox.data.tokenizer import CLIPTokenizer

        tokenizer = CLIPTokenizer(args.vocab)
        if tokenizer.is_fallback:
            print("NOTE: no CLIP vocab file (--vocab/EMOX_CLIP_VOCAB); using "
                  "byte-level fallback tokenization")

    n = max(1, args.grid)
    if n > 1:
        # N samples in one batched program: the init latents carry the
        # batch axis, so each row draws its own noise — N distinct samples
        ref = np.repeat(ref[None], n, axis=0)
        wav_b = np.repeat(wav[None], n, axis=0)
        if face_mask is not None:
            face_mask = jnp.repeat(face_mask, n, axis=0)
        if speeds is not None:
            speeds = jnp.repeat(speeds, n, axis=0)
    else:
        ref, wav_b = ref[None], wav[None]

    pipe = EMOPipeline(model, cfg)
    if total > cfg.inference.context_frames and args.autoregressive:
        frames = pipe.generate_long(
            params, jnp.asarray(ref), jnp.asarray(wav_b), total_frames=total,
            segment_length=cfg.inference.context_frames,
            num_inference_steps=args.steps, guidance_scale=args.guidance,
            speeds=speeds, face_mask=face_mask,
            prompt=args.prompt, negative_prompt=args.negative_prompt,
            tokenizer=tokenizer, use_identity=args.identity,
        )
    else:
        frames = pipe(
            params, jnp.asarray(ref), jnp.asarray(wav_b), video_length=total,
            num_inference_steps=args.steps, guidance_scale=args.guidance, face_mask=face_mask,
            speeds=speeds, prompt=args.prompt, negative_prompt=args.negative_prompt,
            tokenizer=tokenizer, use_identity=args.identity,
        )
    if n > 1:
        # tiled multi-sample grid (reference util.py:21-33 save_videos_grid)
        out = save_videos_grid(np.asarray(frames), args.out, fps=fps)
        print(f"wrote {out} ({n}-sample grid, {total} frames @ {fps} fps)")
    else:
        out = save_video(np.asarray(frames[0]), args.out, fps=fps, wav=wav, sample_rate=sr)
        print(f"wrote {out} ({total} frames @ {fps} fps)")
    return 0


def cmd_import_weights(args) -> int:
    import numpy as np

    from emox.interop.torch_import import (
        import_clip_text, import_clip_vision, import_unet2d, import_vae,
        import_wav2vec2, load_torch_state_dict,
    )

    cfg = _load_config(args)
    os.makedirs(args.out, exist_ok=True)
    for name, path, fn, sub_cfg in (
        ("vae", args.vae, import_vae, cfg.vae),
        ("unet", args.unet, import_unet2d, cfg.model),
        ("wav2vec2", args.wav2vec2, import_wav2vec2, cfg.audio),
        ("clip_text", getattr(args, "clip_text", None), import_clip_text, cfg.clip),
        ("clip_vision", getattr(args, "clip_vision", None), import_clip_vision, cfg.clip),
    ):
        if not path:
            continue
        sd = load_torch_state_dict(path)
        tree = fn(sd, sub_cfg)
        report = tree.pop("__report__")
        flat = _flatten(tree)
        np.savez(os.path.join(args.out, f"{name}.npz"), **flat)
        print(f"{name}: {report.summary()}")
    return 0


def cmd_export(args) -> int:
    import jax

    from emox.infer.export import export_denoise_step, save_exported
    from emox.models.emo import EMOModel
    from emox.train.trainer import Checkpointer

    cfg = _load_config(args)
    model = EMOModel(cfg)
    if args.params:
        params = Checkpointer(args.params).restore_params(use_ema=args.ema)
        if params is None:
            raise SystemExit(f"no checkpoint under {args.params}")
    else:
        params = model.init_params(
            jax.random.PRNGKey(0), num_frames=args.frames, image_size=args.size
        )
    exp = export_denoise_step(model, params, num_frames=args.frames, image_size=args.size)
    save_exported(exp, args.out)
    print(f"exported denoise step ({args.frames}f {args.size}^2) -> {args.out}")
    return 0


def cmd_train_face(args) -> int:
    """Train the FaceLocator+FaceLandmarkNet provider nets on the
    synthetic face distribution and write the shipped asset (the
    MediaPipe-replacement bootstrap, reference Net.py:861-1156)."""
    from emox.train.face_nets import save_face_nets, train_face_nets

    import numpy as np

    params, metrics = train_face_nets(
        steps=args.steps, batch_size=args.batch_size, image_size=args.size,
        learning_rate=args.lr, seed=args.seed,
    )
    dtype = np.float32 if args.fp32 else np.float16
    kw = dict(dtype=dtype)
    path = save_face_nets(params, args.out, **kw) if args.out else save_face_nets(params, **kw)
    print(json.dumps({"asset": path, **{k: round(v, 6) for k, v in metrics.items()}}))
    return 0


def cmd_eval(args) -> int:
    """Quality metrics on a generated clip (the evaluation surface the
    reference lacks entirely — SURVEY.md section 6: no FID/FVD/SyncNet or
    timing code anywhere in the reference tree)."""
    import numpy as np

    from emox.eval import evaluate_clip, identity_similarity

    gen = _load_frames(args.gen)
    gt = masks = wav = None
    fps, sr = args.fps, 16000
    if args.gt:
        if args.gt.endswith(".npz"):
            # precompute cache: carries masks/wav/fps alongside the frames
            with np.load(args.gt) as z:
                gt = np.asarray(z["frames"])
                if gt.dtype == np.uint8:
                    gt = gt.astype(np.float32) / 127.5 - 1.0
                masks = np.asarray(z["face_masks"]) if "face_masks" in z else None
                wav = np.asarray(z["wav"]) if "wav" in z else None
                if fps is None and "fps" in z:  # explicit --fps wins
                    fps = float(z["fps"])
        else:
            gt = _load_frames(args.gt)
    fps = 25.0 if fps is None else fps
    if args.audio:
        wav, sr = _load_audio(args.audio, sr)
    if gt is not None:
        t = min(len(gen), len(gt))
        gen, gt = gen[:t], gt[:t]
        masks = masks[:t] if masks is not None else None
        if gen.shape[1:3] != gt.shape[1:3]:
            from emox.data.native import resize_bilinear

            h, w = gt.shape[1:3]
            gen = np.stack([resize_bilinear(np.ascontiguousarray(f, np.float32), h, w) for f in gen])
    metrics = evaluate_clip(gen, gt=gt, masks=masks, wav=wav, fps=fps, sample_rate=sr)

    if args.params:
        import jax.numpy as jnp

        from emox.models.emo import EMOModel
        from emox.train.trainer import Checkpointer

        cfg = _load_config(args)
        model = EMOModel(cfg)
        params = Checkpointer(args.params).restore_params(use_ema=args.ema)
        if params is None:
            raise SystemExit(f"no checkpoint under {args.params}")

        if args.ref_image:
            # CLIP-vision identity drift (reference EMOAnimationPipeline.py:867
            # loads a CLIP image encoder for exactly this identity role)
            if cfg.clip.vision_enabled and "clip_vision" in params:
                from emox.data.native import resize_bilinear
                from emox.models.clip import clip_normalize

                s = cfg.clip.image_size
                ref = _load_image(args.ref_image, s, s)
                small = np.stack([resize_bilinear(np.ascontiguousarray(f, np.float32), s, s) for f in gen])
                emb = model.encode_image_embedding(params, clip_normalize(jnp.asarray((small + 1.0) / 2.0)))
                ref_emb = model.encode_image_embedding(params, clip_normalize(jnp.asarray((ref[None] + 1.0) / 2.0)))
                metrics["identity_similarity"] = float(identity_similarity(emb, ref_emb[0]))
            else:
                print("NOTE: config/checkpoint has no clip_vision; skipping identity metric")

        if gt is not None:
            # FID/FVD-family stand-in: Frechet distance between gaussian
            # fits of per-frame VAE latents (emox's own encoder — no
            # pretrained Inception/I3D download needed)
            import jax

            from emox.eval import frechet_distance

            def enc(fr):
                lat = model.encode_images(params, jnp.asarray(fr))
                # pool to a compact per-frame descriptor: a clip has only
                # T samples, so the gaussian fit needs D << full-latent dim
                pooled = jax.image.resize(lat, (lat.shape[0], 4, 4, lat.shape[-1]), "linear")
                return pooled.reshape(lat.shape[0], -1)

            if len(gen) >= 2 and len(gt) >= 2:
                metrics["latent_frechet"] = float(frechet_distance(enc(gen), enc(gt)))
            else:
                print("NOTE: latent_frechet needs >= 2 frames per set; skipping")

    line = json.dumps({k: round(v, 6) for k, v in metrics.items()})
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


def _load_frames(path: str):
    """mp4/npz/npy -> [T, H, W, 3] float32 in [-1, 1]."""
    import numpy as np

    if path.endswith(".npz"):
        with np.load(path) as z:
            fr = np.asarray(z["frames"])
    elif path.endswith(".npy"):
        fr = np.load(path)
    else:
        from emox.infer.video_io import VideoReader

        r = VideoReader(path)
        fr = np.stack(list(r))
        r.close()
    if fr.dtype == np.uint8:
        fr = fr.astype(np.float32) / 127.5 - 1.0
    return fr[..., :3].astype(np.float32)


def cmd_bench(args) -> int:
    os.environ["EMOX_BENCH_PRESET"] = args.preset
    if args.iters:
        os.environ["EMOX_BENCH_ITERS"] = str(args.iters)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import bench

    bench.main()
    return 0


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def _parse_speeds(spec, total_frames: int, speed_axes: int):
    """--speeds: .npy path ([T] or [T, A]) or comma-separated floats (one
    per axis, held constant over the clip). Reaches the trained stage-3
    speed conditioning (reference EMOAnimationPipeline.py:577
    head_rotation_speeds)."""
    if not spec:
        return None
    import numpy as np
    import jax.numpy as jnp

    if os.path.exists(spec):
        arr = np.load(spec).astype(np.float32)
        if arr.ndim == 1:
            arr = arr[:, None] if speed_axes > 1 else arr
        elif arr.ndim == 2 and speed_axes == 1 and arr.shape[1] == 1:
            arr = arr[:, 0]  # the documented [T, axes] form at axes=1
    else:
        vals = np.asarray([float(v) for v in spec.split(",")], np.float32)
        if len(vals) != speed_axes:
            raise SystemExit(
                f"--speeds got {len(vals)} comma-separated values but the model "
                f"has speed_axes={speed_axes}; pass exactly one value per axis"
            )
        arr = np.tile(vals[None], (total_frames, 1)) if speed_axes > 1 else np.full(
            (total_frames,), vals[0], np.float32)
    # pad/trim to the clip length
    if arr.shape[0] < total_frames:
        arr = np.concatenate([arr, np.repeat(arr[-1:], total_frames - arr.shape[0], axis=0)])
    arr = arr[:total_frames]
    expected_ndim = 2 if speed_axes > 1 else 1
    if arr.ndim != expected_ndim or (speed_axes > 1 and arr.shape[1] != speed_axes):
        raise SystemExit(f"--speeds needs {speed_axes} axis values per frame, got shape {arr.shape}")
    return jnp.asarray(arr[None])


def _load_image(path: str, width: int, height: int):
    import numpy as np

    from emox.data.native import resize_bilinear, u8_to_unit

    if path.endswith(".npy"):
        img = np.load(path)
    else:
        try:
            import imageio.v3 as iio

            img = iio.imread(path)
        except Exception:
            import cv2

            img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    if img.dtype == np.uint8:
        img = u8_to_unit(img)
    if img.shape[:2] != (height, width):
        img = resize_bilinear(np.ascontiguousarray(img, np.float32), height, width)
    return img[..., :3].astype(np.float32)


def _load_audio(path: str, sample_rate: int):
    import numpy as np

    from emox.data.native import resample_linear

    if path.endswith(".npy"):
        return np.load(path).astype(np.float32), sample_rate
    import wave

    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        raw = f.readframes(n)
        pcm = np.frombuffer(raw, np.int16).astype(np.float32) / 32767.0
        if f.getnchannels() > 1:
            pcm = pcm.reshape(-1, f.getnchannels()).mean(axis=1)
    if sr != sample_rate:
        pcm = resample_linear(pcm, float(sr), float(sample_rate))
    return pcm, sample_rate


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="emox", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    pp = sub.add_parser("precompute", help="video/audio -> cached training arrays")
    pp.add_argument("--metadata", required=True)
    pp.add_argument("--videos", required=True)
    pp.add_argument("--cache", required=True)
    pp.add_argument("--width", type=int, default=256)
    pp.add_argument("--height", type=int, default=256)
    pp.add_argument("--fps", type=float, default=25.0)
    pp.add_argument("--face-ckpt", default=None,
                    help="stage-0 checkpoint dir: trained FaceLocator+landmarks as mask/pose provider")
    pp.add_argument("--config", default=None, help="YAML config for --face-ckpt model shape")
    pp.add_argument("--skip-control", action="store_true",
                    help="skip the stage-4 landmark-skeleton control renders (saves cache space when ControlNet training is not planned)")
    pp.add_argument("--debug-overlays", action="store_true",
                    help="write a head-pose axis overlay image per clip (the reference's *_debug.jpg prep artifact)")
    pp.set_defaults(fn=cmd_precompute)

    pk = sub.add_parser(
        "pack-records",
        help="per-clip .npz caches -> sharded mmap records (streaming loader for the 36k-clip corpus)",
    )
    pk.add_argument("--cache", required=True, help="dir of per-clip .npz caches (precompute output)")
    pk.add_argument("--out", required=True, help="output dir for shard-*.rec + index.json")
    pk.add_argument("--shard-mb", type=int, default=512)
    pk.set_defaults(fn=cmd_pack_records)

    pt = sub.add_parser("train", help="run a training stage")
    pt.add_argument("--stage", type=int, choices=(0, 1, 2, 3, 4, 5),
                    help="5 = VAE pretraining (emox extension: bootstrap the "
                    "autoencoder where the reference loads SD's pretrained one)")
    pt.add_argument("--config", default=None, help="YAML config path")
    pt.add_argument("--from-stage", type=int, default=None, help="init from this stage's checkpoint")
    # multi-host bootstrap (replaces the reference's torch.multiprocessing
    # spawn + NCCL TCP rendezvous, reference animation.py:256-271)
    pt.add_argument("--coordinator", default=None, help="coordinator address host:port (multi-host)")
    pt.add_argument("--num-processes", type=int, default=None)
    pt.add_argument("--process-id", type=int, default=None)
    pt.add_argument("--set", nargs="*", action="extend", default=[], metavar="SEC.KEY=VAL", help="config overrides (repeatable)")
    pt.set_defaults(fn=cmd_train)

    pi = sub.add_parser("infer", help="reference image + audio -> talking-head video")
    pi.add_argument("--config", default=None)
    pi.add_argument("--params", default=None, help="checkpoint directory")
    pi.add_argument("--ref-image", required=True)
    pi.add_argument("--audio", required=True)
    pi.add_argument("--out", default="out.mp4")
    pi.add_argument("--frames", type=int, default=None)
    pi.add_argument("--steps", type=int, default=None)
    pi.add_argument("--guidance", type=float, default=None)
    pi.add_argument("--autoregressive", action="store_true")
    pi.add_argument("--grid", type=int, default=1, metavar="N",
                    help="sample N videos in one batch and write a tiled grid mp4 "
                         "(reference save_videos_grid, util.py:21-33)")
    pi.add_argument("--face-mask", default=None, help="'auto' (FaceLocator) or mask image path")
    pi.add_argument("--speeds", default=None,
                    help="head-rotation speeds: .npy ([T] or [T,axes]) or comma floats per axis")
    pi.add_argument("--prompt", default=None, help="text prompt (requires clip.text_enabled)")
    pi.add_argument("--negative-prompt", default="")
    pi.add_argument("--vocab", default=None,
                    help="CLIP vocab: HF dir/vocab.json or openai bpe .txt(.gz); default EMOX_CLIP_VOCAB")
    pi.add_argument("--identity", action="store_true",
                    help="CLIP-encode the reference image as an identity embedding "
                         "(requires clip.vision_enabled + model.use_identity_embed)")
    pi.add_argument("--ema", action="store_true", help="serve EMA shadow weights when present")
    pi.add_argument("--set", nargs="*", action="extend", default=[], metavar="SEC.KEY=VAL")
    pi.set_defaults(fn=cmd_infer)

    pw = sub.add_parser("import-weights", help="PyTorch SD/wav2vec2 checkpoints -> emox params")
    pw.add_argument("--config", default=None)
    pw.add_argument("--vae", default=None)
    pw.add_argument("--unet", default=None)
    pw.add_argument("--wav2vec2", default=None)
    pw.add_argument("--clip-text", default=None, help="CLIPTextModel checkpoint (SD-1.5 text_encoder)")
    pw.add_argument("--clip-vision", default=None, help="CLIPVisionModelWithProjection checkpoint")
    pw.add_argument("--out", required=True)
    pw.add_argument("--set", nargs="*", action="extend", default=[], metavar="SEC.KEY=VAL")
    pw.set_defaults(fn=cmd_import_weights)

    px = sub.add_parser("export", help="AOT-export the denoise step (StableHLO) for serving")
    px.add_argument("--config", default=None)
    px.add_argument("--params", default=None)
    px.add_argument("--out", required=True)
    px.add_argument("--frames", type=int, default=16)
    px.add_argument("--size", type=int, default=256)
    px.add_argument("--ema", action="store_true", help="export EMA shadow weights when present")
    px.add_argument("--set", nargs="*", action="extend", default=[], metavar="SEC.KEY=VAL")
    px.set_defaults(fn=cmd_export)

    pf = sub.add_parser("train-face", help="train + ship the FaceLocator/FaceLandmarkNet asset")
    pf.add_argument("--steps", type=int, default=1500)
    pf.add_argument("--batch-size", type=int, default=32)
    pf.add_argument("--size", type=int, default=128)
    pf.add_argument("--lr", type=float, default=2e-3)
    pf.add_argument("--seed", type=int, default=0)
    pf.add_argument("--out", default=None,
                    help="default: emox/assets/face_nets.npz (stored float16; "
                         "pass --fp32 for full-precision storage)")
    pf.add_argument("--fp32", action="store_true",
                    help="store the asset in float32 instead of the default float16")
    pf.set_defaults(fn=cmd_train_face)

    pe = sub.add_parser("eval", help="quality metrics on a generated clip (PSNR/SSIM/flicker/sync/identity)")
    pe.add_argument("--gen", required=True, help="generated video (.mp4/.npz/.npy)")
    pe.add_argument("--gt", help="ground-truth clip (.npz cache with frames/face_masks/wav, or video)")
    pe.add_argument("--audio", help="driving audio (.wav/.npy); overrides the gt cache's wav")
    pe.add_argument("--ref-image", help="reference image for the CLIP identity metric")
    pe.add_argument("--params", help="checkpoint dir with clip_vision params (identity metric)")
    pe.add_argument("--config", help="config YAML (identity metric)")
    pe.add_argument("--ema", action="store_true", help="use EMA shadow weights for the identity encoder")
    pe.add_argument("--fps", type=float, default=None,
                    help="frame rate (default: the gt cache's fps, else 25)")
    pe.add_argument("--out", help="also write the metrics JSON to this file")
    pe.add_argument("--set", action="append", default=[], metavar="SEC.KEY=VAL")
    pe.set_defaults(fn=cmd_eval, stage=None)

    pb = sub.add_parser("bench", help="denoise-step throughput benchmark")
    pb.add_argument("--preset", default="tiny", choices=("tiny", "small", "flagship", "flagship512"))
    pb.add_argument("--iters", type=int, default=None)
    pb.set_defaults(fn=cmd_bench)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    # persistent compile cache for every CLI entry (no-op on forced-CPU
    # test runs; env vars alone don't work — see emox/core/compile_cache.py)
    from emox.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
