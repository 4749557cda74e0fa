"""Per-stage losses + trainable-parameter masks.

The reference's 3-stage recipe (reference train_stage_1_referencenet.py,
train_stage_2_temporal_audio.py, train_stage_3_speedlayers.py), plus the
stage-0 FaceLocator pretraining its configs describe (reference
configs/training/stage0.yaml, Net.py:819-855):

  stage0  FaceLocator mask prediction (BCE-with-logits).
  stage1  single-frame denoising with reference conditioning; trains
          denoiser spatial weights + ReferenceNet (the reference froze all
          but part of the UNet, train_stage_1_referencenet.py:92-94 — we
          train the full spatial stack since we own the whole model).
  stage2  video clips: trains ONLY temporal + audio-cross-attention layers
          (zero-init, so training starts from stage-1 behaviour); audio
          encoder (wav2vec2) stays frozen like the reference's
          (train_stage_2_temporal_audio.py:516-525).
  stage3  trains ONLY speed embedding + face-mask encoder (reference
          train_stage_3_speedlayers.py:349-354), with the face-region
          weighted loss (reference :419-430) — but using schedule-consistent
          noising, fixing the reference's ad-hoc `latents + noise*t` wart
          (reference :407).

Losses use min-SNR-gamma weighting, noise offset, and CFG conditioning
dropout per reference configs/training/stage0.yaml (snr_gamma 5.0,
noise_offset 0.05, uncond_ratio 0.1).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from emox.core.config import Config
from emox.diffusion.schedule import Schedule, add_noise, get_velocity, min_snr_loss_weight
from emox.models.audio import audio_feature_rate
from emox.models.emo import EMOModel, Params

STAGE_DESCRIPTIONS = {
    0: "FaceLocator mask prediction",
    1: "single-frame reference denoising",
    2: "temporal + audio attention",
    3: "speed + face-region control layers",
    4: "ControlNet dense conditioning branch",
    5: "VAE pretraining (recon + KL; the reference loads SD's pretrained "
       "VAE instead — this stage bootstraps one where no weights exist)",
}

# param-name substrings per conditioning family (denoiser collection)
_TEMPORAL_KEYS = ("_temporal",)
_AUDIO_KEYS = ("_audio",)
_SPEED_KEYS = ("speed_embed",)
_FACE_KEYS = ("face_mask_encoder",)


def _mask_tree(params: Params, pred: Callable[[str], bool]) -> Any:
    """Boolean pytree matching params: pred over '/'-joined path."""

    def from_path(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        return pred("/".join(str(k) for k in keys))

    return jax.tree_util.tree_map_with_path(from_path, params)


def trainable_mask(params: Params, stage: int) -> Any:
    """True = optimizer updates this leaf. Top-level keys: vae,
    reference_net, denoiser, audio_encoder, face_locator."""

    def pred(path: str) -> bool:
        top = path.split("/")[0]
        if stage == 0:
            # FaceLocator (masks) + FaceLandmarkNet (6-point pose landmarks)
            # train together — the self-hosted replacement for MediaPipe
            # (reference Net.py:861-1156)
            return top in ("face_locator", "landmarker")
        if stage == 4:
            # ControlNet branch only (reference trains the controlnet
            # separately from the frozen UNet, controlnet.py from_unet flow)
            return top == "controlnet"
        if stage == 5:
            # VAE pretraining: the autoencoder alone. Not a reference stage
            # (it loads runwayml/stable-diffusion-v1-5's VAE,
            # train_stage_1_referencenet.py:124-133); emox additionally
            # supports bootstrapping its own VAE for from-scratch runs.
            return top == "vae"
        if top in ("vae", "audio_encoder", "face_locator", "controlnet", "clip_text", "clip_vision"):
            return False  # frozen in stages 1-3 (CLIP always frozen, as in
            # the reference: text_encoder loaded eval-only, animation.py:76)
        is_temporal = any(k in path for k in _TEMPORAL_KEYS)
        is_audio = any(k in path for k in _AUDIO_KEYS)
        is_speed = any(k in path for k in _SPEED_KEYS)
        is_face = any(k in path for k in _FACE_KEYS)
        if stage == 1:
            # spatial stack only (temporal/audio/speed/face stay at init)
            return not (is_temporal or is_audio or is_speed or is_face)
        if stage == 2:
            return is_temporal or is_audio
        if stage == 3:
            return is_speed or is_face
        raise ValueError(f"bad stage {stage}")

    return _mask_tree(params, pred)


def _downsample_mask(mask: jax.Array, h: int, w: int) -> jax.Array:
    """Pixel-space face mask [B, H, W, 1] -> latent-res [B, 1, h, w, 1]."""
    out = jax.image.resize(mask, (mask.shape[0], h, w, 1), method="bilinear")
    return out[:, None]


def stage_loss_fn(model: EMOModel, config: Config, sched: Schedule, stage: int):
    """Returns loss(params, batch, key) -> (loss, metrics)."""
    dcfg = config.diffusion
    acfg = config.audio

    def facelocator_loss(params: Params, batch: Dict, key: jax.Array):
        logits = model.locate_face(params, batch["images"])
        labels = batch["masks"]
        bce = jnp.mean(
            jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        iou_pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        inter = jnp.sum(iou_pred * labels)
        union = jnp.sum(jnp.maximum(iou_pred, labels))
        loss = bce
        metrics = {"loss": loss, "iou": inter / jnp.maximum(union, 1.0)}
        if "landmarks" in batch:
            # joint 6-point landmark regression (soft-argmax head) so the
            # trained provider can replace MediaPipe in precompute.
            # Per-sample validity mask: batches mixing annotated and bare
            # clips keep supervision for the annotated items (ADVICE r2)
            lm_pred = model.locate_landmarks(params, batch["images"])
            per = jnp.mean(
                (lm_pred.astype(jnp.float32) - batch["landmarks"]) ** 2, axis=(1, 2)
            )  # [B]
            valid = batch.get(
                "landmarks_valid", jnp.ones(per.shape[0], jnp.float32)
            ).astype(jnp.float32)
            lm_err = jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            loss = loss + 10.0 * lm_err
            metrics = dict(metrics, loss=loss, landmark_mse=lm_err,
                           landmark_frac=jnp.mean(valid))
        return loss, metrics

    def vae_loss(params: Params, batch: Dict, key: jax.Array):
        """Stage 5: autoencoder pretraining — L1+L2 reconstruction plus a
        tiny KL (SD's VAE recipe shape, minus the perceptual/GAN terms:
        kl weight 1e-6 keeps the posterior tight so the diffusion stages'
        stochastic encode adds negligible latent noise). latent_std is
        reported so callers can calibrate VAEConfig.scaling_factor the way
        SD derived 0.18215 (1/std of the trained latent distribution)."""
        if "images" in batch:
            imgs = batch["images"]
        else:
            f = batch["frames"]
            imgs = f.reshape(-1, *f.shape[-3:])
        recon, dist = model.modules.vae.apply({"params": params["vae"]}, imgs, key)
        x = imgs.astype(jnp.float32)
        recon = recon.astype(jnp.float32)
        rec_mse = jnp.mean((recon - x) ** 2)
        rec_l1 = jnp.mean(jnp.abs(recon - x))
        kl = jnp.mean(dist.kl().astype(jnp.float32))  # summed over latent dims
        loss = rec_mse + rec_l1 + config.train.vae_kl_weight * kl
        metrics = {
            "loss": loss, "recon_mse": rec_mse, "recon_l1": rec_l1, "kl": kl,
            "latent_std": jnp.std(dist.mean.astype(jnp.float32)),
        }
        return loss, metrics

    def denoise_loss(params: Params, batch: Dict, key: jax.Array):
        k_enc, k_noise, k_t, k_off, k_drop = jax.random.split(key, 5)
        if stage == 1:
            frames = batch["images"][:, None]  # [B, 1, H, W, 3]
        else:
            frames = batch["frames"]
        num_motion = 0
        if stage >= 2 and "motion_frames" in batch:
            # motion-frame priming (reference Net.py:44-72): preceding
            # frames join the clip so temporal attention conditions on
            # them; their own noise prediction is excluded from the loss
            num_motion = batch["motion_frames"].shape[1]
            frames = jnp.concatenate([batch["motion_frames"], frames], axis=1)
        b, t = frames.shape[:2]
        # posterior sample (reference parity) vs deterministic mode — see
        # TrainConfig.vae_encode for when each is right
        enc_key = k_enc if config.train.vae_encode == "sample" else None
        latents = model.encode_images(params, frames, key=enc_key)
        ref_latent = model.encode_images(params, batch["ref_image"])
        noise = jax.random.normal(k_noise, latents.shape)
        if dcfg.noise_offset > 0:
            noise = noise + dcfg.noise_offset * jax.random.normal(k_off, (b, 1, 1, 1, 1))
        ts = jax.random.randint(k_t, (b,), 0, sched.num_train_timesteps)
        noisy = add_noise(sched, latents, noise, ts)

        # CFG conditioning dropout over the REFERENCE (identity) so guidance
        # over identity is actually trained (reference stage0.yaml
        # uncond_ratio 0.1; the uncond masking at inference is
        # mutual_self_attention.py:243-255)
        ref_dropout = None
        if config.train.uncond_ratio > 0:
            k_drop, k_rdrop = jax.random.split(k_drop)
            ref_dropout = jax.random.bernoulli(k_rdrop, config.train.uncond_ratio, (b,))

        identity_embed = None
        if config.model.use_identity_embed:
            # CLIP-encode the reference image into the identity embedding
            # the denoiser adds to its time embedding — without this the
            # zero-init identity_embed_proj receives no gradient and the
            # inference-time --identity path stays a silent no-op
            # (reference EMOAnimationPipeline.py:867 image_enc). CLIP
            # vision itself stays frozen (trainable_mask). Dropped with
            # the reference under the same CFG mask: a zeroed embedding
            # contributes exactly nothing through the bias-free projection.
            from emox.models.clip import clip_normalize

            s = config.clip.image_size
            small = jax.image.resize(batch["ref_image"], (b, s, s, 3), "bilinear")
            identity_embed = model.encode_image_embedding(
                params, clip_normalize((small.astype(jnp.float32) + 1.0) / 2.0)
            )
            if ref_dropout is not None:
                identity_embed = identity_embed * (
                    1.0 - ref_dropout.astype(identity_embed.dtype)
                )[:, None]

        audio_windows = None
        if stage >= 2 and "wav" in batch:
            feats = model.modules.audio_encoder.apply({"params": params["audio_encoder"]}, batch["wav"])
            from emox.models.audio import align_audio_to_frames

            # wav slice starts `context_frames` before the (un-primed) clip;
            # motion frames sit a further num_motion frames earlier, so the
            # offset shrinks accordingly (their windows zero-pad off the edge)
            audio_windows = align_audio_to_frames(
                feats, t, audio_feature_rate(acfg), acfg.video_fps, acfg.context_frames,
                frame_offset=acfg.context_frames - num_motion,
            )
            # CFG dropout on audio conditioning
            if config.train.uncond_ratio > 0:
                keep = jax.random.bernoulli(k_drop, 1.0 - config.train.uncond_ratio, (b, 1, 1, 1))
                audio_windows = audio_windows * keep

        speeds = batch.get("speeds") if stage == 3 else None
        face_mask = batch.get("masks") if stage == 3 else None
        control_cond = batch.get("control") if stage == 4 else None

        pred = model.predict_noise(
            params, noisy, ts, ref_latent, audio_windows=audio_windows,
            speeds=speeds, face_mask=face_mask, control_cond=control_cond,
            ref_dropout=ref_dropout, identity_embed=identity_embed,
        )
        target = noise if sched.prediction_type == "epsilon" else get_velocity(sched, latents, noise, ts)
        err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if num_motion > 0:
            err = err[:, num_motion:]
        per_sample = jnp.mean(err, axis=tuple(range(1, err.ndim)))
        w = min_snr_loss_weight(sched, ts, dcfg.snr_gamma)
        loss = jnp.mean(w * per_sample)
        metrics = {"loss": loss, "mse": jnp.mean(per_sample)}
        if stage == 3 and face_mask is not None:
            lm = _downsample_mask(face_mask, latents.shape[2], latents.shape[3])
            face_err = jnp.sum(err * lm) / (jnp.sum(lm) * err.shape[1] * err.shape[-1] + 1e-6)
            loss = loss + config.train.face_loss_weight * face_err
            metrics = {"loss": loss, "mse": metrics["mse"], "face_mse": face_err}
        return loss, metrics

    if stage == 0:
        return facelocator_loss
    if stage == 5:
        return vae_loss
    return denoise_loss
