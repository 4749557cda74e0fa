"""EMOModel: the full composition (reference Net.py:415-518).

Bundles VAE + ReferenceNet (writer) + denoising UNet3D (reader) +
audio encoder + face locator into one object with explicit param trees per
submodel — the TPU-native equivalent of the reference's EMOModel, with the
audio/speed/face conditioning actually wired into the denoiser (the
reference passed them into a UNet that ignored them,
reference EMOAnimationPipeline.py:777-786 vs unet_controlnet.py:328-339).

All methods are pure functions of (params, inputs) — jit/pjit friendly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from emox.core.config import Config
from emox.models.audio import AudioEncoder, align_audio_to_frames, audio_feature_rate
from emox.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from emox.models.controlnet import ControlNetEncoder
from emox.models.unet import UNet, reference_net_config
from emox.models.vae import AutoencoderKL
from emox.nn.conditioners import FaceLandmarkNet, FaceLocator

Params = Dict[str, Any]


@dataclass
class EMOModules:
    vae: AutoencoderKL
    reference_net: UNet
    denoiser: UNet
    audio_encoder: AudioEncoder
    face_locator: FaceLocator
    landmarker: FaceLandmarkNet = None
    controlnet: Optional[ControlNetEncoder] = None
    clip_text: Optional[CLIPTextEncoder] = None
    clip_vision: Optional[CLIPVisionEncoder] = None


class EMOModel:
    def __init__(self, config: Config, dtype=jnp.float32, param_dtype=jnp.float32, mesh=None):
        """mesh: optional jax.sharding.Mesh. When its `context` axis is >1
        the denoiser's temporal attention runs as ring attention over it
        (frame-axis sequence parallelism; see emox/ops/ring.py). Do NOT pass
        a mesh for models driven through the windowed sampler — the ring's
        shard_map cannot sit under that sampler's vmap."""
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.modules = EMOModules(
            vae=AutoencoderKL(config.vae, **kw),
            reference_net=UNet(reference_net_config(config.model), **kw),
            denoiser=UNet(config.model, mesh=mesh, **kw),
            audio_encoder=AudioEncoder(config.audio, **kw),
            face_locator=FaceLocator(**kw),
            landmarker=FaceLandmarkNet(**kw),
            controlnet=ControlNetEncoder(config.model, **kw) if config.model.use_controlnet else None,
            clip_text=CLIPTextEncoder(config.clip, **kw) if config.clip.text_enabled else None,
            clip_vision=CLIPVisionEncoder(config.clip, **kw) if config.clip.vision_enabled else None,
        )
        if config.model.use_identity_embed and not config.clip.vision_enabled:
            raise ValueError(
                "model.use_identity_embed=True needs clip.vision_enabled=True: "
                "the identity embedding is the CLIP-vision encoding of the "
                "reference image (trained into the denoiser by every stage)"
            )

    # ---- init ------------------------------------------------------------
    def init_params(self, key: jax.Array, num_frames: int = 2, image_size: Optional[int] = None) -> Params:
        cfg = self.config
        size = image_size or cfg.data.height
        lat = size // cfg.vae.downscale
        kv, kr, kd, ka, kf = jax.random.split(key, 5)
        img = jnp.zeros((1, size, size, 3))
        ref_lat = jnp.zeros((1, lat, lat, cfg.model.in_channels))
        vid_lat = jnp.zeros((1, num_frames, lat, lat, cfg.model.in_channels))
        ts = jnp.zeros((1,), jnp.int32)
        wav = jnp.zeros((1, cfg.audio.sample_rate))  # 1 second
        params: Params = {}
        params["vae"] = self.modules.vae.init(kv, img)["params"]
        params["reference_net"] = self.modules.reference_net.init(kr, ref_lat, ts, emit_ref=True)["params"]
        ref_feats = self.reference_features({"reference_net": params["reference_net"]}, ref_lat, ts)
        params["audio_encoder"] = self.modules.audio_encoder.init(ka, wav)["params"]
        feats = self.modules.audio_encoder.apply({"params": params["audio_encoder"]}, wav)
        audio_win = align_audio_to_frames(
            feats, num_frames, audio_feature_rate(cfg.audio), cfg.audio.video_fps, cfg.audio.context_frames
        )
        speeds0 = (
            jnp.zeros((1, num_frames))
            if cfg.model.speed_axes == 1
            else jnp.zeros((1, num_frames, cfg.model.speed_axes))
        )
        ctx0 = (
            jnp.zeros((1, 2, cfg.model.cross_attention_dim))
            if (cfg.model.use_cross_attention and cfg.model.attention_levels and cfg.clip.text_enabled)
            else None
        )
        ide0 = jnp.zeros((1, cfg.clip.projection_dim)) if cfg.model.use_identity_embed else None
        params["denoiser"] = self.modules.denoiser.init(
            kd,
            vid_lat,
            ts,
            context=ctx0,
            ref_features=ref_feats,
            audio=audio_win,
            speeds=speeds0,
            face_mask=jnp.zeros((1, size, size, 1)),
            identity_embed=ide0,
        )["params"]
        params["face_locator"] = self.modules.face_locator.init(kf, img)["params"]
        params["landmarker"] = self.modules.landmarker.init(jax.random.fold_in(key, 98), img)["params"]
        if self.modules.controlnet is not None:
            kc = jax.random.fold_in(key, 99)
            cond = jnp.zeros((1, size, size, cfg.model.control_cond_channels))
            params["controlnet"] = self.modules.controlnet.init(kc, vid_lat, ts, cond)["params"]
        if self.modules.clip_text is not None:
            kt = jax.random.fold_in(key, 100)
            ids = jnp.zeros((1, min(8, cfg.clip.max_positions)), jnp.int32)
            params["clip_text"] = self.modules.clip_text.init(kt, ids)["params"]
        if self.modules.clip_vision is not None:
            ki = jax.random.fold_in(key, 101)
            im = jnp.zeros((1, cfg.clip.image_size, cfg.clip.image_size, 3))
            params["clip_vision"] = self.modules.clip_vision.init(ki, im)["params"]
        return params

    # ---- submodel applies --------------------------------------------------
    def encode_images(self, params: Params, images: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        """[..., H, W, 3] in [-1,1] -> scaled latents [..., h, w, 4]."""
        shape = images.shape
        flat = images.reshape(-1, *shape[-3:])
        dist = self.modules.vae.apply({"params": params["vae"]}, flat, method=AutoencoderKL.encode)
        z = dist.sample(key) if key is not None else dist.mode()
        z = z * self.config.vae.scaling_factor
        return z.reshape(*shape[:-3], *z.shape[-3:])

    def decode_latents(self, params: Params, latents: jax.Array, chunk: int = 0) -> jax.Array:
        """Latents -> images. chunk > 0 decodes that many frames at a time
        via lax.map — bounds peak memory for long clips (the reference's
        VAE slicing + per-frame decode loop, EMOAnimationPipeline.py:170-174,
        291-307 — but compiled, not a Python loop)."""
        shape = latents.shape
        flat = latents.reshape(-1, *shape[-3:]) / self.config.vae.scaling_factor
        dec = lambda z: self.modules.vae.apply({"params": params["vae"]}, z, method=AutoencoderKL.decode)
        n = flat.shape[0]
        if chunk and n > chunk and n % chunk == 0:
            img = jax.lax.map(dec, flat.reshape(n // chunk, chunk, *shape[-3:]))
            img = img.reshape(n, *img.shape[-3:])
        else:
            img = dec(flat)
        return img.reshape(*shape[:-3], *img.shape[-3:])

    def reference_outputs(self, params: Params, ref_latent: jax.Array, timesteps: jax.Array):
        """Writer pass: UNetOutputs with ref_features (K/V banks) and — when
        model.use_gn_ref — ref_gn AdaIN statistic banks."""
        return self.modules.reference_net.apply(
            {"params": params["reference_net"]}, ref_latent, timesteps, emit_ref=True
        )

    def reference_features(self, params: Params, ref_latent: jax.Array, timesteps: jax.Array):
        return self.reference_outputs(params, ref_latent, timesteps).ref_features

    def reference_outputs_for_steps(self, params: Params, ref_latent: jax.Array, timesteps_vec: jax.Array):
        """Writer banks for ALL S sampler timesteps in ONE batched pass.

        The writer's output depends only on (ref_latent, t), so a DDIM
        sampler can precompute every step's banks up front — batching S
        one-frame writer passes into one [S*B] pass reads the writer
        weights once instead of S times (the reference reruns its
        appearance encoder every timestep,
        reference EMOAnimationPipeline.py:711-716; same math, amortised).
        Returns (ref_features, ref_gn) pytrees with a leading S axis;
        select a step's banks with jax.tree.map(lambda x: x[i], ...)."""
        S = timesteps_vec.shape[0]
        B = ref_latent.shape[0]
        tiled = jnp.broadcast_to(ref_latent[None], (S, *ref_latent.shape)).reshape(
            S * B, *ref_latent.shape[1:]
        )
        out = self.reference_outputs(params, tiled, jnp.repeat(timesteps_vec, B))
        reshape = lambda x: x.reshape(S, B, *x.shape[1:])
        feats = jax.tree.map(reshape, out.ref_features)
        gn = None if out.ref_gn is None else jax.tree.map(reshape, out.ref_gn)
        return feats, gn

    def encode_audio(self, params: Params, wav: jax.Array, num_frames: int) -> jax.Array:
        cfg = self.config.audio
        feats = self.modules.audio_encoder.apply({"params": params["audio_encoder"]}, wav)
        return align_audio_to_frames(feats, num_frames, audio_feature_rate(cfg), cfg.video_fps, cfg.context_frames)

    def encode_face_mask(self, params: Params, face_mask: jax.Array, latent_size: int) -> jax.Array:
        """Pre-encode the face-region mask residual ONCE per clip
        (it depends only on the static mask; reference Net.py:591-605
        FaceRegionController re-ran per forward). Returns [B, h, w, C0] to
        pass as predict_noise(face_feat=...) — exactly the per-step math."""
        from emox.nn.conditioners import FaceMaskEncoder

        cfg = self.config.model
        ds = face_mask.shape[1] // latent_size
        num_downs = max(0, ds.bit_length() - 1)
        enc = FaceMaskEncoder(
            cfg.block_channels[0], num_downs=num_downs,
            dtype=self.modules.denoiser.dtype, param_dtype=self.modules.denoiser.param_dtype,
        )
        return enc.apply({"params": params["denoiser"]["face_mask_encoder"]}, face_mask)

    def locate_face(self, params: Params, images: jax.Array) -> jax.Array:
        return self.modules.face_locator.apply({"params": params["face_locator"]}, images)

    def locate_landmarks(self, params: Params, images: jax.Array) -> jax.Array:
        """[B, H, W, 3] in [-1,1] -> [B, 6, 2] normalised (y, x) landmarks
        (trained MediaPipe-FaceMesh replacement, reference Net.py:861-1156)."""
        return self.modules.landmarker.apply({"params": params["landmarker"]}, images)

    def encode_text(self, params: Params, input_ids: jax.Array) -> jax.Array:
        """CLIP token ids [B, L] -> per-token embeddings [B, L, C] for the
        denoiser's cross-attention context (reference
        pipeline_animation.py:184-271 _encode_prompt)."""
        if self.modules.clip_text is None:
            raise ValueError("clip.text_enabled is False in this config")
        return self.modules.clip_text.apply({"params": params["clip_text"]}, input_ids)

    def encode_image_embedding(self, params: Params, images: jax.Array) -> jax.Array:
        """CLIP-normalised images [B, H, W, 3] -> projected identity
        embedding [B, proj] (reference EMOAnimationPipeline.py:867)."""
        if self.modules.clip_vision is None:
            raise ValueError("clip.vision_enabled is False in this config")
        return self.modules.clip_vision.apply({"params": params["clip_vision"]}, images)

    # ---- the paper-shaped forward (reference Net.py:476-518) --------------
    def predict_noise(
        self,
        params: Params,
        noisy_latents: jax.Array,  # [B, T, h, w, 4]
        timesteps: jax.Array,  # [B]
        ref_latent: Optional[jax.Array],  # [B, h, w, 4]; None = no reference branch at all
        audio_windows: Optional[jax.Array] = None,  # [B, T, A, D]
        speeds: Optional[jax.Array] = None,  # [B, T]
        face_mask: Optional[jax.Array] = None,  # [B, H, W, 1]
        context: Optional[jax.Array] = None,  # [B, Lc, cross_dim] CLIP text tokens
        control_cond: Optional[jax.Array] = None,  # [B(, T), H, W, Cc] pixel space
        control_scale: float = 1.0,
        ref_dropout: Optional[jax.Array] = None,  # [B] bool, True = sample sees no ref
        identity_embed: Optional[jax.Array] = None,  # [B, proj] CLIP image embedding
        ref_features: Optional[Any] = None,  # precomputed writer banks (see reference_outputs)
        ref_gn: Optional[Any] = None,
        face_feat: Optional[jax.Array] = None,  # pre-encoded mask residual (encode_face_mask)
    ) -> jax.Array:
        """ref_latent=None skips ReferenceNet entirely (a true uncond program,
        cheaper than the per-sample ref_dropout mask); ref_dropout drops the
        reference per-sample inside one program (CFG batch doubling, training
        conditioning dropout — reference mutual_self_attention.py:243-255)."""
        ref_feats = ref_features
        if ref_latent is not None and ref_feats is None:
            rout = self.reference_outputs(params, ref_latent, timesteps)
            ref_feats, ref_gn = rout.ref_features, rout.ref_gn
        control = None
        if control_cond is not None and self.modules.controlnet is not None:
            control = self.modules.controlnet.apply(
                {"params": params["controlnet"]}, noisy_latents, timesteps, control_cond,
                conditioning_scale=control_scale,
            )
        out = self.modules.denoiser.apply(
            {"params": params["denoiser"]},
            noisy_latents,
            timesteps,
            context=context,
            ref_features=ref_feats,
            ref_gn=ref_gn,
            audio=audio_windows,
            speeds=speeds,
            face_mask=face_mask,
            face_feat=face_feat,
            control=control,
            ref_dropout=ref_dropout,
            identity_embed=identity_embed,
        )
        return out.sample
