"""EMOPipeline: one reference image + audio -> talking-head video.

The compiled, TPU-native equivalent of the reference's
EMOAnimationPipeline.__call__ (reference EMOAnimationPipeline.py:543-835):

  * classifier-free guidance via batch doubling (uncond = a true
    no-reference branch via per-sample ref_dropout + zeroed audio;
    reference used empty-prompt embeddings + uncond-masked attention
    banks, EMOAnimationPipeline.py:641-679,
    mutual_self_attention.py:243-255),
  * short clips: single lax.scan DDIM loop; long clips: overlapping
    context windows from a static WindowPlan, scatter-add accumulation
    (reference context.py + the rank-sharded window loop at :757),
  * autoregressive segment continuation with motion-frame latent locking
    (the reference's motion-frames design, reference Net.py:44-72,
    EMODataset motion_frames) for arbitrarily long videos,
  * optional latent frame interpolation (reference :479-512).

Everything from VAE encode to VAE decode runs inside jit.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from emox.core.config import Config
from emox.diffusion.context import window_plan
from emox.diffusion.interp import interpolate_latents
from emox.diffusion.sampler import cfg_combine, ddim_invert
from emox.diffusion.schedule import add_noise, ddim_step, inference_timesteps, make_schedule
from emox.models.emo import EMOModel, Params


class EMOPipeline:
    def __init__(self, model: EMOModel, config: Optional[Config] = None, mesh=None):
        """mesh: optional jax.sharding.Mesh; when its `context` axis is >1,
        the overlapping denoise windows shard across it (the compiled
        equivalent of the reference's `global_context[rank::world_size]`
        multi-GPU split, reference EMOAnimationPipeline.py:757-821 — but as
        one program with no host gather/broadcast per step)."""
        self.model = model
        self.config = config or model.config
        self.mesh = mesh
        self.sched = make_schedule(self.config.diffusion)
        self._jitted: Dict = {}

    def _shard_windows(self, windows: jax.Array) -> jax.Array:
        """Constrain the leading window axis over the mesh `context` axis."""
        if self.mesh is None:
            return windows
        from emox.core.mesh import MeshAxes
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.mesh.shape.get(MeshAxes.CONTEXT, 1) <= 1:
            return windows
        spec = [None] * windows.ndim
        spec[0] = MeshAxes.CONTEXT
        return jax.lax.with_sharding_constraint(windows, NamedSharding(self.mesh, P(*spec)))

    # ---- conditioning ----------------------------------------------------
    def _prepare(self, params: Params, ref_image: jax.Array, wav: jax.Array, num_frames: int):
        ref_latent = self.model.encode_images(params, ref_image)
        audio = self.model.encode_audio(params, wav, num_frames)
        return ref_latent, audio

    def _model_out(self, params, latents, t, ref_latent, audio, speeds, face_mask, guidance_scale,
                   control_cond=None, context=None, uncond_context=None, identity_embed=None,
                   ref_features=None, ref_gn=None):
        """CFG-combined noise prediction for the full latent clip.

        NB: by the time this runs, `face_mask` holds the PRE-ENCODED
        per-clip residual (EMOModel.encode_face_mask in generate_latents),
        forwarded as predict_noise(face_feat=...) — identical math to the
        in-step encoder, computed once per clip.

        Uncond is a TRUE no-reference branch: the uncond half never attends
        to reference tokens (per-sample ref_dropout in the batched program;
        ref_latent=None in the two-call program — the reference's
        uncond-masked attention banks, mutual_self_attention.py:243-255,
        plus empty-prompt embeddings, EMOAnimationPipeline.py:641-679).
        Audio is zeroed for the uncond half. With cfg_batching the two
        branches run as one doubled-batch call.

        With model.use_gn_ref the two modes are intentionally NOT
        numerically identical: the batched program applies the reference's
        exact uncond semantics (the uncond half keeps style_fidelity of its
        own GroupNorm statistics and (1-style_fidelity) of the AdaIN'd
        ones, mutual_self_attention.py read mode), while the two-call
        program (ref_latent=None) runs a pure no-reference uncond — the
        style_fidelity=1 limit. Use cfg_batching=True for reference-faithful
        AdaIN guidance.
        """
        if guidance_scale == 1.0:
            return self.model.predict_noise(
                params, latents, t, ref_latent, audio_windows=audio, speeds=speeds,
                face_feat=face_mask, control_cond=control_cond, context=context,
                identity_embed=identity_embed, ref_features=ref_features, ref_gn=ref_gn,
            )
        if context is not None and uncond_context is None:
            raise ValueError(
                "prompt-conditioned CFG needs uncond_context (the empty-prompt "
                "embedding, reference pipeline_animation.py:243-271); use "
                "EMOPipeline.encode_prompt"
            )
        b = latents.shape[0]
        cat = lambda a, b_: jnp.concatenate([a, b_], axis=0)
        if self.config.inference.cfg_batching:
            drop = jnp.concatenate([jnp.ones((b,), bool), jnp.zeros((b,), bool)])
            rf2 = None if ref_features is None else jax.tree.map(lambda x: cat(x, x), ref_features)
            rg2 = None if ref_gn is None else jax.tree.map(lambda x: cat(x, x), ref_gn)
            out = self.model.predict_noise(
                params,
                cat(latents, latents),
                cat(t, t),
                cat(ref_latent, ref_latent),
                audio_windows=None if audio is None else cat(jnp.zeros_like(audio), audio),
                speeds=None if speeds is None else cat(speeds, speeds),
                face_feat=None if face_mask is None else cat(face_mask, face_mask),
                control_cond=None if control_cond is None else cat(control_cond, control_cond),
                context=None if context is None else cat(uncond_context, context),
                identity_embed=None if identity_embed is None
                else cat(jnp.zeros_like(identity_embed), identity_embed),
                ref_dropout=drop,
                ref_features=rf2,
                ref_gn=rg2,
            )
            return cfg_combine(out[:b], out[b:], guidance_scale)
        cond = self.model.predict_noise(
            params, latents, t, ref_latent, audio_windows=audio, speeds=speeds, face_feat=face_mask,
            control_cond=control_cond, context=context, identity_embed=identity_embed,
            ref_features=ref_features, ref_gn=ref_gn,
        )
        uncond = self.model.predict_noise(
            params, latents, t, None,
            audio_windows=None if audio is None else jnp.zeros_like(audio),
            speeds=speeds, face_feat=face_mask, control_cond=control_cond,
            context=uncond_context,
            identity_embed=None if identity_embed is None else jnp.zeros_like(identity_embed),
        )
        return cfg_combine(uncond, cond, guidance_scale)

    def _precompute_banks(self, params, ref_latent, ts):
        """One batched writer pass for all sampler steps (identical math to
        the reference's per-step appearance-encoder rerun,
        reference EMOAnimationPipeline.py:711-716 — see
        EMOModel.reference_outputs_for_steps). Returns (None, None) when
        disabled or no reference is in play."""
        if (
            not self.config.inference.precompute_ref_banks
            or ref_latent is None
            or not self.model.config.model.use_reference
        ):
            return None, None
        return self.model.reference_outputs_for_steps(params, ref_latent, ts)

    # ---- samplers --------------------------------------------------------
    def _sample_short(
        self, params, key, ref_latent, audio, speeds, face_mask, num_frames, num_steps,
        guidance_scale, lock_latents=None, num_locked=0, control_cond=None,
        context=None, uncond_context=None, identity_embed=None,
    ):
        """Single-window DDIM scan. If lock_latents is given, the first
        num_locked frames are re-noised known latents each step
        (motion-frame continuation)."""
        h = ref_latent.shape[1]
        w = ref_latent.shape[2]
        c = ref_latent.shape[3]
        b = ref_latent.shape[0]
        ts = inference_timesteps(self.sched.num_train_timesteps, num_steps)
        ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
        k_init, k_lock = jax.random.split(key)
        latents = jax.random.normal(k_init, (b, num_frames, h, w, c))
        feats_all, gn_all = self._precompute_banks(params, ref_latent, ts)

        eta = self.config.diffusion.ddim_eta

        def body(lat, step):
            i, t, t_prev, k = step
            k_lock, k_eta = jax.random.split(k)
            tb = jnp.full((b,), t, jnp.int32)
            if lock_latents is not None and num_locked > 0:
                noised = add_noise(self.sched, lock_latents, jax.random.normal(k_lock, lock_latents.shape), tb)
                lat = jnp.concatenate([noised[:, :num_locked], lat[:, num_locked:]], axis=1)
            rf = None if feats_all is None else jax.tree.map(lambda x: x[i], feats_all)
            rg = None if gn_all is None else jax.tree.map(lambda x: x[i], gn_all)
            out = self._model_out(
                params, lat, tb, ref_latent, audio, speeds, face_mask, guidance_scale,
                control_cond=control_cond, context=context, uncond_context=uncond_context,
                identity_embed=identity_embed, ref_features=rf, ref_gn=rg,
            )
            lat = ddim_step(self.sched, out, lat, tb, jnp.full((b,), t_prev, jnp.int32),
                            eta=eta, key=k_eta if eta > 0 else None)
            return lat, None

        keys = jax.random.split(k_lock, num_steps)
        final, _ = jax.lax.scan(body, latents, (jnp.arange(num_steps), ts, ts_prev, keys))
        return final

    def _sample_windowed(
        self, params, key, ref_latent, audio, speeds, face_mask, num_frames, num_steps, guidance_scale,
        lock_latents=None, num_locked=0, control_cond=None,
        context=None, uncond_context=None, identity_embed=None,
    ):
        """Overlapping-window denoise over a long frame axis. Composes with
        motion-frame continuation (lock_latents re-noised into the first
        num_locked frames each step) and ControlNet conditioning (per-frame
        control windows gathered alongside latent windows)."""
        icfg = self.config.inference
        plan = window_plan(
            num_steps, num_frames, icfg.context_frames, icfg.context_stride, icfg.context_overlap
        )
        b, h, w, c = ref_latent.shape
        k_init, k_lock = jax.random.split(key)
        latents = jax.random.normal(k_init, (b, num_frames, h, w, c))
        indices = jnp.asarray(plan.indices)
        weights = jnp.asarray(plan.weights)
        ts = inference_timesteps(self.sched.num_train_timesteps, num_steps)
        ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
        feats_all, gn_all = self._precompute_banks(params, ref_latent, ts)

        def denoise_window(w_lat, tb, w_idx, rf, rg):
            a = None if audio is None else jnp.take(audio, w_idx, axis=1)
            s = None if speeds is None else jnp.take(speeds, w_idx, axis=1)
            cc = None
            if control_cond is not None:
                cc = jnp.take(control_cond, w_idx, axis=1) if control_cond.ndim == 5 else control_cond
            return self._model_out(params, w_lat, tb, ref_latent, a, s, face_mask, guidance_scale,
                                   control_cond=cc, context=context, uncond_context=uncond_context,
                                   identity_embed=identity_embed, ref_features=rf, ref_gn=rg)

        eta = self.config.diffusion.ddim_eta

        def body(lat, step):
            i, t, t_prev, idx, w8, k = step
            k_lock, k_eta = jax.random.split(k)
            tb = jnp.full((b,), t, jnp.int32)
            if lock_latents is not None and num_locked > 0:
                noised = add_noise(self.sched, lock_latents, jax.random.normal(k_lock, lock_latents.shape), tb)
                lat = jnp.concatenate([noised[:, :num_locked], lat[:, num_locked:]], axis=1)
            rf = None if feats_all is None else jax.tree.map(lambda x: x[i], feats_all)
            rg = None if gn_all is None else jax.tree.map(lambda x: x[i], gn_all)
            windows = lat[:, idx].transpose(1, 0, 2, 3, 4, 5)  # [W, B, c, h, w, C]
            windows = self._shard_windows(windows)
            preds = jax.vmap(lambda wl, wi: denoise_window(wl, tb, wi, rf, rg))(windows, idx)
            preds = self._shard_windows(preds)
            preds = preds * w8[:, None, None, None, None, None]
            wc = idx.shape[0] * idx.shape[1]
            flat_idx = idx.reshape(wc)
            flat = preds.transpose(1, 0, 2, 3, 4, 5).reshape(b, wc, h, w, c)
            nsum = jnp.zeros_like(lat).at[:, flat_idx].add(flat)
            counts = jnp.zeros((num_frames,), jnp.float32).at[flat_idx].add(jnp.repeat(w8, idx.shape[1]))
            out = nsum / jnp.maximum(counts, 1e-6)[None, :, None, None, None]
            lat = ddim_step(self.sched, out, lat, tb, jnp.full((b,), t_prev, jnp.int32),
                            eta=eta, key=k_eta if eta > 0 else None)
            return lat, None

        keys = jax.random.split(k_lock, num_steps)
        final, _ = jax.lax.scan(
            body, latents, (jnp.arange(num_steps), ts, ts_prev, indices, weights, keys)
        )
        return final

    # ---- public API ------------------------------------------------------
    def generate_latents(
        self,
        params: Params,
        ref_image: jax.Array,  # [B, H, W, 3] in [-1, 1]
        wav: jax.Array,  # [B, S]
        video_length: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        speeds: Optional[jax.Array] = None,
        face_mask: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        lock_latents: Optional[jax.Array] = None,
        num_locked: int = 0,
        control_cond: Optional[jax.Array] = None,  # [B, T, H, W, Cc] pose renders
        context: Optional[jax.Array] = None,  # [B, Lc, cross_dim] prompt embedding
        uncond_context: Optional[jax.Array] = None,  # empty-prompt embedding (CFG)
        identity_embed: Optional[jax.Array] = None,  # [B, proj] CLIP image embedding
    ) -> jax.Array:
        icfg = self.config.inference
        T = video_length or icfg.video_length
        steps = num_inference_steps or icfg.num_inference_steps
        g = icfg.guidance_scale if guidance_scale is None else guidance_scale
        key = key if key is not None else jax.random.PRNGKey(icfg.seed)
        ref_latent, audio = self._prepare(params, ref_image, wav, T)
        if face_mask is not None and self.model.config.model.use_face_mask:
            # the mask residual is per-clip static: encode ONCE here instead
            # of re-running the conv stack inside every denoise step
            face_mask = self.model.encode_face_mask(params, face_mask, ref_latent.shape[1])
        if T <= icfg.context_frames:
            return self._sample_short(
                params, key, ref_latent, audio, speeds, face_mask, T, steps, g, lock_latents,
                num_locked, control_cond, context, uncond_context, identity_embed,
            )
        return self._sample_windowed(
            params, key, ref_latent, audio, speeds, face_mask, T, steps, g, lock_latents,
            num_locked, control_cond, context, uncond_context, identity_embed,
        )

    def encode_prompt(
        self,
        params: Params,
        prompt: str,
        negative_prompt: str = "",
        tokenizer=None,
    ):
        """prompt strings -> (context, uncond_context) CLIP embeddings.

        The reference's _encode_prompt (reference
        magicanimate/pipelines/pipeline_animation.py:184-271): tokenize,
        encode, and encode the negative/empty prompt for the CFG uncond
        half. Requires clip.text_enabled."""
        if tokenizer is None:
            from emox.data.tokenizer import CLIPTokenizer

            tokenizer = self._default_tokenizer = getattr(self, "_default_tokenizer", None) or CLIPTokenizer()
        ml = min(self.config.clip.max_positions, 77)
        ids = jnp.asarray(tokenizer.encode([prompt], max_length=ml))
        uids = jnp.asarray(tokenizer.encode([negative_prompt], max_length=ml))
        vs = self.config.clip.vocab_size
        hi = int(max(jnp.max(ids), jnp.max(uids)))
        if hi >= vs:
            # nn.Embed gathers CLAMP out-of-range ids on XLA — a mismatched
            # tokenizer would silently map every token to the last row
            raise ValueError(
                f"tokenizer produced id {hi} but clip.vocab_size={vs}; the "
                f"tokenizer vocabulary does not match this model's text encoder"
            )
        enc = getattr(self, "_jit_encode_text", None)
        if enc is None:
            enc = self._jit_encode_text = jax.jit(self.model.encode_text)
        return enc(params, ids), enc(params, uids)

    def encode_identity(self, params: Params, ref_image: jax.Array) -> jax.Array:
        """Reference image [B, H, W, 3] in [-1, 1] -> CLIP identity embedding
        [B, proj] (reference EMOAnimationPipeline.py:867 image_enc). Resizes
        to the CLIP input size and renormalises on device.

        Raises when model.use_identity_embed is off: the UNet would silently
        drop the embedding (its injection gate checks the config), so
        computing one can only mislead the caller."""
        if not self.config.model.use_identity_embed:
            raise ValueError(
                "identity embedding requested but model.use_identity_embed is False — "
                "the UNet would ignore it; enable model.use_identity_embed (and "
                "clip.vision_enabled) in the config"
            )
        from emox.models.clip import clip_normalize

        fn = getattr(self, "_jit_encode_identity", None)
        if fn is None:
            size = self.config.clip.image_size

            def run(params, img):
                x01 = (img.astype(jnp.float32) + 1.0) * 0.5
                x01 = jax.image.resize(x01, (img.shape[0], size, size, 3), "bilinear")
                return self.model.encode_image_embedding(params, clip_normalize(x01))

            fn = self._jit_encode_identity = jax.jit(run)
        return fn(params, ref_image)

    def __call__(
        self,
        params: Params,
        ref_image: jax.Array,
        wav: jax.Array,
        video_length: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        speeds: Optional[jax.Array] = None,
        face_mask: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        interpolation_factor: Optional[int] = None,
        prompt: Optional[str] = None,
        negative_prompt: str = "",
        tokenizer=None,
        use_identity: bool = False,
        control_cond: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Returns video frames [B, T, H, W, 3] in [-1, 1].

        prompt: optional text prompt — tokenized + CLIP-encoded, cross-
        attended by the denoiser (requires clip.text_enabled and
        model.use_cross_attention; reference pipeline_animation.py:184-271).
        use_identity: CLIP-encode ref_image into an identity embedding
        (requires clip.vision_enabled + model.use_identity_embed; reference
        EMOAnimationPipeline.py:867).
        control_cond: [B, T, H, W, Cc] pose renders steering the trained
        ControlNet branch (requires model.use_controlnet; reference
        magicanimate controlnet conditioning path)."""
        context = uncond_context = None
        if prompt is not None:
            context, uncond_context = self.encode_prompt(params, prompt, negative_prompt, tokenizer)
        identity_embed = self.encode_identity(params, ref_image) if use_identity else None
        cache_key = ("call", video_length, num_inference_steps, guidance_scale,
                     speeds is not None, face_mask is not None, interpolation_factor,
                     context is not None, use_identity, control_cond is not None)
        if cache_key not in self._jitted:
            def run(params, ref_image, wav, speeds, face_mask, key, context, uncond_context,
                    identity_embed, control_cond):
                lat = self.generate_latents(
                    params, ref_image, wav, video_length, num_inference_steps,
                    guidance_scale, speeds, face_mask, key, control_cond=control_cond,
                    context=context, uncond_context=uncond_context, identity_embed=identity_embed,
                )
                f = interpolation_factor or self.config.inference.interpolation_factor
                if f > 1:
                    lat = interpolate_latents(lat, f, mode="slerp")
                return self.model.decode_latents(params, lat, chunk=self.config.inference.decode_chunk)

            self._jitted[cache_key] = jax.jit(run)
        key = key if key is not None else jax.random.PRNGKey(self.config.inference.seed)
        return self._jitted[cache_key](params, ref_image, wav, speeds, face_mask, key,
                                       context, uncond_context, identity_embed, control_cond)

    def invert(
        self,
        params: Params,
        video: jax.Array,  # [B, T, H, W, 3] in [-1, 1]
        ref_image: jax.Array,
        wav: jax.Array,
        num_inference_steps: Optional[int] = None,
    ) -> jax.Array:
        """DDIM inversion of real video frames into the model's noise space
        (reference EMOAnimationPipeline.py:416-477) — enables editing /
        motion transfer by re-sampling from inverted latents."""
        steps = num_inference_steps or self.config.inference.num_inference_steps
        T = video.shape[1]

        def run(params, video, ref_image, wav):
            latents = self.model.encode_images(params, video)
            ref_latent, audio = self._prepare(params, ref_image, wav, T)

            def denoise(lat, tb):
                return self.model.predict_noise(
                    params, lat, tb, ref_latent, audio_windows=audio, speeds=None, face_mask=None
                )

            return ddim_invert(denoise, latents, self.sched, steps)

        cache_key = ("invert", T, steps)
        if cache_key not in self._jitted:
            self._jitted[cache_key] = jax.jit(run)
        return self._jitted[cache_key](params, video, ref_image, wav)

    def generate_long(
        self,
        params: Params,
        ref_image: jax.Array,
        wav: jax.Array,
        total_frames: int,
        segment_length: int = 16,
        num_motion_frames: int = 2,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        key: Optional[jax.Array] = None,
        speeds: Optional[jax.Array] = None,  # [B, total_frames(, A)] per-frame velocities
        face_mask: Optional[jax.Array] = None,  # [B, H, W, 1] static face region
        prompt: Optional[str] = None,
        negative_prompt: str = "",
        tokenizer=None,
        use_identity: bool = False,
    ) -> jax.Array:
        """Autoregressive long-video generation: each segment locks its first
        num_motion_frames latent frames to the previous segment's tail (the
        reference's motion-frames conditioning, reference Net.py:44-72).

        Each distinct (seg_frames, wav_len, locked) shape compiles ONCE into
        the pipeline's jit cache — a long video runs at most 3 compiled
        programs (first segment, steady-state middle segments, final partial
        segment) instead of dispatching op-by-op per segment."""
        icfg = self.config.inference
        key = key if key is not None else jax.random.PRNGKey(icfg.seed)
        sr = self.config.audio.sample_rate
        fps = self.config.audio.video_fps
        steps = num_inference_steps or icfg.num_inference_steps
        g = icfg.guidance_scale if guidance_scale is None else guidance_scale
        context = uncond_context = None
        if prompt is not None:
            context, uncond_context = self.encode_prompt(params, prompt, negative_prompt, tokenizer)
        identity_embed = self.encode_identity(params, ref_image) if use_identity else None

        def seg_call(seg_frames, wav_seg, sub, lock, num_locked, seg_speeds):
            ck = ("long_seg", seg_frames, int(wav_seg.shape[1]), steps, g, lock is not None,
                  num_locked, seg_speeds is not None, context is not None,
                  identity_embed is not None, face_mask is not None)
            if ck not in self._jitted:
                def run(params, ref_image, wav_seg, k, lock, seg_speeds, context, uncond_context,
                        identity_embed, face_mask):
                    return self.generate_latents(
                        params, ref_image, wav_seg, video_length=seg_frames,
                        num_inference_steps=steps, guidance_scale=g, key=k,
                        speeds=seg_speeds, face_mask=face_mask,
                        lock_latents=lock, num_locked=num_locked,
                        context=context, uncond_context=uncond_context,
                        identity_embed=identity_embed,
                    )
                self._jitted[ck] = jax.jit(run)
            return self._jitted[ck](params, ref_image, wav_seg, sub, lock, seg_speeds,
                                    context, uncond_context, identity_embed, face_mask)

        segs = []
        produced = 0
        prev_tail = None
        while produced < total_frames:
            first = prev_tail is None
            new = min(segment_length - (0 if first else num_motion_frames), total_frames - produced)
            seg_frames = new + (0 if first else num_motion_frames)
            start_frame = produced - (0 if first else num_motion_frames)
            s0 = max(0, int(start_frame / fps * sr))
            s1 = int((start_frame + seg_frames) / fps * sr)
            wav_seg = jnp.zeros((wav.shape[0], s1 - s0)).at[:, : min(wav.shape[1], s1) - s0].set(
                wav[:, s0 : min(wav.shape[1], s1)]
            )
            key, sub = jax.random.split(key)
            lock = None
            if not first:
                pad = jnp.zeros((prev_tail.shape[0], seg_frames - num_motion_frames, *prev_tail.shape[2:]))
                lock = jnp.concatenate([prev_tail, pad], axis=1)
            seg_speeds = None
            if speeds is not None:
                pad_t = max(0, start_frame + seg_frames - speeds.shape[1])
                sp = speeds if pad_t == 0 else jnp.pad(
                    speeds, [(0, 0), (0, pad_t)] + [(0, 0)] * (speeds.ndim - 2))
                seg_speeds = jax.lax.dynamic_slice_in_dim(sp, max(0, start_frame), seg_frames, axis=1)
            lat = seg_call(seg_frames, wav_seg, sub, lock, 0 if first else num_motion_frames, seg_speeds)
            segs.append(lat if first else lat[:, num_motion_frames:])
            prev_tail = lat[:, -num_motion_frames:]
            produced += new
        latents = jnp.concatenate(segs, axis=1)[:, :total_frames]
        dk = ("long_decode", tuple(latents.shape))
        if dk not in self._jitted:
            self._jitted[dk] = jax.jit(
                lambda p, z: self.model.decode_latents(p, z, chunk=icfg.decode_chunk)
            )
        return self._jitted[dk](params, latents)
