"""The UNet: one module, two roles.

Role 1 (ReferenceNet / "writer"): run on the reference-image latent with
`emit_ref=True`; every spatial transformer site returns its pre-attention
LayerNormed tokens. This replaces the reference's AppearanceEncoder + bank
monkey-patching (reference magicanimate/models/appearance_encoder.py,
mutual_self_attention.py:229-236) with an explicit feature pytree.

Role 2 (denoiser / "reader"): run on noisy video latents with
`ref_features=` from role 1 — each site concatenates the writer tokens into
its self-attention K/V (reference mutual_self_attention.py:237-241) — plus
the conditioning the reference declared but never wired into the UNet
(reference EMOAnimationPipeline.py:777-786 vs unet_controlnet.py:328-339):

  * audio cross-attention after each spatial transformer,
  * speed-bucket embedding added to the (per-frame) time embedding,
  * face-region mask conv-encoded and added after conv_in,
  * AnimateDiff-style temporal attention at every attention site + mid.

Topology mirrors the SD-1.5 UNet family the reference inflates (reference
magicanimate/models/unet_controlnet.py:54-160, unet_3d_blocks.py:30-750):
conv_in -> down levels (ResBlock -> attn stack, downsample between levels)
-> mid -> up levels with skip concats -> GN+SiLU -> conv_out. NHWC,
frames folded into batch for all spatial ops.
"""

from __future__ import annotations

import os
from typing import Any, List, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from emox.core.config import ModelConfig
from emox.nn.attention_blocks import AudioCrossAttention, SpatialTransformer, TemporalTransformer
from emox.nn.blocks import Downsample, FusedGroupNorm, ResBlock, Upsample, fold_time, unfold_time
from emox.nn.conditioners import FaceMaskEncoder, SpeedEncoder
from emox.nn.embeddings import TimestepEmbedder


class UNetOutputs(NamedTuple):
    sample: jax.Array
    ref_features: Optional[List[List[jax.Array]]]  # per attention site, per depth block
    # per attention site [B, 1, 1, C, 2] fp32 (spatial mean, var) of the
    # writer's activations — AdaIN statistic banks (cfg.use_gn_ref,
    # reference mutual_self_attention.py:319-530)
    ref_gn: Optional[List[jax.Array]] = None


def _adain(h: jax.Array, stats: jax.Array, t: int, style_fidelity: float, drop: Optional[jax.Array]) -> jax.Array:
    """Renormalise h [(B T), H, W, C] to the writer's spatial statistics
    (reference mutual_self_attention.py hacked_*_forward read mode: x_uc is
    the AdaIN'd activation, the uncond half keeps style_fidelity of its own
    statistics). drop: [(B T)] bool, True = uncond/no-reference sample."""
    x = h.astype(jnp.float32)
    m = jnp.mean(x, axis=(1, 2), keepdims=True)
    v = jnp.mean(jnp.square(x), axis=(1, 2), keepdims=True) - jnp.square(m)
    std = jnp.sqrt(jnp.maximum(v, 1e-6))
    mr = jnp.repeat(stats[..., 0], t, axis=0)
    sr = jnp.sqrt(jnp.maximum(jnp.repeat(stats[..., 1], t, axis=0), 1e-6))
    x_uc = (x - m) / std * sr + mr
    if drop is None:
        out = x_uc  # every sample conditioned: sf*x_uc + (1-sf)*x_uc = x_uc
    else:
        d = drop.reshape(-1, 1, 1, 1).astype(jnp.float32)
        x_c = x * d + x_uc * (1.0 - d)  # uncond keeps its own stats in the x_c term
        out = style_fidelity * x_c + (1.0 - style_fidelity) * x_uc
    return out.astype(h.dtype)


class UNet(nn.Module):
    cfg: ModelConfig
    spatial_depth: int = 1
    # jax.sharding.Mesh; when its `context` axis is >1 temporal attention
    # runs as ring attention over it (frames stay sharded, K/V rotate on
    # ICI — see emox/ops/ring.py). Training/short-clip programs only.
    mesh: Optional[Any] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _heads(self, ch: int):
        """(heads, head_dim): fixed head count (SD convention) when
        cfg.attention_heads > 0, else fixed TPU-friendly head dim."""
        if self.cfg.attention_heads > 0:
            return self.cfg.attention_heads, ch // self.cfg.attention_heads
        heads = max(1, ch // self.cfg.attention_head_dim)
        return heads, self.cfg.attention_head_dim

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, h, w, C_in] or [B, h, w, C_in]
        timesteps: jax.Array,  # [B]
        context: Optional[jax.Array] = None,  # [B, Lc, cross_dim]
        ref_features: Optional[List[List[jax.Array]]] = None,
        audio: Optional[jax.Array] = None,  # [B, T, A, audio_dim]
        speeds: Optional[jax.Array] = None,  # [B] or [B, T]
        face_mask: Optional[jax.Array] = None,  # [B, H, W, 1] pixel space
        face_feat: Optional[jax.Array] = None,  # [B, h, w, C0] PRE-ENCODED mask residual
        control: Optional[Any] = None,  # ControlSignals (models/controlnet.py)
        ref_gn: Optional[List[jax.Array]] = None,  # per site [B,1,1,C,2] writer stats
        identity_embed: Optional[jax.Array] = None,  # [B, proj] CLIP image embedding
        emit_ref: bool = False,
        ref_dropout: Optional[jax.Array] = None,  # [B] bool, True = this sample sees no ref
    ) -> UNetOutputs:
        cfg = self.cfg
        if not cfg.use_reference:
            # hard-disable reference conditioning (parity knob for ablations
            # and pure-2D import tests)
            ref_features = None
            ref_gn = None
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # rematerialisation: recompute attention-stack activations in the
        # backward pass instead of storing them (reference enabled torch
        # gradient checkpointing the same way, unet_controlnet.py:324-326,
        # unet_3d_blocks.py:388-406)
        if cfg.remat:
            ST = nn.remat(SpatialTransformer)
            TT = nn.remat(TemporalTransformer)
            AC = nn.remat(AudioCrossAttention)
        else:
            ST, TT, AC = SpatialTransformer, TemporalTransformer, AudioCrossAttention
        # cfg.flash_attention=False pins every attention in this UNet to the
        # plain XLA path; True keeps the measured auto dispatch (None). The
        # documented process-wide override EMOX_ATTENTION_IMPL beats both
        # (a kernel sweep/debug run must win over a frozen config).
        impl = None if (cfg.flash_attention or os.environ.get("EMOX_ATTENTION_IMPL")) else "xla"

        squeeze = x.ndim == 4
        if squeeze:
            x = x[:, None]
        b, t, _, _, _ = x.shape
        chans = list(cfg.block_channels)
        temb_dim = 4 * cfg.base_channels

        # ---- embeddings -------------------------------------------------
        temb = TimestepEmbedder(temb_dim, cfg.base_channels, name="time_embed", **kw)(timesteps)
        if cfg.use_identity_embed and identity_embed is not None:
            # zero-init, bias-free projection: a zero embedding (CFG uncond,
            # missing identity) contributes exactly nothing, and a freshly
            # added identity branch starts as the identity function
            temb = temb + nn.Dense(
                temb_dim, use_bias=False, kernel_init=nn.initializers.zeros,
                name="identity_embed_proj", **kw
            )(identity_embed.astype(self.dtype))
        if cfg.use_speed and speeds is not None:
            # speeds: [B] / [B, T] scalar ||d pose||, or [B, T, A] per-axis
            # signed velocities (reference Net.py:248-258 buckets each axis)
            if speeds.ndim == 1:
                speeds = jnp.broadcast_to(speeds[:, None], (b, t))
            axes = speeds.shape[2] if speeds.ndim == 3 else 1
            spe = SpeedEncoder(
                temb_dim, cfg.num_speed_buckets, cfg.speed_bucket_radius, name="speed_embed", **kw
            )(speeds.reshape(b * t, axes))
            temb = jnp.repeat(temb, t, axis=0) + spe  # [(B T), D] per-frame
        if cfg.attention_levels and cfg.use_cross_attention:
            # created unconditionally so the param tree does not depend on
            # whether a prompt context was passed at init time
            null = self.param("null_context", nn.initializers.normal(0.02), (1, 1, cfg.cross_attention_dim), self.param_dtype)
            if context is None:
                context = jnp.broadcast_to(null, (b, 1, cfg.cross_attention_dim)).astype(self.dtype)
        # context stays [B, Lc, C]: K/V projection happens once per site
        # inside Attention and the projected tokens repeat across frames
        ctx_frames = context

        # ---- conv_in + face mask residual -------------------------------
        h, _ = fold_time(x.astype(self.dtype))
        h = nn.Conv(chans[0], (3, 3), name="conv_in", **kw)(h)
        if cfg.use_face_mask and (face_mask is not None or face_feat is not None):
            # the mask residual depends only on the (per-clip static) mask —
            # samplers pre-encode it once (face_feat) instead of re-running
            # the conv stack every denoise step; both paths are exactly the
            # same math (EMOModel.encode_face_mask applies this submodule)
            mf = face_feat
            if mf is None:
                ds = face_mask.shape[1] // x.shape[2]
                num_downs = max(0, ds.bit_length() - 1)
                mf = FaceMaskEncoder(chans[0], num_downs=num_downs, name="face_mask_encoder", **kw)(face_mask)
            h = h + jnp.repeat(mf.astype(self.dtype), t, axis=0)

        banks: List[List[jax.Array]] = []
        gn_banks: List[jax.Array] = []
        site = 0

        drop_frames = None if ref_dropout is None else jnp.repeat(ref_dropout, t, axis=0)

        def attn_stack(h, level_ch, name):
            """spatial (+ref) -> audio cross -> temporal, at one site."""
            nonlocal site, banks
            heads, head_dim = self._heads(level_ch)
            rkv = None
            if ref_features is not None and not emit_ref:
                # UNREPEATED [B, Lr, C] tokens: K/V projection happens once
                # per site inside Attention, then repeats across frames
                # (project-then-broadcast == broadcast-then-project, saving
                # (t-1)/t of the ref K/V matmul FLOPs)
                rkv = list(ref_features[site])
            h, bank = ST(
                heads, head_dim, depth=self.spatial_depth,
                groups=cfg.norm_groups, sparse_causal=cfg.use_sparse_causal,
                use_cross=cfg.use_cross_attention, impl=impl,
                num_frames=1 if emit_ref else t, name=f"{name}_attn", **kw,
            )(h, context=ctx_frames, ref_kv=rkv, ref_drop=None if rkv is None else drop_frames)
            if emit_ref:
                banks.append(bank)
                if cfg.use_gn_ref:
                    hf = h.astype(jnp.float32)
                    m = jnp.mean(hf, axis=(1, 2), keepdims=True)
                    v = jnp.mean(jnp.square(hf), axis=(1, 2), keepdims=True) - jnp.square(m)
                    gn_banks.append(jnp.stack([m, v], axis=-1))
            elif cfg.use_gn_ref and ref_gn is not None:
                h = _adain(h, ref_gn[site], t, cfg.style_fidelity, drop_frames)
            site += 1
            hv = unfold_time(h, t)
            if cfg.use_audio and audio is not None:
                hv = AC(
                    heads, head_dim, groups=cfg.norm_groups, impl=impl, name=f"{name}_audio", **kw
                )(hv, audio)
            if cfg.use_temporal and t > 1:
                hv = TT(
                    heads, head_dim, max_len=cfg.temporal_pos_max_len,
                    ring_mesh=self.mesh, name=f"{name}_temporal", **kw
                )(hv)
            h, _ = fold_time(hv)
            return h

        # ---- down path ---------------------------------------------------
        skips = [h]
        for level, ch in enumerate(chans):
            for i in range(cfg.layers_per_block):
                h, _ = fold_time(ResBlock(ch, groups=cfg.norm_groups, temb_mode=cfg.resnet_temb_mode, separable=cfg.separable_convs, name=f"down_{level}_res_{i}", **kw)(unfold_time(h, t), temb))
                if level in cfg.attention_levels:
                    h = attn_stack(h, ch, f"down_{level}_{i}")
                skips.append(h)
            if level < len(chans) - 1:
                h, _ = fold_time(Downsample(ch, name=f"down_{level}_ds", **kw)(unfold_time(h, t)))
                skips.append(h)

        # ---- controlnet residual injection (reference unet_controlnet.py
        # forward: down_block_additional_residuals added to the skips,
        # mid_block_additional_residual after the mid block) ----------------
        if control is not None:
            skips = [s + r for s, r in zip(skips, control.down)]

        # ---- mid ---------------------------------------------------------
        h, _ = fold_time(ResBlock(chans[-1], groups=cfg.norm_groups, temb_mode=cfg.resnet_temb_mode, separable=cfg.separable_convs, name="mid_res_0", **kw)(unfold_time(h, t), temb))
        h = attn_stack(h, chans[-1], "mid")
        h, _ = fold_time(ResBlock(chans[-1], groups=cfg.norm_groups, temb_mode=cfg.resnet_temb_mode, separable=cfg.separable_convs, name="mid_res_1", **kw)(unfold_time(h, t), temb))
        if control is not None:
            h = h + control.mid

        # ---- up path -----------------------------------------------------
        for level, ch in reversed(list(enumerate(chans))):
            for i in range(cfg.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h, _ = fold_time(ResBlock(ch, groups=cfg.norm_groups, temb_mode=cfg.resnet_temb_mode, separable=cfg.separable_convs, name=f"up_{level}_res_{i}", **kw)(unfold_time(h, t), temb))
                if level in cfg.attention_levels:
                    h = attn_stack(h, ch, f"up_{level}_{i}")
            if level > 0:
                h, _ = fold_time(Upsample(ch, name=f"up_{level}_us", **kw)(unfold_time(h, t)))

        # ---- out ---------------------------------------------------------
        h = FusedGroupNorm(cfg.norm_groups, silu=True, param_dtype=self.param_dtype, name="norm_out")(h)
        h = nn.Conv(cfg.out_channels, (3, 3), name="conv_out", **kw)(h)
        out = unfold_time(h, t)
        if squeeze:
            out = out[:, 0]
        return UNetOutputs(
            sample=out,
            ref_features=banks if emit_ref else None,
            ref_gn=gn_banks if (emit_ref and cfg.use_gn_ref) else None,
        )


def reference_net_config(cfg: ModelConfig) -> ModelConfig:
    """Derive the 2D ReferenceNet config from the denoiser config: same
    topology (so attention sites align 1:1), no video-only conditioning."""
    import dataclasses

    return dataclasses.replace(cfg, use_temporal=False, use_audio=False, use_speed=False, use_face_mask=False)
