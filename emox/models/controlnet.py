"""ControlNet-style conditioning encoder.

Capability-parity rework of the reference's vendored ControlNetModel
(reference magicanimate/models/controlnet.py:94-577): a copy of the
denoiser's down+mid path that consumes a pixel-space conditioning signal
(pose skeleton / landmark render / dense motion field), and emits one
zero-initialised additive residual per UNet skip connection plus one for
the mid block. Zero-init (reference controlnet.py:49-91 conditioning
embedding + zeroed residual convs) makes an untrained ControlNet a no-op.

TPU-native differences from the reference:
  * NHWC + frames folded into batch (same as emox.models.unet.UNet) so the
    conv stack hits the MXU without layout transposes;
  * residuals are explicit return values threaded into UNet.__call__ as
    `control` — no module-attribute plumbing;
  * `controlnet_params_from_unet` gives the weight-copy init the reference
    implements as ControlNetModel.from_unet (reference controlnet.py:267-330).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from emox.core.config import ModelConfig
from emox.nn.attention_blocks import SpatialTransformer
from emox.nn.blocks import Downsample, FusedGroupNorm, ResBlock, fold_time, unfold_time
from emox.nn.embeddings import TimestepEmbedder


class ControlSignals(NamedTuple):
    """Additive residuals for the denoiser (reference unet_controlnet.py
    forward's down_block_additional_residuals / mid_block_additional_residual).

    down: one [(B T), h_i, w_i, c_i] tensor per UNet skip connection,
          in skip order (conv_in first).
    mid:  [(B T), h_mid, w_mid, c_mid].
    """

    down: List[jax.Array]
    mid: jax.Array

    def scaled(self, scale: float) -> "ControlSignals":
        """conditioning_scale knob (reference pipeline_animation.py usage)."""
        return ControlSignals([d * scale for d in self.down], self.mid * scale)


class ConditioningEmbedding(nn.Module):
    """Pixel-space conditioning [B*, H, W, C_cond] -> latent-res features.

    Conv stack with stride-2 downsamples and a zero-init final conv
    (reference controlnet.py:49-91 ControlNetConditioningEmbedding).
    """

    out_channels: int
    num_downs: int = 3
    features: Tuple[int, ...] = (16, 32, 96)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jax.Array) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Conv(self.features[0], (3, 3), name="conv_in", **kw)(cond.astype(self.dtype))
        h = nn.silu(h)
        for i in range(self.num_downs):
            f_in = self.features[min(i, len(self.features) - 1)]
            f_out = self.features[min(i + 1, len(self.features) - 1)]
            h = nn.Conv(f_in, (3, 3), name=f"conv_{i}a", **kw)(h)
            h = nn.silu(h)
            h = nn.Conv(f_out, (3, 3), strides=(2, 2), name=f"conv_{i}b", **kw)(h)
            h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), kernel_init=nn.initializers.zeros, name="conv_out", **kw
        )(h)


class ControlNetEncoder(nn.Module):
    """Down+mid half of the UNet emitting zero-conv residuals.

    Topology mirrors emox.models.unet.UNet's down path exactly (same config,
    same naming for the shared trunk) so `controlnet_params_from_unet` can
    seed it from a trained denoiser, and so the emitted residual list aligns
    1:1 with the UNet's skip list.
    """

    cfg: ModelConfig
    spatial_depth: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _heads(self, ch: int):
        if self.cfg.attention_heads > 0:
            return self.cfg.attention_heads, ch // self.cfg.attention_heads
        heads = max(1, ch // self.cfg.attention_head_dim)
        return heads, self.cfg.attention_head_dim

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, h, w, C_in] or [B, h, w, C_in] noisy latents
        timesteps: jax.Array,  # [B]
        cond: jax.Array,  # [B, H, W, C_cond] or [B, T, H, W, C_cond] pixel space
        context: Optional[jax.Array] = None,
        conditioning_scale: float = 1.0,
    ) -> ControlSignals:
        cfg = self.cfg
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if x.ndim == 4:
            x = x[:, None]
        b, t = x.shape[:2]
        chans = list(cfg.block_channels)
        temb_dim = 4 * cfg.base_channels

        temb = TimestepEmbedder(temb_dim, cfg.base_channels, name="time_embed", **kw)(timesteps)
        if context is None and cfg.attention_levels:
            null = self.param(
                "null_context", nn.initializers.normal(0.02), (1, 1, cfg.cross_attention_dim), self.param_dtype
            )
            context = jnp.broadcast_to(null, (b, 1, cfg.cross_attention_dim)).astype(self.dtype)
        ctx_frames = None if context is None else jnp.repeat(context, t, axis=0)

        h, _ = fold_time(x.astype(self.dtype))
        h = nn.Conv(chans[0], (3, 3), name="conv_in", **kw)(h)

        # conditioning image -> latent res, added at conv_in (reference
        # controlnet.py forward: sample += controlnet_cond_embedding)
        if cond.ndim == 4:  # per-clip cond: broadcast over frames
            ce = ConditioningEmbedding(
                chans[0], num_downs=max(0, (cond.shape[1] // x.shape[2]).bit_length() - 1),
                name="cond_embed", **kw,
            )(cond)
            ce = jnp.repeat(ce, t, axis=0)
        else:  # per-frame cond [B, T, H, W, Cc]
            cf, _ = fold_time(cond)
            ce = ConditioningEmbedding(
                chans[0], num_downs=max(0, (cond.shape[2] // x.shape[2]).bit_length() - 1),
                name="cond_embed", **kw,
            )(cf)
        h = h + ce

        def zero_conv(v, i):
            return nn.Conv(
                v.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                name=f"zero_conv_{i}", **kw,
            )(v)

        residuals: List[jax.Array] = [zero_conv(h, 0)]
        zi = 1
        for level, ch in enumerate(chans):
            for i in range(cfg.layers_per_block):
                h, _ = fold_time(
                    ResBlock(ch, groups=cfg.norm_groups, temb_mode=cfg.resnet_temb_mode, separable=cfg.separable_convs,
                             name=f"down_{level}_res_{i}", **kw)(unfold_time(h, t), temb)
                )
                if level in cfg.attention_levels:
                    heads, head_dim = self._heads(ch)
                    h, _ = SpatialTransformer(
                        heads, head_dim, depth=self.spatial_depth, groups=cfg.norm_groups,
                        name=f"down_{level}_{i}_attn", **kw,
                    )(h, context=ctx_frames)
                residuals.append(zero_conv(h, zi))
                zi += 1
            if level < len(chans) - 1:
                h, _ = fold_time(Downsample(ch, name=f"down_{level}_ds", **kw)(unfold_time(h, t)))
                residuals.append(zero_conv(h, zi))
                zi += 1

        h, _ = fold_time(
            ResBlock(chans[-1], groups=cfg.norm_groups, temb_mode=cfg.resnet_temb_mode, separable=cfg.separable_convs,
                     name="mid_res_0", **kw)(unfold_time(h, t), temb)
        )
        heads, head_dim = self._heads(chans[-1])
        h, _ = SpatialTransformer(
            heads, head_dim, depth=self.spatial_depth, groups=cfg.norm_groups, name="mid_attn", **kw
        )(h, context=ctx_frames)
        h, _ = fold_time(
            ResBlock(chans[-1], groups=cfg.norm_groups, temb_mode=cfg.resnet_temb_mode, separable=cfg.separable_convs,
                     name="mid_res_1", **kw)(unfold_time(h, t), temb)
        )
        mid = zero_conv(h, zi)
        sig = ControlSignals(down=residuals, mid=mid)
        return sig if conditioning_scale == 1.0 else sig.scaled(conditioning_scale)


def controlnet_params_from_unet(unet_params: Dict[str, Any], controlnet_params: Dict[str, Any]) -> Dict[str, Any]:
    """Seed a ControlNetEncoder param tree from a trained denoiser's shared
    trunk (reference ControlNetModel.from_unet weight copy,
    controlnet.py:267-330). Zero convs + cond embedding keep their init.
    """
    out = dict(controlnet_params)
    for key, val in unet_params.items():
        if key in out and _tree_shapes_match(out[key], val):
            out[key] = val
    return out


def _tree_shapes_match(a: Any, b: Any) -> bool:
    try:
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        return len(la) == len(lb) and all(x.shape == y.shape for x, y in zip(la, lb))
    except Exception:
        return False
