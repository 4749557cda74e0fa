"""Conv/resnet building blocks, NHWC pseudo-3D.

TPU-native rework of the reference's pseudo-3D primitives
(reference magicanimate/models/resnet.py: InflatedConv3d folds frames into
the batch then runs a 2D conv; ResnetBlock3D applies time-emb scale-shift).
Here video tensors are [B, T, H, W, C] and spatial convs run over the folded
[(B T), H, W, C] — NHWC, which XLA maps directly onto the MXU's native conv
layout (no transposes).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from emox.ops.groupnorm import group_norm


def fold_time(x: jax.Array):
    """[B, T, H, W, C] -> [(B T), H, W, C]; returns (folded, T). 4D passes through."""
    if x.ndim == 4:
        return x, 1
    b, t, h, w, c = x.shape
    return x.reshape(b * t, h, w, c), t


def unfold_time(x: jax.Array, t: int) -> jax.Array:
    """[(B T), H, W, C] -> [B, T, H, W, C] (always 5D, even for t=1)."""
    bt, h, w, c = x.shape
    return x.reshape(bt // t, t, h, w, c)


class FusedGroupNorm(nn.Module):
    """GroupNorm(+SiLU) over NHWC feature maps via emox.ops.group_norm
    (XLA-fused x*a+b formulation by default — measured faster than the
    standalone Pallas kernel on v5e; EMOX_GROUPNORM_IMPL overrides)."""

    groups: int = 32
    eps: float = 1e-5
    silu: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        shape = x.shape
        xl = x.reshape(-1, shape[-3] * shape[-2], c) if x.ndim >= 3 else x
        out = group_norm(xl, scale, bias, self.groups, self.eps, silu=self.silu)
        return out.reshape(shape)


class ResBlock(nn.Module):
    """GN+SiLU -> conv3x3 -> (+time scale-shift) -> GN+SiLU -> conv3x3 + skip.

    Equivalent capability to reference ResnetBlock3D
    (reference magicanimate/models/resnet.py:113-207) with
    time_embedding_norm="scale_shift" semantics.

    separable=True swaps each 3x3 for depthwise-3x3 + pointwise-1x1 (the
    working version of the reference's abandoned depthwise experiment,
    reference depthwise.py:6-101 — dead code with a syntax error there;
    ~8x fewer conv FLOPs at some quality cost).
    """

    out_channels: int
    groups: int = 32
    temb_mode: str = "scale_shift"  # or "add" (SD-1.5 convention)
    separable: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _conv3x3(self, ch: int, name: str):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if not self.separable:
            return nn.Conv(ch, (3, 3), name=name, **kw)

        def sep(h):
            h = nn.Conv(
                h.shape[-1], (3, 3), feature_group_count=h.shape[-1], name=f"{name}_dw", **kw
            )(h)
            return nn.Conv(ch, (1, 1), name=f"{name}_pw", **kw)(h)

        return sep

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        was_4d = x.ndim == 4
        xf, t = fold_time(x)
        h = FusedGroupNorm(self.groups, silu=True, param_dtype=self.param_dtype, name="norm1")(xf)
        h = self._conv3x3(self.out_channels, "conv1")(h)
        if temb is not None:
            # temb [B, D] (repeated over frames) or [(B T), D] (per-frame,
            # e.g. with per-frame speed embeddings added)
            n_out = 2 * self.out_channels if self.temb_mode == "scale_shift" else self.out_channels
            ss = nn.Dense(n_out, dtype=self.dtype, param_dtype=self.param_dtype, name="time_proj")(
                nn.silu(temb)
            )
            if ss.shape[0] != h.shape[0]:
                ss = jnp.repeat(ss, t, axis=0)
            ss = ss[:, None, None, :]
            if self.temb_mode == "scale_shift":
                scale, shift = jnp.split(ss, 2, axis=-1)
                h = FusedGroupNorm(self.groups, param_dtype=self.param_dtype, name="norm2")(h)
                h = h * (1.0 + scale) + shift
                h = nn.silu(h)
            else:
                h = h + ss
                h = FusedGroupNorm(self.groups, silu=True, param_dtype=self.param_dtype, name="norm2")(h)
        else:
            h = FusedGroupNorm(self.groups, silu=True, param_dtype=self.param_dtype, name="norm2")(h)
        h = self._conv3x3(self.out_channels, "conv2")(h)
        if xf.shape[-1] != self.out_channels:
            xf = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name="skip")(xf)
        out = xf + h
        return out if was_4d else unfold_time(out, t)


class Downsample(nn.Module):
    """Strided 3x3 conv (reference resnet.py Downsample3D).

    padding: ((1,1),(1,1)) is the SD-UNet convention; "SAME" gives the
    asymmetric (0,1) pad of the SD-VAE encoder downsamplers."""

    out_channels: int
    padding: object = ((1, 1), (1, 1))
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        was_4d = x.ndim == 4
        xf, t = fold_time(x)
        h = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=self.padding,
                    dtype=self.dtype, param_dtype=self.param_dtype)(xf)
        return h if was_4d else unfold_time(h, t)


class Upsample(nn.Module):
    """Nearest 2x upsample + 3x3 conv (reference resnet.py Upsample3D)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        was_4d = x.ndim == 4
        xf, t = fold_time(x)
        n, h, w, c = xf.shape
        up = jax.image.resize(xf, (n, h * 2, w * 2, c), method="nearest")
        out = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, param_dtype=self.param_dtype)(up)
        return out if was_4d else unfold_time(out, t)
