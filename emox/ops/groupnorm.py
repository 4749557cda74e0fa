"""Fused GroupNorm(+SiLU) Pallas kernel.

GroupNorm -> SiLU is the prologue of every ResBlock in both the VAE and the
UNet (the reference runs torch GroupNorm + SiLU as separate CUDA launches,
reference magicanimate/models/resnet.py:113-207). The fused kernel reads the
feature map from HBM once, computes per-group statistics in-VMEM, and writes
the normalised (optionally SiLU-activated) result — one HBM round-trip.

Layout: x [N, L, C] where N = batch*frames, L = H*W, C = channels (NHWC
flattened — TPU-native). Group statistics are computed with 0/1 aggregation
matmuls so the reduction runs on the MXU and never needs cross-lane
reshapes. Falls back to plain jnp when the per-sample slab exceeds the VMEM
budget or when not on TPU.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# per-sample VMEM budget for the single-pass kernel (fp32 working set)
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def group_norm_xla(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, groups: int, eps: float = 1e-5, silu: bool = False
) -> jax.Array:
    """x [..., L, C] normalised over (L, C//groups) per group.

    Statistics accumulate in fp32 (reduction precision), but the map is
    applied as one `x * a + b` in x's own dtype with per-channel fp32-folded
    coefficients — no fp32 copy of the full feature map ever materialises.
    (Profiled on v5e: the cast-everything-to-f32 version showed up as
    f32[16,32,32,320] fusion outputs dominating the denoiser's elementwise
    time.)
    """
    *lead, l, c = x.shape
    cg = c // groups
    xg = x.reshape(*lead, l, groups, cg)
    mean = jnp.mean(xg.astype(jnp.float32), axis=(-3, -1), keepdims=True)  # [..., 1, G, 1]
    var = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(-3, -1), keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    # fold (mean, inv, gamma, beta) into per-channel a, b (fp32 math on
    # [C]-sized vectors only)
    gamma_g = gamma.astype(jnp.float32).reshape(*([1] * len(lead)), 1, groups, cg)
    beta_g = beta.astype(jnp.float32).reshape(*([1] * len(lead)), 1, groups, cg)
    a = (gamma_g * inv).reshape(*lead, 1, c) if lead else (gamma_g * inv).reshape(1, c)
    b = (beta_g - mean * gamma_g * inv).reshape(*lead, 1, c) if lead else (beta_g - mean * gamma_g * inv).reshape(1, c)
    xn = x * a.astype(x.dtype) + b.astype(x.dtype)
    if silu:
        xn = xn * jax.nn.sigmoid(xn)
    return xn.astype(x.dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, agg_ref, o_ref, *, groups: int, eps: float, silu: bool, l_real: int):
    x = x_ref[0].astype(jnp.float32)  # (L, C)
    l, c = x.shape
    agg = agg_ref[...]  # (C, G) 0/1 channel->group aggregation
    s = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    ss = jnp.sum(x * x, axis=0, keepdims=True)
    sg = jnp.dot(s, agg, preferred_element_type=jnp.float32)  # (1, G)
    ssg = jnp.dot(ss, agg, preferred_element_type=jnp.float32)
    n = l_real * (c // groups)
    mean_g = sg / n
    var_g = ssg / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # scatter group stats back to channels: (1, G) @ (G, C) with agg^T
    mean_c = jnp.dot(mean_g, agg.T, preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jnp.dot(inv_g, agg.T, preferred_element_type=jnp.float32)
    gamma = gamma_ref[...].astype(jnp.float32)  # (1, C)
    beta = beta_ref[...].astype(jnp.float32)
    y = (x - mean_c) * inv_c * gamma + beta
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_pallas(x: jax.Array, gamma: jax.Array, beta: jax.Array, groups: int, eps: float, silu: bool, interpret: bool) -> jax.Array:
    n, l, c = x.shape
    cg = c // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    agg = (ch // cg == gr).astype(jnp.float32)
    mem = dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {}
    kernel = functools.partial(_gn_kernel, groups=groups, eps=eps, silu=silu, l_real=l)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), **mem),
            pl.BlockSpec((1, c), lambda i: (0, 0), **mem),
            pl.BlockSpec((1, c), lambda i: (0, 0), **mem),
            pl.BlockSpec((c, groups), lambda i: (0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), **mem),
        interpret=interpret,
    )(x, gamma.reshape(1, c), beta.reshape(1, c), agg)


def _default_impl() -> str:
    env = os.environ.get("EMOX_GROUPNORM_IMPL")
    if env:
        return env
    # Default to XLA everywhere: measured on v5e (flagship 256^2 bench),
    # XLA's own GN+SiLU fusion beats the single-pass Pallas kernel by ~4%
    # end-to-end (84.4 vs 87.6 ms/step) — XLA fuses the norm into the
    # surrounding conv prologue, which the standalone kernel can't.
    # The kernel stays available via EMOX_GROUPNORM_IMPL=pallas.
    return "xla"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_fused(x, gamma, beta, groups, eps, silu, interpret):
    return _gn_pallas(x, gamma, beta, groups, eps, silu, interpret)


def _gn_fused_fwd(x, gamma, beta, groups, eps, silu, interpret):
    return _gn_pallas(x, gamma, beta, groups, eps, silu, interpret), (x, gamma, beta)


def _gn_fused_bwd(groups, eps, silu, interpret, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(lambda x_, g_, b_: group_norm_xla(x_, g_, b_, groups, eps, silu), x, gamma, beta)
    return vjp(g)


_gn_fused.defvjp(_gn_fused_fwd, _gn_fused_bwd)


def group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    impl: Optional[str] = None,
) -> jax.Array:
    """Fused GroupNorm(+SiLU) on x [..., L, C]; gamma/beta [C]."""
    c = x.shape[-1]
    if c % groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    impl = impl or _default_impl()
    shape = x.shape
    if impl in ("pallas", "pallas_interpret"):
        l = shape[-2]
        # single-pass kernel needs the (L, C) slab resident in VMEM
        if l * c * 4 <= _VMEM_BUDGET_BYTES:
            xr = x.reshape(-1, l, c)
            out = _gn_fused(xr, gamma, beta, groups, eps, silu, impl == "pallas_interpret")
            return out.reshape(shape)
    return group_norm_xla(x, gamma, beta, groups, eps, silu)


def group_norm_silu(x, gamma, beta, groups: int = 32, eps: float = 1e-5, impl: Optional[str] = None):
    return group_norm(x, gamma, beta, groups, eps, silu=True, impl=impl)
