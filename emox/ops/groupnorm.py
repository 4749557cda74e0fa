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
    # Two separate reduces, deliberately: a single VARIADIC lax.reduce
    # computing (sum, sumsq) in one pass looks like it should halve the
    # 8.8 ms convert_reduce stat bucket, but measured on v5e it lowers off
    # XLA's optimized reduce path and LOSES 18% end-to-end (flagship 256^2:
    # 50.7 vs 41.8 ms/step, round-3 A/B). XLA's two convert_reduce fusions
    # are the fastest known formulation at these shapes.
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


def _gn_stats_kernel(x_ref, s_ref, ss_ref, acc_s, acc_ss):
    """Per-channel sum and sum-of-squares for one (sample, L-block) cell.

    The L dimension is the fastest grid axis; accumulators live in VMEM
    scratch across L blocks. Built to attack the convert_reduce stat
    fusions (8.8 ms of the flagship 256^2 denoise step); measured on v5e
    it ties XLA's reduce per-op (~0.31 ms on a 40 MB [16,4096,320] slab)
    and loses ~5% end-to-end from fusion breaks — kept opt-in
    (EMOX_GROUPNORM_IMPL=fast), see _default_impl.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)
        acc_ss[:] = jnp.zeros_like(acc_ss)

    x = x_ref[0].astype(jnp.float32)  # (l_blk, C)
    acc_s[:] = acc_s[:] + jnp.sum(x, axis=0, keepdims=True)
    acc_ss[:] = acc_ss[:] + jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        s_ref[0, 0] = acc_s[0]
        ss_ref[0, 0] = acc_ss[0]


def _gn_stats_pallas(x: jax.Array, interpret: bool = False):
    """x [N, L, C] -> (sum, sumsq) per channel, both [N, C] fp32."""
    n, l, c = x.shape
    l_blk = min(l, max(8, (2 * 1024 * 1024 // 4) // max(c, 1) // 8 * 8))
    l_pad = ((l + l_blk - 1) // l_blk) * l_blk
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))  # zeros: no effect on sums
    mem = dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {}
    scratch = (
        [pltpu.VMEM((1, c), jnp.float32), pltpu.VMEM((1, c), jnp.float32)]
        if _HAS_PLTPU
        else []
    )
    s, ss = pl.pallas_call(
        _gn_stats_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        grid=(n, l_pad // l_blk),
        in_specs=[pl.BlockSpec((1, l_blk, c), lambda i, j: (i, j, 0), **mem)],
        out_specs=(
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), **mem),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), **mem),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x)
    return s[:, 0], ss[:, 0]


def group_norm_fast(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, groups: int, eps: float = 1e-5,
    silu: bool = False, interpret: bool = False,
) -> jax.Array:
    """Pallas statistics + XLA apply: the stat pass runs as one coalesced
    bf16 read (kernel above), while the normalise stays a plain
    `x * a + b` elementwise op so XLA can keep fusing it into the consumer
    conv's prologue (which is why the all-in-one pallas GN LOST to XLA by
    4% in round 1 — it broke that fusion and paid an extra HBM round trip).

    Gradient: custom_vjp recomputes through the XLA reference (stats are
    cheap relative to the surrounding matmuls in the backward)."""
    *lead, l, c = x.shape
    cg = c // groups
    xr = x.reshape(-1, l, c)
    s, ss = _gn_stats_pallas(xr, interpret=interpret)  # [N, C] f32
    n_lead = xr.shape[0]
    sg = jnp.sum(s.reshape(n_lead, groups, cg), axis=-1)  # [N, G]
    ssg = jnp.sum(ss.reshape(n_lead, groups, cg), axis=-1)
    cnt = l * cg
    mean_g = sg / cnt
    var_g = ssg / cnt - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    gamma_g = gamma.astype(jnp.float32).reshape(1, groups, cg)
    beta_g = beta.astype(jnp.float32).reshape(1, groups, cg)
    a = (gamma_g * inv_g[..., None]).reshape(n_lead, 1, c)
    b = (beta_g - (mean_g * inv_g)[..., None] * gamma_g).reshape(n_lead, 1, c)
    y = xr * a.astype(x.dtype) + b.astype(x.dtype)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(*lead, l, c).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_fast(x, gamma, beta, groups, eps, silu, interpret):
    return group_norm_fast(x, gamma, beta, groups, eps, silu, interpret)


def _gn_fast_fwd(x, gamma, beta, groups, eps, silu, interpret):
    return group_norm_fast(x, gamma, beta, groups, eps, silu, interpret), (x, gamma, beta)


def _gn_fast_bwd(groups, eps, silu, interpret, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(lambda x_, g_, b_: group_norm_xla(x_, g_, b_, groups, eps, silu), x, gamma, beta)
    return vjp(g)


_gn_fast.defvjp(_gn_fast_fwd, _gn_fast_bwd)


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
    # Default to XLA everywhere — both Pallas alternatives were benchmarked
    # on v5e (flagship 256^2 denoise step) and LOST:
    #   - all-in-one pallas GN ("pallas"): -4% end-to-end (84.4 vs 87.6
    #     ms/step, round 1) — it breaks XLA's fusion of the normalise into
    #     the consumer conv's prologue and pays an extra HBM round trip.
    #   - hybrid stats-kernel + XLA apply ("fast"): -5% end-to-end (46.8 vs
    #     49.2 ms/step, round 2) — isolated stat-pass timing shows the
    #     Pallas reduction is no faster than XLA's convert_reduce fusion at
    #     these shapes (~0.31 ms for a 40 MB [16,4096,320] slab either
    #     way); the pallas_call boundary only adds fusion breaks.
    # Both stay available via EMOX_GROUPNORM_IMPL=pallas|fast for re-tuning
    # on other TPU generations.
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
    if impl in ("fast", "fast_interpret") and _HAS_PLTPU:
        return _gn_fast(x, gamma, beta, groups, eps, silu, impl == "fast_interpret")
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
