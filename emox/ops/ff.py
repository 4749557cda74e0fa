"""Fused GEGLU feed-forward as a Pallas TPU kernel.

The transformer FF (reference magicanimate/models/orig_attention.py GEGLU /
FeedForward: proj_in to 8C, split value/gate, value * gelu(gate), proj_out
to C) is HBM-bandwidth-bound on TPU: XLA runs it as dot -> fusion(gate) ->
dot, materialising the [M, 8C] projection and the [M, 4C] gated activation
in HBM between the two dots. At the flagship's level-0 sites (M = 16384
tokens, C = 320) that is ~250 MB of intermediate traffic per site against
only ~21 MB of input/output — the dots themselves are tiny (40 GFLOP).

This kernel keeps both weight matrices resident in VMEM (24*C^2 bytes —
2.5 MB at C = 320) and streams tokens through in row blocks: per block it
computes proj_in on the MXU with fp32 accumulation, applies the exact-erf
GEGLU gate on the VPU, and immediately consumes the gated activation with
the proj_out matmul — the 8C-wide intermediate never leaves VMEM. HBM
traffic drops to x + out + weights-once.

The weights-resident design only fits VMEM for C <= ~448 (the level-0
blocks); wider sites keep the XLA path, where the intermediate-to-I/O
traffic ratio is lower anyway (weights grow as C^2 against M shrinking 4x
per level). Backward: custom_vjp that recomputes through the plain XLA
formulation — FF FLOPs are small, and not storing the [M, 8C] projection
for the backward is the same memory win remat would buy.

Dispatch: `geglu_ff(..., impl=None)` resolves EMOX_FF_IMPL, else "xla"
(pending an on-chip end-to-end A/B — same measured-default protocol as
emox.ops.attention; microbenches through the axon tunnel are not trusted).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; absent on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _gelu_erf_kernel(x: jax.Array) -> jax.Array:
    """Exact-erf gelu for INSIDE Pallas kernels: Mosaic has no erf/erfc
    lowering (NotImplementedError on chip, observed on the r4 A/B), so erf
    is evaluated via Abramowitz & Stegun 7.1.26 — max abs error 1.5e-7 in
    fp32, two decades below the bf16 output granularity the kernels cast
    to. XLA paths (and the VJP recompute targets) keep jax.nn.gelu's true
    erf."""
    z = x * 0.7071067811865476  # x / sqrt(2)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = ((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736) * t + 0.254829592
    erf_abs = 1.0 - poly * t * jnp.exp(-az * az)
    erf = jnp.sign(z) * erf_abs
    return 0.5 * x * (1.0 + erf)


def geglu_ff_xla(
    x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array
) -> jax.Array:
    """Plain XLA GEGLU FF; also the recompute target for the kernel's VJP.

    Matches the nn.Dense formulation: operands are used in their given
    (compute) dtype, exact-erf gelu (torch F.gelu parity).
    """
    h = jnp.dot(x, w1) + b1
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(g, approximate=False)
    return jnp.dot(h, w2) + b2


def ln_geglu_ff_xla(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """y = x + GEGLU_FF(LayerNorm(x)) — the FF sub-block of every
    transformer block. fp32 statistics, normalized output cast back to the
    compute dtype (flax LayerNorm tolerance-parity); also the recompute
    target for the fused block kernel's VJP (the VJP must differentiate
    the math the kernel actually computes)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    return x + geglu_ff_xla(xn.astype(x.dtype), w1, b1, w2, b2)


def _ln_ff_kernel(
    x_ref, g_ref, bt_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, hidden: int, eps: float
):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    a, g = h[:, :hidden], h[:, hidden:]
    hg = (a * _gelu_erf_kernel(g)).astype(x.dtype)
    o = jnp.dot(hg, w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[:].astype(jnp.float32) + xf  # residual: x never re-read
    o_ref[:] = o.astype(o_ref.dtype)


def _ln_ff_wide_kernel(
    x_ref, g_ref, bt_ref, w1v_ref, w1g_ref, b1v_ref, b1g_ref, w2_ref, b2_ref,
    o_ref, xn_ref, acc_ref, *, eps: float,
):
    """Wide-C variant: the hidden dimension F is tiled over the innermost
    grid axis — W1/W2 column blocks stream through VMEM (double-buffered)
    while the normalized input and the fp32 output accumulator live in
    scratch across F steps. Weights are re-fetched once per ROW block, so
    this wins only when M/block_m is small relative to the intermediate
    traffic saved — the dispatch plan accounts for that."""
    j = pl.program_id(1)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
        xn_ref[:] = xn.astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xn = xn_ref[:]
    a = jnp.dot(xn, w1v_ref[:], preferred_element_type=jnp.float32) + b1v_ref[:].astype(jnp.float32)
    g = jnp.dot(xn, w1g_ref[:], preferred_element_type=jnp.float32) + b1g_ref[:].astype(jnp.float32)
    hg = (a * _gelu_erf_kernel(g)).astype(xn.dtype)
    acc_ref[:] += jnp.dot(hg, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == num_j - 1)
    def _():
        o = acc_ref[:] + b2_ref[:].astype(jnp.float32) + x_ref[:].astype(jnp.float32)
        o_ref[:] = o.astype(o_ref.dtype)


def _ln_ff_wide_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m, block_f, interpret):
    if not _HAS_PLTPU:  # pragma: no cover
        raise RuntimeError("pallas TPU memory spaces unavailable; use impl='xla'")
    orig_shape = x.shape
    c = x.shape[-1]
    two_f = w1.shape[-1]
    hidden = two_f // 2
    assert hidden % block_f == 0, (hidden, block_f)
    num_j = hidden // block_f
    xf, m, m_pad, bm = _flatten_pad(x, block_m)
    mem = dict(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ln_ff_wide_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x.dtype),
        grid=(m_pad // bm, num_j),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i, j: (i, 0), **mem),          # x
            pl.BlockSpec((1, c), lambda i, j: (0, 0), **mem),           # ln scale
            pl.BlockSpec((1, c), lambda i, j: (0, 0), **mem),           # ln bias
            pl.BlockSpec((c, block_f), lambda i, j: (0, j), **mem),     # w1 value cols
            pl.BlockSpec((c, block_f), lambda i, j, nj=num_j: (0, j + nj), **mem),  # w1 gate cols
            pl.BlockSpec((1, block_f), lambda i, j: (0, j), **mem),     # b1 value
            pl.BlockSpec((1, block_f), lambda i, j, nj=num_j: (0, j + nj), **mem),  # b1 gate
            pl.BlockSpec((block_f, c), lambda i, j: (j, 0), **mem),     # w2 rows
            pl.BlockSpec((1, c), lambda i, j: (0, 0), **mem),           # b2
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i, j: (i, 0), **mem),
        scratch_shapes=[
            pltpu.VMEM((bm, c), x.dtype),      # normalized input
            pltpu.VMEM((bm, c), jnp.float32),  # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * two_f + 2 * m * hidden * c + 10 * m * c,
            bytes_accessed=2 * (2 * m * c) + (m_pad // bm) * 2 * (c * two_f + hidden * c),
            transcendentals=m * hidden,
        ),
        interpret=interpret,
    )(
        xf,
        ln_scale.reshape(1, c),
        ln_bias.reshape(1, c),
        w1, w1,
        b1.reshape(1, two_f), b1.reshape(1, two_f),
        w2,
        b2.reshape(1, c),
    )
    return out[:m].reshape(orig_shape)


def _ln_ff_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m: int, interpret: bool):
    if not _HAS_PLTPU:  # pragma: no cover — exotic CPU-only builds
        raise RuntimeError("pallas TPU memory spaces unavailable; use impl='xla'")
    orig_shape = x.shape
    c = x.shape[-1]
    two_f = w1.shape[-1]
    hidden = two_f // 2
    xf, m, m_pad, bm = _flatten_pad(x, block_m)
    mem = dict(memory_space=pltpu.VMEM)
    const2 = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_ln_ff_kernel, hidden=hidden, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x.dtype),
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), **mem),
            pl.BlockSpec((1, c), const2, **mem),
            pl.BlockSpec((1, c), const2, **mem),
            pl.BlockSpec((c, two_f), const2, **mem),
            pl.BlockSpec((1, two_f), const2, **mem),
            pl.BlockSpec((hidden, c), const2, **mem),
            pl.BlockSpec((1, c), const2, **mem),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0), **mem),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * two_f + 2 * m * hidden * c + 10 * m * c,
            bytes_accessed=2 * (2 * m * c + c * two_f + hidden * c),
            transcendentals=m * hidden,
        ),
        interpret=interpret,
    )(
        xf,
        ln_scale.reshape(1, c),
        ln_bias.reshape(1, c),
        w1,
        b1.reshape(1, two_f),
        w2,
        b2.reshape(1, c),
    )
    return out[:m].reshape(orig_shape)


def _ln_ff_route(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m, block_f, interpret):
    if block_f > 0:
        return _ln_ff_wide_impl(
            x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m, block_f, interpret
        )
    return _ln_ff_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _ln_ff(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m, block_f, interpret):
    return _ln_ff_route(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m, block_f, interpret)


def _ln_ff_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m, block_f, interpret):
    out = _ln_ff_route(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m, block_f, interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _ln_ff_bwd(eps, block_m, block_f, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: ln_geglu_ff_xla(*a, eps=eps), *res)
    return vjp(g)


_ln_ff.defvjp(_ln_ff_fwd, _ln_ff_bwd)


def fused_ln_geglu_ff(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    eps: float = 1e-5,
    block_m: int = 256,
    block_f: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Pallas fused x + GEGLU_FF(LayerNorm(x)). One HBM read of x, one
    write of y — the LN round trip, the 2F-wide projection, the gated
    activation, and the residual add all stay in VMEM. block_f > 0 selects
    the wide-C variant (hidden dim tiled, weights streamed)."""
    return _ln_ff(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_m, block_f, interpret)


def ff_block_plan(m: int, c: int, mult: int, itemsize: int):
    """Dispatch plan for the fused FF sub-layer at [M, C] tokens.

    Returns (block_m, block_f) — block_f 0 = weights-resident narrow
    kernel — or None when the XLA path should keep the site. The wide
    variant re-fetches the full W1/W2 per ROW block, so it must clear a
    traffic test: weight re-reads < intermediate bytes the fusion saves
    (conservatively the gated [M, 4C] write+read the XLA path pays)."""
    two_f = 2 * mult * c
    # EMOX_FF_BLOCK_M: A/B override for the narrow kernel's row block (the
    # r4 profile has the narrow sites at ~56% MXU; a bigger row block
    # amortises the per-block LN/gate VPU work — VMEM-checked, falls back
    # to 256 when the fp32 [bm, 2F] projection would not fit)
    bm_env = int(os.environ.get("EMOX_FF_BLOCK_M", "0") or 0)
    if bm_env and m % bm_env == 0 and _fits_vmem(c, two_f, bm_env, itemsize):
        return bm_env, 0
    # Measured default (r5 on-chip end-to-end A/B, flagship preset, fresh
    # processes): bm=512 beats bm=256 — 25.89 vs 25.50 steps/s (38.63 vs
    # 39.22 ms/step). The bigger row block halves the per-block LN/gate VPU
    # serialisation the r4 profile flagged (~56% MXU at the narrow sites).
    # VMEM-gated: falls back to 256 where the fp32 [bm, 2F] block won't fit.
    if m % 512 == 0 and _fits_vmem(c, two_f, 512, itemsize):
        return 512, 0
    if _fits_vmem(c, two_f, 256, itemsize):
        return 256, 0
    hidden = mult * c
    block_f = 512 if hidden % 512 == 0 else (256 if hidden % 256 == 0 else 0)
    if block_f == 0:
        return None
    block_m = 512 if c <= 640 else 256
    row_blocks = max(1, (m + block_m - 1) // block_m)
    weight_refetch = row_blocks * (c * two_f + hidden * c) * itemsize
    # what the XLA path writes+reads between its two dots: the [M, 2F]
    # projection and the [M, F] gated activation (XLA may fuse the gate
    # into the first dot's epilogue and halve this — the on-chip A/B is
    # the arbiter; this plan only has to be roughly right)
    saved = 2 * m * (two_f + hidden) * itemsize
    if weight_refetch >= saved:
        return None
    # VMEM fit (ADVICE r3): the traffic test alone let C=1280/bm=256/bf=512
    # through at ~13 MB of scoped VMEM — a Mosaic compile error. Mirror
    # _fits_vmem for the wide working set and shrink block_m until it fits.
    while block_m >= 64 and not _wide_fits_vmem(c, block_f, block_m, itemsize):
        block_m //= 2
    if block_m < 64:
        return None
    return block_m, block_f


def ln_qkv_xla(x, ln_scale, ln_bias, wq, wk, wv, eps: float = 1e-5):
    """(LN(x) @ wq, @ wk, @ wv) — XLA reference and VJP recompute target
    for the fused LN+QKV kernel. fp32 statistics, matmuls in x.dtype
    (bias-free: SD UNet self-attention projections have no bias)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)).astype(x.dtype)
    return jnp.dot(xn, wq), jnp.dot(xn, wk), jnp.dot(xn, wv)


def _ln_qkv_kernel(x_ref, g_ref, bt_ref, wq_ref, wk_ref, wv_ref, oq_ref, ok_ref, ov_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    oq_ref[:] = jnp.dot(xn, wq_ref[:], preferred_element_type=jnp.float32).astype(oq_ref.dtype)
    ok_ref[:] = jnp.dot(xn, wk_ref[:], preferred_element_type=jnp.float32).astype(ok_ref.dtype)
    ov_ref[:] = jnp.dot(xn, wv_ref[:], preferred_element_type=jnp.float32).astype(ov_ref.dtype)


def _ln_qkv_impl(x, ln_scale, ln_bias, wq, wk, wv, eps, block_m, interpret):
    if not _HAS_PLTPU:  # pragma: no cover
        raise RuntimeError("pallas TPU memory spaces unavailable; use impl='xla'")
    c = x.shape[-1]
    inner = wq.shape[-1]
    xf, m, m_pad, bm = _flatten_pad(x, block_m)
    mem = dict(memory_space=pltpu.VMEM)
    const2 = lambda i: (0, 0)
    row = pl.BlockSpec((bm, inner), lambda i: (i, 0), **mem)
    outs = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps),
        out_shape=tuple(jax.ShapeDtypeStruct((m_pad, inner), x.dtype) for _ in range(3)),
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), **mem),
            pl.BlockSpec((1, c), const2, **mem),
            pl.BlockSpec((1, c), const2, **mem),
            pl.BlockSpec((c, inner), const2, **mem),
            pl.BlockSpec((c, inner), const2, **mem),
            pl.BlockSpec((c, inner), const2, **mem),
        ],
        out_specs=(row, row, row),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * m * c * inner + 10 * m * c,
            bytes_accessed=2 * (m * c + 3 * m * inner + 3 * c * inner),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wq, wk, wv)
    shape = x.shape[:-1] + (inner,)
    return tuple(o[:m].reshape(shape) for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _ln_qkv(x, ln_scale, ln_bias, wq, wk, wv, eps, block_m, interpret):
    return _ln_qkv_impl(x, ln_scale, ln_bias, wq, wk, wv, eps, block_m, interpret)


def _ln_qkv_fwd(x, ln_scale, ln_bias, wq, wk, wv, eps, block_m, interpret):
    out = _ln_qkv_impl(x, ln_scale, ln_bias, wq, wk, wv, eps, block_m, interpret)
    return out, (x, ln_scale, ln_bias, wq, wk, wv)


def _ln_qkv_bwd(eps, block_m, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: ln_qkv_xla(*a, eps=eps), *res)
    return vjp(g)


_ln_qkv.defvjp(_ln_qkv_fwd, _ln_qkv_bwd)


def fused_ln_qkv(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    eps: float = 1e-5,
    block_m: int = 256,
    interpret: bool = False,
):
    """Pallas fused LayerNorm + bias-free q/k/v projections -> (q, k, v).

    One HBM read of x replaces the XLA path's LN write + (1-3) reads of
    the normalized tokens by the projection dots; the three weight
    matrices stay resident in VMEM. The normalized tokens themselves are
    never materialised in HBM (when a caller ALSO needs them — the
    writer's bank — it computes LN(x) separately; XLA DCEs that when the
    bank is unused, which is every reader step)."""
    return _ln_qkv(x, ln_scale, ln_bias, wq, wk, wv, eps, block_m, interpret)


def ln_qkv_plan(m: int, c: int, inner: int, itemsize: int):
    """block_m for the fused LN+QKV kernel, or None where it cannot fit
    (3 weight matrices + the fp32 projection block must sit in ~11 MB)."""
    for bm in (512, 256, 128):
        weights = 3 * c * inner * itemsize
        proj32 = 3 * bm * inner * 4
        io = 2 * (bm * c + 3 * bm * inner) * itemsize
        if weights + proj32 + io < 11 * 2**20:
            return bm
    return None


def _ln_qkv_enabled() -> bool:
    """Opt-in (EMOX_LN_QKV=1) — measured-default protocol, off until the
    on-chip end-to-end A/B proves it."""
    return os.environ.get("EMOX_LN_QKV", "") not in ("", "0")


def _ff_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, hidden: int):
    x = x_ref[:]
    # [bm, 2F] fp32 on the MXU; the full projection lives only in VMEM
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    a, g = h[:, :hidden], h[:, hidden:]
    hg = (a * _gelu_erf_kernel(g)).astype(x.dtype)
    o = jnp.dot(hg, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (o + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _flatten_pad(x: jax.Array, block_m: int):
    """Flatten leading dims to rows and pad to a block_m multiple.

    Returns (xf [m_pad, C], m, m_pad, bm) — the shared prologue of every
    FF kernel wrapper (padded rows produce garbage that is sliced away)."""
    c = x.shape[-1]
    m = 1
    for d in x.shape[:-1]:
        m *= d
    xf = x.reshape(m, c)
    bm = min(block_m, max(8, ((m + 7) // 8) * 8))
    m_pad = ((m + bm - 1) // bm) * bm
    if m_pad != m:
        xf = jnp.pad(xf, ((0, m_pad - m), (0, 0)))
    return xf, m, m_pad, bm


def _ff_impl(x, w1, b1, w2, b2, block_m: int, interpret: bool) -> jax.Array:
    if not _HAS_PLTPU:  # pragma: no cover — exotic CPU-only builds
        raise RuntimeError("pallas TPU memory spaces unavailable; use impl='xla'")
    orig_shape = x.shape
    c = x.shape[-1]
    two_f = w1.shape[-1]
    hidden = two_f // 2
    xf, m, m_pad, bm = _flatten_pad(x, block_m)
    mem = dict(memory_space=pltpu.VMEM)
    const2 = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_ff_kernel, hidden=hidden),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x.dtype),
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), **mem),
            pl.BlockSpec((c, two_f), const2, **mem),
            pl.BlockSpec((1, two_f), const2, **mem),
            pl.BlockSpec((hidden, c), const2, **mem),
            pl.BlockSpec((1, c), const2, **mem),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0), **mem),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * two_f + 2 * m * hidden * c,
            bytes_accessed=2 * (2 * m * c + c * two_f + hidden * c),
            transcendentals=m * hidden,
        ),
        interpret=interpret,
    )(xf, w1, b1.reshape(1, two_f), w2, b2.reshape(1, c))
    return out[:m].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ff(x, w1, b1, w2, b2, block_m, interpret):
    return _ff_impl(x, w1, b1, w2, b2, block_m, interpret)


def _ff_fwd(x, w1, b1, w2, b2, block_m, interpret):
    return _ff_impl(x, w1, b1, w2, b2, block_m, interpret), (x, w1, b1, w2, b2)


def _ff_bwd(block_m, interpret, res, g):
    # recompute-based backward through the XLA formulation: exact matmul
    # grads, and the [M, 8C] projection is never saved from the forward
    _, vjp = jax.vjp(geglu_ff_xla, *res)
    return vjp(g)


_ff.defvjp(_ff_fwd, _ff_bwd)


def fused_geglu_ff(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    block_m: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Pallas fused GEGLU FF. x [..., C], w1 [C, 2F], b1 [2F], w2 [F, C],
    b2 [C] -> [..., C]."""
    return _ff(x, w1, b1, w2, b2, block_m, interpret)


# VMEM budget for the weights-resident kernel: w1 + w2 (16C^2 + 8C^2 bytes
# at bf16) + the fp32 [bm, 8C] projection + double-buffered x/out blocks,
# against ~12 MB usable of the 16 MB scoped budget. C = 320 (SD level 0)
# fits with room; C = 640 does not (9.8 MB of weights + 5.2 MB projection).
_FUSED_MAX_C = 448


def _fits_vmem(c: int, two_f: int, block_m: int, itemsize: int) -> bool:
    weights = c * two_f * itemsize + (two_f // 2) * c * itemsize
    proj32 = block_m * two_f * 4
    io = 2 * 2 * block_m * c * itemsize
    return c <= _FUSED_MAX_C and (weights + proj32 + io) < 12 * 2**20


def _wide_fits_vmem(c: int, block_f: int, block_m: int, itemsize: int) -> bool:
    """Working set of one (i, j) grid cell of the wide (F-tiled) kernel:
    double-buffered weight column blocks (W1 value + gate cols [C, bf] each
    + W2 rows [bf, C]), the fp32 output accumulator [bm, C], the fp32 xn
    scratch [bm, C], and double-buffered x/out row blocks."""
    weights = 2 * 3 * c * block_f * itemsize  # x2 pipeline buffers
    acc32 = block_m * c * 4
    xn32 = block_m * c * 4
    io = 2 * 2 * block_m * c * itemsize
    return (weights + acc32 + xn32 + io) < 12 * 2**20


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _default_impl() -> str:
    env = os.environ.get("EMOX_FF_IMPL")
    if env:
        return env
    # measured default (round-4 on-chip A/B, docs/KERNELS.md): the fused
    # weights-resident kernel wins end-to-end on TPU — 25.70 vs 24.04
    # steps/s on the flagship headline (38.91 vs 41.60 ms/step). On CPU
    # stay on XLA: "fused" there means interpret-mode pallas (tests only).
    return "auto" if _on_tpu() else "xla"


def geglu_ff(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    impl: Optional[str] = None,
) -> jax.Array:
    """Dispatching GEGLU FF entry point.

    impl: "auto" (fused where the weights-resident kernel fits VMEM, XLA
    elsewhere), "fused" (force), "fused_interpret" (debug), "xla", None
    (EMOX_FF_IMPL, else the measured default).
    """
    impl = impl or _default_impl()
    if impl in ("auto", "fused") and not _fits_vmem(
        x.shape[-1], w1.shape[-1], 256, x.dtype.itemsize
    ):
        # even a FORCED "fused" must bail to XLA where the weights-resident
        # kernel cannot fit VMEM (e.g. the C=1280 mid-block sites under a
        # process-wide EMOX_FF_IMPL=fused) — forcing an impossible layout
        # would be a guaranteed Mosaic scoped-vmem compile error
        impl = "xla"
    elif impl in ("auto", "fused"):
        impl = "fused"
    if impl == "fused":
        # compiled pallas needs a TPU; interpret keeps CPU (tests, eager
        # init) working under a process-wide EMOX_FF_IMPL
        return fused_geglu_ff(x, w1, b1, w2, b2, interpret=not _on_tpu())
    if impl == "fused_interpret":
        return fused_geglu_ff(x, w1, b1, w2, b2, interpret=True)
    if impl == "xla":
        return geglu_ff_xla(x, w1, b1, w2, b2)
    raise ValueError(f"unknown ff impl {impl!r}")
