"""Blockwise (flash) attention as a Pallas TPU kernel.

Replaces the reference's three attention codepaths — xformers
`memory_efficient_attention` (reference magicanimate/models/orig_attention.py:729-737),
`_sliced_attention` (reference orig_attention.py:686-727), and plain
`_attention` (reference orig_attention.py:658-684) — with one online-softmax
kernel that never materialises the [Lq, Lk] score matrix in HBM.

Shapes: q [B, H, Lq, D], k/v [B, H, Lk, D] with Lk independent of Lq
(cross-attention) and arbitrary D (padded to the 128-lane MXU width inside
the wrapper; zero-padding the head dim is exact for both q@k^T and p@v).

Backward pass: custom_vjp with Pallas dq and dk/dv kernels that recompute
the score blocks from the saved (q, k, v, o, logsumexp) residuals — the
standard flash-attention backward. No O(Lq*Lk) tensor is ever materialised
in HBM in either direction, which is what makes training at the reference's
512x512 resolution possible (reference configs/training/stage1.yaml
train_width/height: 512; its CUDA equivalent is xformers'
memory_efficient_attention backward, reference
magicanimate/models/orig_attention.py:729-737).
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

_NEG_INF = -1e30
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_dim(d: int) -> int:
    """Head-dim padding for the kernel blocks. Multiples of 64 pass through
    unpadded: Mosaic handles a 64-wide minor dim (half-lane VMEM tiles), and
    skipping the materialised `jnp.pad` to 128 lanes halves Q/K/V HBM
    traffic for SD's d=64 heads — measured on v5e: ref-attn [16,5,1024,2048,64]
    3.10 -> 2.71 ms, 512^2 [16,5,4096,8192,64] 15.6 -> 14.8 ms, bitwise-equal
    outputs."""
    return d if d % 64 == 0 else _round_up(d, _LANE)


def attention_xla(q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None) -> jax.Array:
    """Reference XLA implementation (fp32 softmax accumulation)."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale: float, lk: int, block_k: int, masked: bool = True,
):
    """One (bh, q-block, kv-block) grid cell of the forward.

    The kv dimension is the FASTEST grid axis: pallas streams K/V blocks
    through VMEM (double-buffered) while the online-softmax state lives in
    VMEM scratch across kv steps — full K/V never sits in VMEM at once
    (a [4096, 512] VAE-attention K/V previously blew the 16 MB budget).
    """
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, Dp)
    block_q = q.shape[0]
    kblk = k_ref[0].astype(jnp.float32)  # (bk, Dp)
    vblk = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kb * block_k
        s = jnp.where(col < lk, s, _NEG_INF)
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kb == num_kb - 1)
    def _():
        l_safe = jnp.maximum(l_ref[:, :1], 1e-20)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_ref[:, :1] + jnp.log(l_safe))[:, 0]


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc_ref,
    *, scale: float, lk: int, block_k: int, masked: bool = True,
):
    """dq grid cell (bh, q-block, kv-block): streams K/V, accumulates dq in
    VMEM scratch. Recomputes p = exp(s - lse) blockwise, then
    ds = p * (do @ v^T - delta); dq = scale * ds @ k.
    """
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, Dp)
    do = do_ref[0].astype(jnp.float32)  # (bq, Dp)
    lse = lse_ref[0, 0][:, None]  # (bq, 1)
    delta = delta_ref[0, 0][:, None]  # (bq, 1)
    block_q = q.shape[0]
    kblk = k_ref[0].astype(jnp.float32)  # (bk, Dp)
    vblk = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    p = jnp.exp(s - lse)
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kb * block_k
        p = jnp.where(col < lk, p, 0.0)
    dp_ = jax.lax.dot_general(
        do, vblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    ds = p * (dp_ - delta)
    dq_acc_ref[:] = dq_acc_ref[:] + jax.lax.dot_general(
        ds, kblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kb == num_kb - 1)
    def _():
        dq_ref[0] = (dq_acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref,
    *, scale: float, lk: int, block_q: int, block_k: int, masked: bool = True,
):
    """dk/dv grid cell (bh, kv-block, q-block): streams Q/dO blocks with
    dk/dv accumulated in VMEM scratch.

    dv = p^T @ do ; ds = p * (do @ v^T - delta) ; dk = scale * ds^T @ q.
    Padded q rows contribute nothing because do/delta are zero-padded there.
    Padded kv rows are masked so p = 0 (matching the forward's -inf mask).
    """
    qb_i = pl.program_id(2)
    num_qb = pl.num_programs(2)

    @pl.when(qb_i == 0)
    def _():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    k = k_ref[0].astype(jnp.float32)  # (bk, Dp)
    v = v_ref[0].astype(jnp.float32)
    if masked:
        kv_base = pl.program_id(1) * block_k
        col_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_base
        ) < lk

    qb = q_ref[0].astype(jnp.float32) * scale  # (bq, Dp)
    dob = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]  # (bq, 1)
    delta = delta_ref[0, 0][:, None]
    s = jax.lax.dot_general(
        qb, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    p = jnp.exp(s - lse)
    if masked:
        p = jnp.where(col_valid, p, 0.0)
    dv_acc_ref[:] = dv_acc_ref[:] + jax.lax.dot_general(
        p, dob, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, Dp)
    dp_ = jax.lax.dot_general(
        dob, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    ds = p * (dp_ - delta)
    # qb is pre-scaled by `scale`, so ds^T @ qb carries the one required factor
    dk_acc_ref[:] = dk_acc_ref[:] + jax.lax.dot_general(
        ds, qb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, Dp)

    @pl.when(qb_i == num_qb - 1)
    def _():
        dk_ref[0] = dk_acc_ref[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _flash_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    block_q: int = 0,
    block_k: int = 0,
    interpret: bool = False,
    return_lse: bool = False,
):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h

    dp = _pad_dim(d)
    # Block sizes swept on v5e (lq=1024/lk=2048 ref-attn and lq=4096/lk=8192
    # 512px shapes): bk=1024 dominates bk=256 by 27-44%; bq=256 for short
    # queries, 512 for long.
    if block_q <= 0:
        block_q = 256 if lq <= 1024 else 512
    if block_k <= 0:
        block_k = 1024
    block_q = min(block_q, _round_up(lq, 16))
    block_k = min(block_k, _round_up(lk, 16))
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    qf = q.reshape(bh, lq, d)
    kf = k.reshape(bh, lk, d)
    vf = v.reshape(bh, lk, d)
    qf = jnp.pad(qf, ((0, 0), (0, lq_pad - lq), (0, dp - d)))
    kf = jnp.pad(kf, ((0, 0), (0, lk_pad - lk), (0, dp - d)))
    vf = jnp.pad(vf, ((0, 0), (0, lk_pad - lk), (0, dp - d)))

    num_qb = lq_pad // block_q
    num_kb = lk_pad // block_k
    mem = dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {}
    if not _HAS_PLTPU:  # pragma: no cover — exotic CPU-only builds
        raise RuntimeError("pallas TPU memory spaces unavailable; use impl='xla'")
    scratch = [
        pltpu.VMEM((block_q, dp), jnp.float32),
        pltpu.VMEM((block_q, _LANE), jnp.float32),
        pltpu.VMEM((block_q, _LANE), jnp.float32),
    ]
    kernel = functools.partial(
        _flash_kernel, scale=scale, lk=lk, block_k=block_k, masked=lk_pad != lk
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq_pad, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq_pad), jnp.float32),
        ),
        grid=(bh, num_qb, num_kb),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda i, j, kb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kb: (i, kb, 0), **mem),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kb: (i, kb, 0), **mem),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dp), lambda i, j, kb: (i, j, 0), **mem),
            pl.BlockSpec((1, 1, block_q), lambda i, j, kb: (i, 0, j), **mem),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq * lk * d,
            bytes_accessed=2 * bh * (lq + 2 * lk) * d,
            transcendentals=bh * lq * lk,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out[:, :lq, :d].reshape(b, h, lq, d)
    if return_lse:
        return out, lse  # lse stays q-padded: (bh, 1, lq_pad)
    return out


def _flash_bwd_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    lse: jax.Array,
    g: jax.Array,
    scale: float,
    block_q: int = 0,
    block_k: int = 0,
    interpret: bool = False,
):
    """Flash backward: Pallas dq kernel + Pallas dk/dv kernel.

    `lse` arrives q-padded from the forward, (bh, lq_pad_fwd); it is re-padded
    here if the backward picks a different block size. Padded q rows carry
    zero dO/delta so they contribute nothing; padded kv rows are masked.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h

    dp = _pad_dim(d)
    if block_q <= 0:
        block_q = 256 if lq <= 1024 else 512
    if block_k <= 0:
        block_k = 512
    block_q = min(block_q, _round_up(lq, 16))
    block_k = min(block_k, _round_up(lk, 16))
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    qf = jnp.pad(q.reshape(bh, lq, d), ((0, 0), (0, lq_pad - lq), (0, dp - d)))
    kf = jnp.pad(k.reshape(bh, lk, d), ((0, 0), (0, lk_pad - lk), (0, dp - d)))
    vf = jnp.pad(v.reshape(bh, lk, d), ((0, 0), (0, lk_pad - lk), (0, dp - d)))
    gf = jnp.pad(g.reshape(bh, lq, d), ((0, 0), (0, lq_pad - lq), (0, dp - d)))
    # delta_i = sum_d dO_id * O_id — a cheap fused elementwise reduce in XLA
    delta = jnp.sum(
        g.reshape(bh, lq, d).astype(jnp.float32) * o.reshape(bh, lq, d).astype(jnp.float32),
        axis=-1,
    )[:, None, :]  # (bh, 1, lq)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lq_pad - lq)))
    lse_q = jnp.pad(lse[:, :, :lq], ((0, 0), (0, 0), (0, lq_pad - lq)))

    if not _HAS_PLTPU:  # pragma: no cover — exotic CPU-only builds
        raise RuntimeError("pallas TPU memory spaces unavailable; use impl='xla'")
    mem = dict(memory_space=pltpu.VMEM)
    num_qb = lq_pad // block_q
    num_kb = lk_pad // block_k

    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel, scale=scale, lk=lk, block_k=block_k, masked=lk_pad != lk
    )
    dq = pl.pallas_call(
        dq_kernel,
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, dp), q.dtype),
        grid=(bh, num_qb, num_kb),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda i, j, kb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kb: (i, kb, 0), **mem),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kb: (i, kb, 0), **mem),
            pl.BlockSpec((1, block_q, dp), lambda i, j, kb: (i, j, 0), **mem),
            pl.BlockSpec((1, 1, block_q), lambda i, j, kb: (i, 0, j), **mem),
            pl.BlockSpec((1, 1, block_q), lambda i, j, kb: (i, 0, j), **mem),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda i, j, kb: (i, j, 0), **mem),
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * lq * lk * d,
            bytes_accessed=2 * bh * (2 * lq + 2 * lk) * d,
            transcendentals=bh * lq * lk,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse_q, delta)

    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel, scale=scale, lk=lk, block_q=block_q, block_k=block_k,
        masked=lk_pad != lk,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, lk_pad, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, lk_pad, dp), v.dtype),
        ),
        grid=(bh, num_kb, num_qb),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda i, j, qb: (i, qb, 0), **mem),
            pl.BlockSpec((1, block_k, dp), lambda i, j, qb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_k, dp), lambda i, j, qb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_q, dp), lambda i, j, qb: (i, qb, 0), **mem),
            pl.BlockSpec((1, 1, block_q), lambda i, j, qb: (i, 0, qb), **mem),
            pl.BlockSpec((1, 1, block_q), lambda i, j, qb: (i, 0, qb), **mem),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, dp), lambda i, j, qb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_k, dp), lambda i, j, qb: (i, j, 0), **mem),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, dp), jnp.float32),
            pltpu.VMEM((block_k, dp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * lq * lk * d,
            bytes_accessed=2 * bh * (2 * lq + 3 * lk) * d,
            transcendentals=bh * lq * lk,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse_q, delta)

    dq = dq[:, :lq, :d].reshape(b, h, lq, d)
    dk = dk[:, :lk, :d].reshape(b, h, lk, d)
    dv = dv[:, :lk, :d].reshape(b, h, lk, d)
    return dq, dk, dv


def _flash_nlc_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale: float, lk: int, block_k: int, heads: int, masked: bool,
):
    """Packed-layout forward: one (n, q-block, kv-block) grid cell covers
    ALL heads. Blocks are full-C-width [block, H*D] (Mosaic requires the
    minor block dim to be 128-divisible or the whole array dim), and a
    static python loop runs the per-head online softmax on d-wide column
    strips. Per-head running max / sum live in columns h of the m/l
    scratch. `masked=False` (lk divisible by block_k) statically elides
    the kv-padding iota/compare/select on every tile — dead work for the
    flagship's aligned lk=2048 ref-attn sites."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, C)
    kblk = k_ref[0].astype(jnp.float32)  # (bk, C)
    vblk = v_ref[0].astype(jnp.float32)
    block_q, c = q.shape
    d = c // heads
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kb * block_k
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], kblk[:, sl], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        if masked:
            s = jnp.where(col < lk, s, _NEG_INF)
        m_prev = m_ref[:, h : h + 1]
        l_prev = l_ref[:, h : h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:, sl] = acc_ref[:, sl] * alpha + jax.lax.dot_general(
            p, vblk[:, sl], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:, h : h + 1] = m_new
        l_ref[:, h : h + 1] = l_new

    @pl.when(kb == num_kb - 1)
    def _():
        for hh in range(heads):
            ssl = slice(hh * d, (hh + 1) * d)
            l_safe = jnp.maximum(l_ref[:, hh : hh + 1], 1e-20)
            o_ref[0, :, ssl] = (acc_ref[:, ssl] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = m_ref[:, :heads] + jnp.log(jnp.maximum(l_ref[:, :heads], 1e-20))  # (bq, H)


def _flash_bwd_nlc_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc_ref,
    *, scale: float, lk: int, block_k: int, heads: int, masked: bool,
):
    """Packed dq: same recompute as _flash_bwd_dq_kernel, static head loop."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, C)
    do = do_ref[0].astype(jnp.float32)
    kblk = k_ref[0].astype(jnp.float32)  # (bk, C)
    vblk = v_ref[0].astype(jnp.float32)
    block_q, c = q.shape
    d = c // heads
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kb * block_k
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        lse = lse_ref[0][:, h : h + 1]  # (bq, 1)
        delta = delta_ref[0][:, h : h + 1]
        s = jax.lax.dot_general(
            q[:, sl], kblk[:, sl], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)
        if masked:
            p = jnp.where(col < lk, p, 0.0)
        dp_ = jax.lax.dot_general(
            do[:, sl], vblk[:, sl], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp_ - delta)
        dq_acc_ref[:, sl] = dq_acc_ref[:, sl] + jax.lax.dot_general(
            ds, kblk[:, sl], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(kb == num_kb - 1)
    def _():
        dq_ref[0] = (dq_acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_nlc_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref,
    *, scale: float, lk: int, block_q: int, block_k: int, heads: int, masked: bool,
):
    """Packed dk/dv: static head loop over d-wide strips."""
    qb_i = pl.program_id(2)
    num_qb = pl.num_programs(2)

    @pl.when(qb_i == 0)
    def _():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    k = k_ref[0].astype(jnp.float32)  # (bk, C)
    v = v_ref[0].astype(jnp.float32)
    qb = q_ref[0].astype(jnp.float32) * scale  # (bq, C)
    dob = do_ref[0].astype(jnp.float32)
    c = k.shape[1]
    d = c // heads
    if masked:
        kv_base = pl.program_id(1) * block_k
        col_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_base
        ) < lk
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        lse = lse_ref[0][:, h : h + 1]  # (bq, 1)
        delta = delta_ref[0][:, h : h + 1]
        s = jax.lax.dot_general(
            qb[:, sl], k[:, sl], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        p = jnp.exp(s - lse)
        if masked:
            p = jnp.where(col_valid, p, 0.0)
        dv_acc_ref[:, sl] = dv_acc_ref[:, sl] + jax.lax.dot_general(
            p, dob[:, sl], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp_ = jax.lax.dot_general(
            dob[:, sl], v[:, sl], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp_ - delta)
        # qb is pre-scaled by `scale`, so ds^T @ qb carries the one factor
        dk_acc_ref[:, sl] = dk_acc_ref[:, sl] + jax.lax.dot_general(
            ds, qb[:, sl], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(qb_i == num_qb - 1)
    def _():
        dk_ref[0] = dk_acc_ref[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _nlc_blocks(lq: int, lk: int, c: int, bwd: bool):
    """Block sizes for the packed kernels: bound the VMEM working set
    (double-buffered full-C K/V blocks dominate) at wide C.

    EMOX_NLC_BLOCK_Q / EMOX_NLC_BLOCK_K override both directions — tuning
    knobs for on-chip block sweeps (bench/sweep use only; defaults below are
    the swept winners).

    Forward block_q=512 even at lq=1024 when c<=320: halving the q-grid
    halves K/V block refetches — flagship 256^2 bench 41.97 -> 41.13
    ms/step on v5e (kernel microbenches had preferred 256; the end-to-end
    step is the arbiter). The win is VMEM-gated: at c=640 (the 512^2
    level-1 site, 10 heads) bq=512/bk=1024 needs a 23.1 MB scoped
    allocation vs the 16 MB budget, so wide-C short-q keeps bq=256;
    bq=1024 / bk=2048 blow the budget even at c=320 (21.2 MB)."""
    env_q = int(os.environ.get("EMOX_NLC_BLOCK_Q", "0"))
    env_k = int(os.environ.get("EMOX_NLC_BLOCK_K", "0"))
    block_q = env_q or (
        (256 if lq <= 1024 else 512)
        if (bwd or (c > 320 and lq <= 1024))
        else 512
    )
    block_k = env_k or ((1024 if not bwd else 512) if c <= 640 else (512 if not bwd else 256))
    block_q = min(block_q, _round_up(lq, 16))
    block_k = min(block_k, _round_up(lk, 16))
    return block_q, block_k


def _flash_impl_nlc(
    q: jax.Array,  # [N, Lq, C] with C = heads * d (head-packed, no transpose)
    k: jax.Array,  # [N, Lk, C]
    v: jax.Array,
    heads: int,
    scale: float,
    interpret: bool = False,
    return_lse: bool = False,
):
    """Flash forward on the model's native token layout [N, L, H*D].

    The head axis never materialises: blocks stay full-C-width and the
    kernel loops heads on column strips. This removes the
    [N,L,H,D]->[N,H,L,D] transposes (and the layout-conversion copies XLA
    inserts around the custom-call — profiled at ~3.8 ms/step of the
    flagship 256^2 denoise step)."""
    n, lq, c = q.shape
    lk = k.shape[1]
    d = c // heads
    block_q, block_k = _nlc_blocks(lq, lk, c, bwd=False)
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)
    qf = jnp.pad(q, ((0, 0), (0, lq_pad - lq), (0, 0)))
    kf = jnp.pad(k, ((0, 0), (0, lk_pad - lk), (0, 0)))
    vf = jnp.pad(v, ((0, 0), (0, lk_pad - lk), (0, 0)))

    num_qb = lq_pad // block_q
    num_kb = lk_pad // block_k
    if not _HAS_PLTPU:  # pragma: no cover — exotic CPU-only builds
        raise RuntimeError("pallas TPU memory spaces unavailable; use impl='xla'")
    mem = dict(memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((block_q, c), jnp.float32),
        pltpu.VMEM((block_q, _LANE), jnp.float32),
        pltpu.VMEM((block_q, _LANE), jnp.float32),
    ]
    kernel = functools.partial(
        _flash_nlc_kernel, scale=scale, lk=lk, block_k=block_k, heads=heads,
        masked=lk_pad != lk,
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, lq_pad, c), q.dtype),
            jax.ShapeDtypeStruct((n, lq_pad, heads), jnp.float32),
        ),
        grid=(n, num_qb, num_kb),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j, kb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_k, c), lambda i, j, kb: (i, kb, 0), **mem),
            pl.BlockSpec((1, block_k, c), lambda i, j, kb: (i, kb, 0), **mem),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, c), lambda i, j, kb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_q, heads), lambda i, j, kb: (i, j, 0), **mem),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * heads * lq * lk * d,
            bytes_accessed=2 * n * (lq + 2 * lk) * c,
            transcendentals=n * heads * lq * lk,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out[:, :lq, :]
    if return_lse:
        return out, lse  # (n, lq_pad, heads)
    return out


def _flash_bwd_impl_nlc(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    lse: jax.Array,  # (n, lq_pad_fwd, heads)
    g: jax.Array,
    heads: int,
    scale: float,
    interpret: bool = False,
):
    """Flash backward on the packed [N, L, H*D] layout."""
    n, lq, c = q.shape
    lk = k.shape[1]
    d = c // heads
    block_q, block_k = _nlc_blocks(lq, lk, c, bwd=True)
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    qf = jnp.pad(q, ((0, 0), (0, lq_pad - lq), (0, 0)))
    kf = jnp.pad(k, ((0, 0), (0, lk_pad - lk), (0, 0)))
    vf = jnp.pad(v, ((0, 0), (0, lk_pad - lk), (0, 0)))
    gf = jnp.pad(g, ((0, 0), (0, lq_pad - lq), (0, 0)))
    # per-head delta_i = sum_d dO_ihd * O_ihd -> [N, L, H] (token-major,
    # no transpose anywhere)
    delta = jnp.sum(
        g.astype(jnp.float32).reshape(n, lq, heads, d)
        * o.astype(jnp.float32).reshape(n, lq, heads, d),
        axis=-1,
    )
    delta = jnp.pad(delta, ((0, 0), (0, lq_pad - lq), (0, 0)))
    lse_q = jnp.pad(lse[:, :lq, :], ((0, 0), (0, lq_pad - lq), (0, 0)))

    mem = dict(memory_space=pltpu.VMEM)
    num_qb = lq_pad // block_q
    num_kb = lk_pad // block_k

    dq_kernel = functools.partial(
        _flash_bwd_nlc_dq_kernel, scale=scale, lk=lk, block_k=block_k, heads=heads,
        masked=lk_pad != lk,
    )
    dq = pl.pallas_call(
        dq_kernel,
        out_shape=jax.ShapeDtypeStruct((n, lq_pad, c), q.dtype),
        grid=(n, num_qb, num_kb),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j, kb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_k, c), lambda i, j, kb: (i, kb, 0), **mem),
            pl.BlockSpec((1, block_k, c), lambda i, j, kb: (i, kb, 0), **mem),
            pl.BlockSpec((1, block_q, c), lambda i, j, kb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_q, heads), lambda i, j, kb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_q, heads), lambda i, j, kb: (i, j, 0), **mem),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda i, j, kb: (i, j, 0), **mem),
        scratch_shapes=[pltpu.VMEM((block_q, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=5 * n * heads * lq * lk * d,
            bytes_accessed=2 * n * (2 * lq + 2 * lk) * c,
            transcendentals=n * heads * lq * lk,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse_q, delta)

    dkv_kernel = functools.partial(
        _flash_bwd_nlc_dkv_kernel, scale=scale, lk=lk, block_q=block_q, block_k=block_k,
        heads=heads, masked=lk_pad != lk,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, lk_pad, c), k.dtype),
            jax.ShapeDtypeStruct((n, lk_pad, c), v.dtype),
        ),
        grid=(n, num_kb, num_qb),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j, qb: (i, qb, 0), **mem),
            pl.BlockSpec((1, block_k, c), lambda i, j, qb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_k, c), lambda i, j, qb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_q, c), lambda i, j, qb: (i, qb, 0), **mem),
            pl.BlockSpec((1, block_q, heads), lambda i, j, qb: (i, qb, 0), **mem),
            pl.BlockSpec((1, block_q, heads), lambda i, j, qb: (i, qb, 0), **mem),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, c), lambda i, j, qb: (i, j, 0), **mem),
            pl.BlockSpec((1, block_k, c), lambda i, j, qb: (i, j, 0), **mem),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, c), jnp.float32),
            pltpu.VMEM((block_k, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * heads * lq * lk * d,
            bytes_accessed=2 * n * (2 * lq + 3 * lk) * c,
            transcendentals=n * heads * lq * lk,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse_q, delta)

    return dq[:, :lq, :], dk[:, :lk, :], dv[:, :lk, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_nlc(q, k, v, heads, scale, interpret):
    return _flash_impl_nlc(q, k, v, heads, scale, interpret=interpret)


def _flash_nlc_fwd(q, k, v, heads, scale, interpret):
    o, lse = _flash_impl_nlc(q, k, v, heads, scale, interpret=interpret, return_lse=True)
    return o, (q, k, v, o, lse)


def _flash_nlc_bwd(heads, scale, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl_nlc(q, k, v, o, lse, g, heads, scale, interpret=interpret)


_flash_nlc.defvjp(_flash_nlc_fwd, _flash_nlc_bwd)


def flash_attention_nlc(
    q: jax.Array, k: jax.Array, v: jax.Array, heads: int,
    scale: Optional[float] = None, interpret: bool = False,
) -> jax.Array:
    """Pallas flash attention on the packed layout: q [N,Lq,H*D], k/v
    [N,Lk,H*D] -> [N,Lq,H*D]. No head transpose anywhere."""
    d = q.shape[-1] // heads
    scale = float(d ** -0.5) if scale is None else float(scale)
    return _flash_nlc(q, k, v, heads, scale, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale, interpret):
    return _flash_impl(q, k, v, scale, interpret=interpret)


def _flash_fwd(q, k, v, scale, interpret):
    o, lse = _flash_impl(q, k, v, scale, interpret=interpret, return_lse=True)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g, scale, interpret=interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None, interpret: bool = False
) -> jax.Array:
    """Pallas flash attention. q [B,H,Lq,D], k/v [B,H,Lk,D] -> [B,H,Lq,D]."""
    scale = float(q.shape[-1] ** -0.5) if scale is None else float(scale)
    return _flash(q, k, v, scale, interpret)


def _default_impl() -> str:
    env = os.environ.get("EMOX_ATTENTION_IMPL")
    if env:
        return env
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        platform = "cpu"
    # the axon tunnel reports platform "axon" for a real TPU chip
    return "auto" if platform in ("tpu", "axon") else "xla"


# KV length at which the Pallas flash kernel beats XLA on v5e (measured on
# chip: lk=1024 XLA 4.02ms vs pallas 4.22; lk=2048 XLA 6.87 vs pallas 4.65;
# lk=4096 XLA 19.9 vs pallas 14.8; lk=8192 XLA OOMs materialising the f32
# [16,5,4096,8192] score matrix while pallas runs). Below the cutoff XLA's
# fused attention wins — tiny-KV calls (temporal lk<=24, audio lk=5) are
# 2-3x faster through XLA.
_PALLAS_MIN_KV = 2048


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Dispatching entry point used by all nn modules.

    impl: "auto" (shape-based pallas/xla choice, TPU default), "pallas"
    (force kernel), "pallas_interpret" (debug), "xla" (CPU default).
    Override via EMOX_ATTENTION_IMPL.
    """
    impl = impl or _default_impl()
    if impl == "auto":
        impl = "pallas" if k.shape[2] >= _PALLAS_MIN_KV else "xla"
    if impl == "pallas":
        return flash_attention(q, k, v, scale)
    if impl == "pallas_interpret":
        return flash_attention(q, k, v, scale, interpret=True)
    if impl == "xla":
        return attention_xla(q, k, v, scale)
    raise ValueError(f"unknown attention impl {impl!r}")


def dot_product_attention_nlc(
    q: jax.Array,  # [N, Lq, C], C = heads * head_dim
    k: jax.Array,  # [N, Lk, C]
    v: jax.Array,
    heads: int,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Packed-layout entry point for the nn modules: attention directly on
    [N, L, H*D] token tensors. On the pallas path the head axis is handled
    by kernel block indexing — no [N,H,L,D] transpose, no layout-conversion
    copies around the custom-call. Other paths reshape locally (XLA fuses
    those transposes)."""
    d = q.shape[-1] // heads
    impl = impl or _default_impl()
    if impl == "auto":
        # Same measured cutoff as the BHLD path. Isolated small-shape
        # timings flatter the packed kernel (the ~1 ms dispatch floor
        # dominates them), but end-to-end the always-pallas variant LOSES:
        # flagship 256^2 bench 21.5 vs 22.8 steps/s — XLA fuses the tiny
        # temporal/audio attentions into neighbouring elementwise work,
        # which a custom-call boundary forfeits.
        impl = "pallas" if k.shape[1] >= _PALLAS_MIN_KV else "xla"
    if impl in ("pallas", "pallas_interpret") and d % 64 == 0:
        return flash_attention_nlc(q, k, v, heads, scale, interpret=impl == "pallas_interpret")

    def split(t):
        n, l, _ = t.shape
        return t.reshape(n, l, heads, d).transpose(0, 2, 1, 3)

    out = dot_product_attention(split(q), split(k), split(v), scale, impl=impl)
    n, h, l, _ = out.shape
    return out.transpose(0, 2, 1, 3).reshape(n, l, h * d)
