"""Ring attention over a mesh axis.

Scale-out attention for sequences longer than one chip's memory: Q/K/V are
sharded on the sequence axis over the mesh `context` axis; each device
computes attention of its local Q block against the K/V block it currently
holds, then rotates K/V around the ring with `lax.ppermute` while folding
partial results together with the online-softmax merge. After `n_devices`
rotations every Q block has seen every K/V block — no device ever holds the
full sequence and the [L, L] score matrix never materialises globally.

This is the multi-chip counterpart of the blockwise Pallas kernel in
emox.ops.attention (SURVEY.md §2.5: "blockwise + frame-axis sharding first,
ring attention over the context axis for clips >> device count"). The
reference's only long-video mechanism was overlapping context windows split
across GPU ranks with host-mediated gather/broadcast per step (reference
EMOAnimationPipeline.py:757,796-821); ring attention instead keeps the
collective on ICI inside one compiled program.

Communication per step: 2 * local KV bytes per device per rotation,
overlappable with the local attention compute by XLA's latency-hiding
scheduler (the ppermute for rotation i+1 is independent of block-merge i).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _block_attn(q: jax.Array, k: jax.Array, v: jax.Array, scale: float):
    """Local block attention returning (unnormalised acc, row max, row sum).

    q [B,H,Lq,D], k/v [B,H,Lk,D] -> acc [B,H,Lq,D] f32, m/l [B,H,Lq,1] f32.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)  # [B,H,Lq,1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return acc, m, l


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "context",
    scale: Optional[float] = None,
) -> jax.Array:
    """Attention with Q/K/V sequence-sharded over `axis` of `mesh`.

    q, k, v: [B, H, L, D] global shapes, L divisible by the axis size.
    Returns [B, H, L, D] with the same sharding as q.
    """
    scale = float(q.shape[-1] ** -0.5) if scale is None else float(scale)
    n = mesh.shape[axis]
    if n == 1:
        from emox.ops.attention import attention_xla

        return attention_xla(q, k, v, scale)
    if q.shape[2] % n or k.shape[2] % n:
        raise ValueError(f"sequence axes {q.shape[2]}/{k.shape[2]} not divisible by ring size {n}")

    spec = P(None, None, axis, None)
    perm = [(i, (i + 1) % n) for i in range(n)]

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    def _ring(q_loc, k_loc, v_loc):
        qf = q_loc.astype(jnp.float32)

        def step(i, carry):
            k_cur, v_cur, acc, m, l = carry
            a_i, m_i, l_i = _block_attn(qf, k_cur.astype(jnp.float32), v_cur.astype(jnp.float32), scale)
            m_new = jnp.maximum(m, m_i)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(m_i - m_new)
            acc = acc * alpha + a_i * beta
            l = l * alpha + l_i * beta
            k_nxt = lax.ppermute(k_cur, axis, perm)
            v_nxt = lax.ppermute(v_cur, axis, perm)
            return k_nxt, v_nxt, acc, m_new, l

        b, h, lq, d = qf.shape

        def vary(x):  # mark replicated literals as axis-varying so the
            # fori_loop carry types match the ppermute outputs (jax>=0.8 vma)
            try:
                return lax.pcast(x, (axis,), to="varying")
            except (AttributeError, TypeError):
                try:
                    return lax.pvary(x, (axis,))  # pre-pcast jax
                except (AttributeError, TypeError):  # pragma: no cover
                    return x

        init = (
            k_loc,
            v_loc,
            vary(jnp.zeros((b, h, lq, d), jnp.float32)),
            vary(jnp.full((b, h, lq, 1), -jnp.inf, jnp.float32)),
            vary(jnp.zeros((b, h, lq, 1), jnp.float32)),
        )
        _, _, acc, _, l = lax.fori_loop(0, n, step, init)
        return (acc / jnp.maximum(l, 1e-20)).astype(q_loc.dtype)

    return _ring(q, k, v)


def ring_frame_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "context",
    scale: Optional[float] = None,
) -> jax.Array:
    """Ring attention over the FRAME axis in the temporal-attention layout.

    q, k, v: [B, T, L, H, D] global — the layout FrameAxisAttention uses
    (frames = sequence, spatial locations L as a batch dim, no physical
    transpose). T is sharded over the mesh `axis`; B rides the `data` axis
    and H the `model` axis when those exist, so the shard_map specs match
    the training-time activation shardings and GSPMD inserts no resharding.

    Per rotation each device attends its local Q frames against the K/V
    frame block it currently holds, merges with the online-softmax rule,
    and rotates K/V via lax.ppermute — the full K/V over frames is never
    gathered on one device (GSPMD's default for the same einsum would
    all-gather K/V over `axis`).
    """
    from emox.core.mesh import MeshAxes

    scale = float(q.shape[-1] ** -0.5) if scale is None else float(scale)
    n = mesh.shape[axis]
    b, t, l, h, d = q.shape
    if n == 1:
        s = jnp.einsum("bqlhd,bklhd->blhqk", q, k, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("blhqk,bklhd->bqlhd", p.astype(v.dtype), v).astype(q.dtype)
    if t % n:
        raise ValueError(f"frame axis {t} not divisible by ring size {n}")

    d_ax = MeshAxes.DATA if (mesh.shape.get(MeshAxes.DATA, 1) > 1 and b % mesh.shape[MeshAxes.DATA] == 0) else None
    m_ax = MeshAxes.MODEL if (mesh.shape.get(MeshAxes.MODEL, 1) > 1 and h % mesh.shape[MeshAxes.MODEL] == 0) else None
    spec = P(d_ax, axis, None, m_ax, None)
    perm = [(i, (i + 1) % n) for i in range(n)]

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    def _ring(q_loc, k_loc, v_loc):
        qf = q_loc.astype(jnp.float32) * scale
        bl, tl, ll, hl, dl = qf.shape

        def step(i, carry):
            k_cur, v_cur, acc, m, lsum = carry
            s = jnp.einsum(
                "bqlhd,bklhd->blhqk", qf, k_cur.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )  # [b, l, h, q, kloc]
            m_i = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_i)
            p = jnp.exp(s - m_new)
            l_i = jnp.sum(p, axis=-1, keepdims=True)
            a_i = jnp.einsum(
                "blhqk,bklhd->bqlhd", p, v_cur.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            alpha = jnp.exp(m - m_new)  # [b, l, h, q, 1]
            acc = acc * alpha.transpose(0, 3, 1, 2, 4) + a_i
            lsum = lsum * alpha + l_i
            k_nxt = lax.ppermute(k_cur, axis, perm)
            v_nxt = lax.ppermute(v_cur, axis, perm)
            return k_nxt, v_nxt, acc, m_new, lsum

        # the carry mixes with q_loc-derived values, which vary over EVERY
        # sharded in-spec axis (data/context/model) — the carry's varying
        # set must match or the fori_loop types mismatch (jax>=0.8 vma)
        vary_axes = tuple(a for a in (d_ax, axis, m_ax) if a is not None)

        def vary(x):
            try:
                return lax.pcast(x, vary_axes, to="varying")
            except (AttributeError, TypeError):
                try:
                    return lax.pvary(x, vary_axes)
                except (AttributeError, TypeError):  # pragma: no cover
                    return x

        init = (
            k_loc,
            v_loc,
            vary(jnp.zeros((bl, tl, ll, hl, dl), jnp.float32)),
            vary(jnp.full((bl, ll, hl, tl, 1), -jnp.inf, jnp.float32)),
            vary(jnp.zeros((bl, ll, hl, tl, 1), jnp.float32)),
        )
        _, _, acc, _, lsum = lax.fori_loop(0, n, step, init)
        out = acc / jnp.maximum(lsum, 1e-20).transpose(0, 3, 1, 2, 4)
        return out.astype(q_loc.dtype)

    return _ring(q, k, v)


def shard_seq(x: jax.Array, mesh: Mesh, axis: str = "context", dim: int = 2) -> jax.Array:
    """Device-put [.., L, ..] with its sequence dim sharded over `axis`."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
