"""Transformer blocks: spatial, temporal, and audio-cross attention.

All variants route through emox.ops.dot_product_attention_nlc (one Pallas
flash kernel on the packed [N, L, H*D] token layout — heads handled inside
the kernel, so no head transposes or layout copies — different token
layouts per variant):

  * SpatialTransformer — self-attention over H*W tokens per frame, with
    optional reference-image K/V concatenation. This replaces the reference's
    runtime attention hijack (reference
    magicanimate/models/mutual_self_attention.py:229-255: writer banks +
    monkey-patched BasicTransformerBlock.forward) with an explicit
    `ref_kv` argument — pure function, no hidden state.
  * TemporalTransformer — attention across the frame axis per spatial
    location ((b f) d c -> (b d) f c, reference
    magicanimate/models/motion_module.py:278-284), sinusoidal positional
    encoding capped at max_len (reference motion_module.py:230-248), and a
    zero-initialised output projection (reference motion_module.py:79-80)
    so freshly-added temporal layers are identity.
  * AudioCrossAttention — per-frame cross-attention from latent tokens (Q)
    to the frame's wav2vec2 feature window (K/V), the EMO audio conditioning
    the reference declared but never wired into the denoiser (reference
    Net.py:263-325 AudioAttentionLayers; EMOAnimationPipeline.py:783 vs
    unet_controlnet.py:328-339). Zero-initialised output projection so
    stage-2 starts from stage-1 behaviour.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

import os

from emox.nn.blocks import FusedGroupNorm
from emox.nn.embeddings import sinusoidal_positions
from emox.ops.attention import dot_product_attention_nlc
from emox.ops.ff import _default_impl as ff_default_impl
from emox.ops.ff import geglu_ff


def _fused_qkv_enabled() -> bool:
    """Opt-in (EMOX_FUSED_QKV=1): fold self-attention q/k/v projections
    into ONE matmul over column-concatenated kernels. Mathematically the
    separate dots (each output column is an independent contraction);
    whether it beats XLA's own dot merging is an on-chip end-to-end
    question — measured-default protocol, off until proven."""
    return os.environ.get("EMOX_FUSED_QKV", "") not in ("", "0")


def _fused_qkv_apply(mod, denses, x, inner, bias, dtype):
    """Create the to_q/to_k/to_v params via their Dense modules (dead
    one-token calls, DCE'd), then run the fused projection."""
    for d in denses:
        _ = d(x[..., :1, :])
    p = mod.variables["params"]
    w = jnp.concatenate(
        [p[n]["kernel"].astype(dtype) for n in ("to_q", "to_k", "to_v")], axis=1
    )
    qkv = jnp.dot(x.astype(dtype), w)
    if bias:
        qkv = qkv + jnp.concatenate(
            [p[n]["bias"].astype(dtype) for n in ("to_q", "to_k", "to_v")]
        )
    return qkv[..., :inner], qkv[..., inner : 2 * inner], qkv[..., 2 * inner :]


class Attention(nn.Module):
    """Multi-head attention over token sequences [N, L, C].

    context=None -> self-attention. `extra_kv` tokens (e.g. reference-image
    features) are appended to K/V only.
    """

    heads: int
    head_dim: int
    out_dim: Optional[int] = None
    zero_init_out: bool = False
    qkv_bias: bool = False  # SD UNet: False; SD VAE mid-attn / wav2vec2: True
    # None = measured auto dispatch; "xla" forces plain XLA attention
    # (ModelConfig.flash_attention=False)
    impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        extra_kv: Optional[jax.Array] = None,
        extra_tile: int = 1,
        extra_drop: Optional[jax.Array] = None,
        context_tile: int = 1,
        qkv: Optional[tuple] = None,
    ) -> jax.Array:
        """extra_kv tokens are projected ONCE and then repeated extra_tile x
        along the batch axis — reference-image tokens are identical for
        every video frame, so projecting them per frame (the naive concat-
        then-project) wastes 15/16ths of the ref K/V matmul FLOPs at 16
        frames. Projection is rowwise-linear, so project-then-select/concat
        is exactly the concat-then-project math. extra_drop rows substitute
        the row's OWN projected tokens (the duplication uncond trick —
        softmax over duplicated tokens == plain self-attention; requires
        context=None and matching token counts)."""
        inner = self.heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        ctx = x if context is None else context
        dense = lambda d, name: nn.Dense(
            d, use_bias=self.qkv_bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        to_q = dense(inner, "to_q")
        to_k = dense(inner, "to_k")
        to_v = dense(inner, "to_v")
        if qkv is not None:
            # projections computed upstream (fused LN+QKV kernel) — create
            # the Dense params anyway (dead one-token calls) so the param
            # tree and the extra_kv projections below are unchanged
            if context is not None:  # not assert: must survive python -O
                raise ValueError("qkv bypass is a self-attention path (context must be None)")
            for d in (to_q, to_k, to_v):
                _ = d(x[..., :1, :])
            q, k, v = qkv
        elif context is None and _fused_qkv_enabled():
            # self-attention: q/k/v all read x — one matmul over the
            # column-concatenated kernels reads x once instead of three
            # times (columnwise-independent, exactly the separate dots).
            # Param tree unchanged (the same Dense modules own the params).
            q, k, v = _fused_qkv_apply(self, (to_q, to_k, to_v), x, inner, self.qkv_bias, self.dtype)
        else:
            q = to_q(x)
            k = to_k(ctx)
            v = to_v(ctx)
        if context is not None and context_tile > 1:
            # per-clip context tokens (text prompt): project once, repeat
            # the PROJECTED K/V across frames (same rowwise-linear argument
            # as extra_kv — saves (t-1)/t of the context K/V matmuls)
            k = jnp.repeat(k, context_tile, axis=0)
            v = jnp.repeat(v, context_tile, axis=0)
        if extra_kv is not None:
            ke = to_k(extra_kv.astype(self.dtype))
            ve = to_v(extra_kv.astype(self.dtype))
            if extra_tile > 1:
                ke = jnp.repeat(ke, extra_tile, axis=0)
                ve = jnp.repeat(ve, extra_tile, axis=0)
            if extra_drop is not None:
                if k.shape[1] != ke.shape[1]:
                    raise ValueError(
                        f"extra_drop's duplication uncond trick substitutes the row's own "
                        f"projected tokens for the reference tokens, which requires equal "
                        f"token counts: self tokens {k.shape[1]} != ref tokens {ke.shape[1]}"
                    )
                ke = jnp.where(extra_drop[:, None, None], k, ke)
                ve = jnp.where(extra_drop[:, None, None], v, ve)
            k = jnp.concatenate([k, ke], axis=1)
            v = jnp.concatenate([v, ve], axis=1)
        # packed layout [N, L, H*D] straight through the kernel — the head
        # axis never materialises (no transpose, no layout copies)
        out = dot_product_attention_nlc(q, k, v, self.heads, impl=self.impl)
        out_init = nn.initializers.zeros if self.zero_init_out else nn.initializers.lecun_normal()
        return nn.Dense(
            out_dim, kernel_init=out_init, dtype=self.dtype, param_dtype=self.param_dtype, name="to_out"
        )(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (reference magicanimate/models/orig_attention.py GEGLU/FeedForward).

    Routed through emox.ops.geglu_ff: on the fused path a Pallas kernel
    keeps the 2*mult*dim projection in VMEM instead of round-tripping it
    through HBM between the two matmuls (see emox/ops/ff.py). The param
    tree is identical on every path (proj_in/proj_out kernels+biases are
    created by the same nn.Dense submodules), so checkpoints and torch
    imports are impl-agnostic.
    """

    mult: int = 4
    # None = EMOX_FF_IMPL env, else the measured default ("auto" on TPU —
    # the fused path won the round-4 on-chip A/B, 25.70 vs 24.04 steps/s —
    # "xla" on CPU)
    impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        d1 = nn.Dense(dim * self.mult * 2, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")
        d2 = nn.Dense(dim, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out")
        impl = self.impl or ff_default_impl()
        if impl != "xla":
            # create the Dense params without paying their matmuls (the
            # one-token calls are dead code XLA eliminates), then feed the
            # raw kernels/biases to the fused op
            _ = d1(x[..., :1, :])
            _ = d2(jnp.zeros(x.shape[:-2] + (1, dim * self.mult), self.dtype))
            p = self.variables["params"]
            cast = lambda a: a.astype(self.dtype)
            return geglu_ff(
                x.astype(self.dtype),
                cast(p["proj_in"]["kernel"]), cast(p["proj_in"]["bias"]),
                cast(p["proj_out"]["kernel"]), cast(p["proj_out"]["bias"]),
                impl=impl,
            )
        h = d1(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)  # exact erf (torch F.gelu parity)
        return d2(h)


def _maybe_ln_qkv(parent, attn_mod, ln_name: str, x: jax.Array, normed: jax.Array,
                  inner: int, has_bias: bool, dtype):
    """Optional fused LayerNorm + q/k/v projection (EMOX_LN_QKV=1).

    Returns (q, k, v) from emox.ops.fused_ln_qkv — computed from the RAW x,
    so when the separately-returned LN output (the writer bank) is unused
    XLA dead-code-eliminates the whole LN round trip — or None when
    disabled, biased, or not VMEM-plannable. attn_mod is tiny-called on the
    normed tokens first so its params exist unchanged."""
    from emox.ops.ff import _ln_qkv_enabled, _on_tpu, fused_ln_qkv, ln_qkv_plan

    if not _ln_qkv_enabled() or has_bias:
        return None
    m = 1
    for d in x.shape[:-1]:
        m *= d
    bm = ln_qkv_plan(m, x.shape[-1], inner, jnp.dtype(dtype).itemsize)
    if bm is None:
        return None
    _ = attn_mod(normed[..., :1, :])  # create params; dead one-token compute
    p = parent.variables["params"]
    lnp, ap = p[ln_name], p[attn_mod.name]
    cast = lambda a: a.astype(dtype)
    return fused_ln_qkv(
        x.astype(dtype), lnp["scale"], lnp["bias"],
        cast(ap["to_q"]["kernel"]), cast(ap["to_k"]["kernel"]), cast(ap["to_v"]["kernel"]),
        eps=1e-5, block_m=bm, interpret=not _on_tpu(),
    )


def _ff_sublayer(parent: nn.Module, ln_mod: nn.Module, ff_mod: "GEGLUFeedForward", x: jax.Array) -> jax.Array:
    """x + FF(LN(x)) — routed through the fused LN+GEGLU+residual block
    kernel (emox.ops.fused_ln_geglu_ff) when the FF impl resolves to the
    pallas path and the weights fit VMEM: one HBM read of x, one write of
    y, no LN round trip, no 2*mult*C intermediate, no separate residual
    add. Param tree identical to the plain path (the same LayerNorm /
    GEGLUFeedForward submodules own the params)."""
    from emox.ops.ff import _on_tpu, ff_block_plan, fused_ln_geglu_ff

    impl = ff_mod.impl or ff_default_impl()
    c = x.shape[-1]
    m = 1
    for d in x.shape[:-1]:
        m *= d
    plan = ff_block_plan(m, c, ff_mod.mult, jnp.dtype(ff_mod.dtype).itemsize)
    if impl == "auto":
        impl = "fused" if plan is not None else "xla"
    if impl == "xla" or plan is None:
        return x + ff_mod(ln_mod(x))
    block_m, block_f = plan
    _ = ff_mod(ln_mod(x[..., :1, :]))  # create params; dead one-token compute
    p = parent.variables["params"]
    lnp, ffp = p[ln_mod.name], p[ff_mod.name]
    dt = ff_mod.dtype
    return fused_ln_geglu_ff(
        x.astype(dt),
        lnp["scale"], lnp["bias"],
        ffp["proj_in"]["kernel"].astype(dt), ffp["proj_in"]["bias"].astype(dt),
        ffp["proj_out"]["kernel"].astype(dt), ffp["proj_out"]["bias"].astype(dt),
        eps=1e-5,
        block_m=block_m,
        block_f=block_f,
        interpret=(impl == "fused_interpret") or not _on_tpu(),
    )


class TransformerBlock(nn.Module):
    """self-attn (+ref K/V) -> cross-attn (text/CLIP context) -> GEGLU FF,
    each pre-LayerNormed with residuals (reference
    magicanimate/models/attention.py:164-319 BasicTransformerBlock)."""

    heads: int
    head_dim: int
    use_cross: bool = True
    impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        ref_kv: Optional[jax.Array] = None,  # [B, Lr, C] UNREPEATED writer tokens
        sc_gather=None,
        ref_drop: Optional[jax.Array] = None,  # [N] bool, True = drop ref
        ref_tile: int = 1,  # frames per ref row (N = B * ref_tile)
        ctx_tile: int = 1,  # frames per context row (cross-attn prompt)
    ):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        attn = lambda name, **kw: Attention(
            self.heads, self.head_dim, impl=self.impl, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name, **kw
        )
        normed1 = ln("norm1")(x)
        # sparse-causal mode: self-attention keys/values come from other
        # frames' normed tokens (first + previous), not this frame's
        # (reference magicanimate/models/attention.py SparseCausalAttention2D)
        sc_kv = sc_gather(normed1) if sc_gather is not None else None
        a1 = attn("attn1")
        qkv1 = None
        if sc_kv is None:
            qkv1 = _maybe_ln_qkv(
                self, a1, "norm1", x, normed1, self.heads * self.head_dim, False, self.dtype
            )
        if ref_kv is not None and ref_drop is not None and sc_kv is None:
            # True "no reference" rows (CFG uncond half / training ref
            # dropout): Attention substitutes the row's OWN projected tokens
            # for the projected ref tokens — softmax over duplicated tokens
            # equals plain self-attention exactly, the reference's uncond
            # bank masking (reference mutual_self_attention.py:243-255)
            # without a second program. Ref tokens are projected once and
            # frame-repeated AFTER projection (see Attention docstring).
            x = x + a1(
                normed1, extra_kv=ref_kv, extra_tile=ref_tile, extra_drop=ref_drop, qkv=qkv1
            )
        elif ref_kv is not None and ref_drop is not None:
            # sparse-causal K/V base is [first, prev] tokens, whose length
            # differs from the ref bank, so the duplication trick above
            # cannot express "no reference" — run both branches and select
            # per row (exact, paid only in the rare sc+ref-dropout combo)
            with_ref = a1(normed1, context=sc_kv, extra_kv=ref_kv, extra_tile=ref_tile)
            without = a1(normed1, context=sc_kv)
            x = x + jnp.where(ref_drop[:, None, None], without, with_ref)
        else:
            x = x + a1(normed1, context=sc_kv, extra_kv=ref_kv, extra_tile=ref_tile, qkv=qkv1)
        if self.use_cross and context is not None:
            x = x + attn("attn2")(ln("norm2")(x), context=context, context_tile=ctx_tile)
        x = _ff_sublayer(
            self, ln("norm3"),
            GEGLUFeedForward(dtype=self.dtype, param_dtype=self.param_dtype, name="ff"), x,
        )
        # normed1 is what a ReferenceNet "writer" banks for the reader's
        # self-attention K/V concat (reference mutual_self_attention.py:229-241)
        return x, normed1


class SpatialTransformer(nn.Module):
    """GN -> linear proj -> TransformerBlocks over H*W tokens -> proj + residual
    (reference magicanimate/models/attention.py:48-161 Transformer3DModel,
    frames folded into batch)."""

    heads: int
    head_dim: int
    depth: int = 1
    groups: int = 32
    use_cross: bool = True
    sparse_causal: bool = False
    impl: Optional[str] = None
    # frame count for sparse-causal gathering (module attribute, not call
    # arg, so nn.remat sees only array arguments)
    num_frames: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [(B T), H, W, C]
        context: Optional[jax.Array] = None,  # [B, Lc, Cc] (UNREPEATED per clip)
        ref_kv: Optional[list] = None,  # per-depth-block [B, Lr, C] (UNREPEATED)
        ref_drop: Optional[jax.Array] = None,  # [(B T)] bool, True = drop ref
    ):
        n, h, w, c = x.shape
        residual = x
        hdn = FusedGroupNorm(self.groups, param_dtype=self.param_dtype, name="norm")(x)
        hdn = hdn.reshape(n, h * w, c)
        hdn = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")(hdn)

        sc_gather = None
        if self.sparse_causal and self.num_frames > 1:
            t = self.num_frames

            def sc_gather(tokens):  # [(B T), L, C] -> [(B T), 2L, C]
                bt, l, cc = tokens.shape
                v = tokens.reshape(bt // t, t, l, cc)
                first = jnp.broadcast_to(v[:, :1], v.shape)
                prev = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)
                return jnp.concatenate([first, prev], axis=2).reshape(bt, 2 * l, cc)

        banks = []
        for i in range(self.depth):
            hdn, normed1 = TransformerBlock(
                self.heads, self.head_dim, use_cross=self.use_cross, impl=self.impl,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"block_{i}",
            )(hdn, context=context, ref_kv=None if ref_kv is None else ref_kv[i],
              sc_gather=sc_gather, ref_drop=ref_drop, ref_tile=self.num_frames,
              ctx_tile=self.num_frames)
            banks.append(normed1)
        hdn = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out")(hdn)
        return residual + hdn.reshape(n, h, w, c), banks


class FrameAxisAttention(nn.Module):
    """Multi-head attention over the frame axis of [B, T, L, C] tokens,
    expressed with the spatial axis L as an einsum batch dimension — no
    physical [B,T,L,C] -> [(B L), T, C] transpose (profiled on v5e: the
    explicit transposes at 16 sites cost ~10 ms/step; einsum lets XLA fold
    the permutation into the dots).

    When `ring_mesh` is set and its `ring_axis` size > 1, attention runs as
    ring attention over that mesh axis (emox.ops.ring.ring_frame_attention):
    frames stay sharded, K/V rotate via ppermute instead of GSPMD
    all-gathering the full frame axis (SURVEY.md §2.5 "ring attention over
    the context axis for clips >> device count"). NB: the ring path uses
    shard_map and must not sit under vmap (the windowed sampler) — only pass
    a mesh for full-clip training/short-clip inference programs.
    """

    heads: int
    head_dim: int
    ring_mesh: Optional[Any] = None
    ring_axis: str = "context"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, qkv: Optional[tuple] = None) -> jax.Array:  # [B, T, L, C]
        b, t, l, c = x.shape
        inner = self.heads * self.head_dim
        dense = lambda name: nn.Dense(
            inner, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        split = lambda y: y.reshape(b, t, l, self.heads, self.head_dim)
        if qkv is not None:
            # projections from the fused LN+QKV kernel; params still owned
            # by the Dense submodules (dead one-token calls)
            for name in ("to_q", "to_k", "to_v"):
                _ = dense(name)(x[..., :1, :])
            q, k, v = (split(t_) for t_ in qkv)
        elif _fused_qkv_enabled():
            q, k, v = _fused_qkv_apply(
                self, (dense("to_q"), dense("to_k"), dense("to_v")), x, inner, False, self.dtype
            )
            q, k, v = split(q), split(k), split(v)
        else:
            q = split(dense("to_q")(x))
            k = split(dense("to_k")(x))
            v = split(dense("to_v")(x))
        ring_n = 1 if self.ring_mesh is None else self.ring_mesh.shape.get(self.ring_axis, 1)
        if ring_n > 1 and t % ring_n == 0:
            from emox.ops.ring import ring_frame_attention

            o = ring_frame_attention(q, k, v, self.ring_mesh, self.ring_axis,
                                     scale=self.head_dim ** -0.5)
        else:
            s = jnp.einsum("bqlhd,bklhd->blhqk", q, k, preferred_element_type=jnp.float32)
            s = s * (self.head_dim ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("blhqk,bklhd->bqlhd", p.astype(v.dtype), v)
        o = o.reshape(b, t, l, inner)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="to_out")(o)


class TemporalTransformer(nn.Module):
    """Attention across frames per spatial location, zero-init output.

    Input [B, T, H, W, C]; tokens are the T frames at each (h, w). Identity
    at init (zero proj_out), mirroring AnimateDiff motion-module insertion
    semantics (reference magicanimate/models/motion_module.py:42-334).
    Layout stays [B, T, L, C] throughout (see FrameAxisAttention).
    """

    heads: int
    head_dim: int
    depth: int = 1
    max_len: int = 24
    ring_mesh: Optional[Any] = None
    ring_axis: str = "context"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        residual = x
        tokens = x.reshape(b, t, h * w, c)
        pe = sinusoidal_positions(self.max_len, c)[:t].astype(self.dtype)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="norm_in")(tokens)
        tokens = tokens + pe[None, :, None, :]
        for i in range(self.depth):
            ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=f"norm_{i}")
            attn = FrameAxisAttention(
                self.heads, self.head_dim, ring_mesh=self.ring_mesh, ring_axis=self.ring_axis,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"attn_{i}"
            )
            normed = ln(tokens)
            qkv = _maybe_ln_qkv(
                self, attn, f"norm_{i}", tokens, normed, self.heads * self.head_dim, False, self.dtype
            )
            tokens = tokens + attn(normed, qkv=qkv)
            lnf = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=f"norm_ff_{i}")
            tokens = _ff_sublayer(
                self, lnf,
                GEGLUFeedForward(dtype=self.dtype, param_dtype=self.param_dtype, name=f"ff_{i}"), tokens,
            )
        out = nn.Dense(
            c, kernel_init=nn.initializers.zeros, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out"
        )(tokens)
        return residual + out.reshape(b, t, h, w, c)


class AudioCrossAttention(nn.Module):
    """Per-frame cross-attention: latent tokens (Q) -> audio window (K/V).

    Input x [B, T, H, W, C], audio [B, T, A, Ca] (A = 2*ctx+1 wav2vec2
    feature vectors per frame, reference Net.py:646-667). Zero-init output
    projection: adding audio layers to a stage-1 model is a no-op at init.
    """

    heads: int
    head_dim: int
    groups: int = 32
    impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, audio: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        ba, ta, a, ca = audio.shape
        residual = x
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="norm")(
            x.reshape(b * t, h * w, c)
        )
        ctx = audio.reshape(b * t, a, ca).astype(tokens.dtype)
        out = Attention(
            self.heads,
            self.head_dim,
            zero_init_out=True,
            impl=self.impl,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(tokens, context=ctx)
        return residual + out.reshape(b, t, h, w, c)
