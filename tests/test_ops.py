"""Unit tests for Pallas kernels (interpret mode on CPU) vs jnp references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emox.ops.attention import (
    attention_xla,
    dot_product_attention,
    dot_product_attention_nlc,
    flash_attention,
    flash_attention_nlc,
)
from emox.ops.groupnorm import group_norm, group_norm_xla


def _nlc_ref(q, k, v, heads, scale=None):
    """XLA reference on the packed [N, L, H*D] layout."""
    n, l, c = q.shape
    d = c // heads
    split = lambda t: t.reshape(t.shape[0], t.shape[1], heads, d).transpose(0, 2, 1, 3)
    out = attention_xla(split(q), split(k), split(v), scale)
    return out.transpose(0, 2, 1, 3).reshape(n, l, c)


class TestFlashAttentionNLC:
    """Packed-layout kernel: heads via block indexing, no transposes."""

    @pytest.mark.parametrize(
        "n,heads,lq,lk,d",
        [
            (2, 2, 64, 64, 64),     # self-attn, multi-head
            (1, 4, 100, 300, 64),   # ragged lengths, cross
            (2, 1, 128, 128, 128),  # single head, wide d (VAE mid-attn)
            (1, 3, 40, 550, 64),    # non-divisible lengths
        ],
    )
    def test_matches_xla(self, n, heads, lq, lk, d):
        c = heads * d
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k1, (n, lq, c), jnp.float32)
        k = jax.random.normal(k2, (n, lk, c), jnp.float32)
        v = jax.random.normal(k3, (n, lk, c), jnp.float32)
        ref = _nlc_ref(q, k, v, heads)
        out = flash_attention_nlc(q, k, v, heads, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize(
        "lk",
        [200,   # block-unaligned kv: masked kernels
         64],   # block-aligned kv: statically mask-elided kernels
    )
    def test_grad_matches_xla(self, lk):
        n, heads, lq, d = 1, 2, 64, 64
        c = heads * d
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(k1, (n, lq, c), jnp.float32)
        k = jax.random.normal(k2, (n, lk, c), jnp.float32)
        v = jax.random.normal(k3, (n, lk, c), jnp.float32)

        def loss(f):
            return lambda q, k, v: jnp.sum(f(q, k, v) ** 2)

        gp = jax.grad(loss(lambda q, k, v: flash_attention_nlc(q, k, v, heads, interpret=True)), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss(lambda q, k, v: _nlc_ref(q, k, v, heads)), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5)

    def test_dispatch_fallback_odd_head_dim(self, monkeypatch):
        """d % 64 != 0 falls back to the transposed path (still correct)."""
        monkeypatch.setenv("EMOX_ATTENTION_IMPL", "xla")
        n, heads, l, d = 1, 2, 32, 40
        c = heads * d
        q = jax.random.normal(jax.random.PRNGKey(2), (n, l, c))
        out = dot_product_attention_nlc(q, q, q, heads)
        np.testing.assert_allclose(np.asarray(out), np.asarray(_nlc_ref(q, q, q, heads)), atol=2e-5, rtol=2e-5)


class TestFlashAttention:
    @pytest.mark.parametrize(
        "b,h,lq,lk,d",
        [
            (1, 2, 64, 64, 32),     # self-attn, small
            (2, 4, 100, 100, 64),   # non-multiple lengths
            (1, 2, 256, 16, 64),    # cross-attn, short kv (audio)
            (1, 2, 8, 300, 64),     # temporal: short q, long kv
            (1, 1, 64, 64, 80),     # head dim not lane-aligned
        ],
    )
    def test_matches_xla(self, b, h, lq, lk, d):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k1, (b, h, lq, d), jnp.float32)
        k = jax.random.normal(k2, (b, h, lk, d), jnp.float32)
        v = jax.random.normal(k3, (b, h, lk, d), jnp.float32)
        ref = attention_xla(q, k, v)
        out = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_scale_override(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(k1, (1, 2, 32, 32))
        k = jax.random.normal(k2, (1, 2, 32, 32))
        v = jax.random.normal(k3, (1, 2, 32, 32))
        ref = attention_xla(q, k, v, scale=0.5)
        out = flash_attention(q, k, v, scale=0.5, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_grad_flows(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(k1, (1, 2, 32, 16))
        k = jax.random.normal(k2, (1, 2, 48, 16))
        v = jax.random.normal(k3, (1, 2, 48, 16))

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_xla(q, k, v) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize(
        "b,h,lq,lk,d",
        [
            (1, 2, 64, 64, 32),     # self-attn
            (2, 2, 100, 52, 64),    # non-multiple lengths both axes (padding masks)
            (1, 2, 48, 300, 64),    # cross-attn, long kv
            (1, 1, 64, 64, 80),     # head dim needs lane padding
        ],
    )
    def test_grad_matches_xla(self, b, h, lq, lk, d):
        """Pallas flash backward (dq/dk/dv kernels) vs the XLA attention VJP."""
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
        q = jax.random.normal(k1, (b, h, lq, d), jnp.float32)
        k = jax.random.normal(k2, (b, h, lk, d), jnp.float32)
        v = jax.random.normal(k3, (b, h, lk, d), jnp.float32)
        ct = jax.random.normal(k4, (b, h, lq, d), jnp.float32)

        def loss(fn):
            return lambda q, k, v: jnp.sum(fn(q, k, v) * ct)

        g_flash = jax.grad(loss(lambda *a: flash_attention(*a, interpret=True)), argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss(attention_xla), argnums=(0, 1, 2))(q, k, v)
        for gf, gr in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-4, rtol=2e-4)

    def test_grad_bf16(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
        q = jax.random.normal(k1, (1, 2, 64, 64), jnp.bfloat16)
        k = jax.random.normal(k2, (1, 2, 64, 64), jnp.bfloat16)
        v = jax.random.normal(k3, (1, 2, 64, 64), jnp.bfloat16)

        def loss(fn):
            return lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        g_flash = jax.grad(loss(lambda *a: flash_attention(*a, interpret=True)), argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss(attention_xla), argnums=(0, 1, 2))(q, k, v)
        for gf, gr in zip(g_flash, g_ref):
            np.testing.assert_allclose(
                np.asarray(gf, np.float32), np.asarray(gr, np.float32), atol=0.15, rtol=0.1
            )

    def test_dispatch_env(self, monkeypatch):
        monkeypatch.setenv("EMOX_ATTENTION_IMPL", "xla")
        q = jnp.ones((1, 1, 8, 8))
        out = dot_product_attention(q, q, q)
        assert out.shape == (1, 1, 8, 8)

    def test_bf16(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(k1, (1, 2, 64, 64), jnp.bfloat16)
        k = jax.random.normal(k2, (1, 2, 64, 64), jnp.bfloat16)
        v = jax.random.normal(k3, (1, 2, 64, 64), jnp.bfloat16)
        ref = attention_xla(q, k, v)
        out = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
        )


class TestGroupNorm:
    @pytest.mark.parametrize("n,l,c,g", [(2, 64, 128, 32), (1, 100, 64, 16), (3, 16, 256, 32)])
    def test_matches_xla(self, n, l, c, g):
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (n, l, c)) * 3 + 1
        gamma = jax.random.normal(k2, (c,)) * 0.1 + 1
        beta = jax.random.normal(k3, (c,)) * 0.1
        for silu in (False, True):
            ref = group_norm_xla(x, gamma, beta, g, silu=silu)
            out = group_norm(x, gamma, beta, g, silu=silu, impl="pallas_interpret")
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
            fast = group_norm(x, gamma, beta, g, silu=silu, impl="fast_interpret")
            np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_grad_matches(self):
        key = jax.random.PRNGKey(1)
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (2, 32, 64))
        gamma = jnp.ones((64,))
        beta = jnp.zeros((64,))

        def loss(impl):
            def f(x, gamma, beta):
                return jnp.sum(group_norm(x, gamma, beta, 16, silu=True, impl=impl) ** 2)
            return f

        g_ref = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, gamma, beta)
        for impl in ("pallas_interpret", "fast_interpret"):
            g_pal = jax.grad(loss(impl), argnums=(0, 1, 2))(x, gamma, beta)
            for gp, gr in zip(g_pal, g_ref):
                np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=1e-4, rtol=1e-4)

    def test_4d_input(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16, 32))
        gamma = jnp.ones((32,))
        beta = jnp.zeros((32,))
        ref = group_norm_xla(x, gamma, beta, 8)
        out = group_norm(x, gamma, beta, 8, impl="pallas_interpret")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_bad_groups_raises(self):
        x = jnp.ones((1, 4, 30))
        with pytest.raises(ValueError):
            group_norm(x, jnp.ones(30), jnp.zeros(30), 32)


class TestFusedGEGLUFF:
    """Fused GEGLU feed-forward kernel (emox/ops/ff.py) vs the XLA path."""

    def _args(self, m, c, mult=4, dtype=jnp.float32, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 5)
        x = jax.random.normal(ks[0], (2, m // 2, c), dtype) * 0.5
        w1 = jax.random.normal(ks[1], (c, 2 * mult * c), dtype) * (c ** -0.5)
        b1 = jax.random.normal(ks[2], (2 * mult * c,), dtype) * 0.01
        w2 = jax.random.normal(ks[3], (mult * c, c), dtype) * ((mult * c) ** -0.5)
        b2 = jax.random.normal(ks[4], (c,), dtype) * 0.01
        return x, w1, b1, w2, b2

    @pytest.mark.parametrize("m,c", [(64, 64), (512, 320), (96, 128)])
    def test_matches_xla(self, m, c):
        from emox.ops.ff import fused_geglu_ff, geglu_ff_xla

        args = self._args(m, c)
        out = fused_geglu_ff(*args, interpret=True)
        ref = geglu_ff_xla(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def test_bf16(self):
        from emox.ops.ff import fused_geglu_ff, geglu_ff_xla

        args = self._args(128, 320, dtype=jnp.bfloat16)
        out = fused_geglu_ff(*args, interpret=True).astype(jnp.float32)
        ref = geglu_ff_xla(*[a.astype(jnp.float32) for a in args])
        # kernel keeps the projection fp32 where the XLA path rounds to
        # bf16 between ops — compare both against the fp32 truth
        assert float(jnp.max(jnp.abs(out - ref))) < 0.05

    def test_unaligned_rows_padded(self):
        from emox.ops.ff import fused_geglu_ff, geglu_ff_xla

        x, w1, b1, w2, b2 = self._args(64, 128)
        x = x.reshape(1, 64, 128)[:, :37]  # rows not a multiple of block_m
        out = fused_geglu_ff(x, w1, b1, w2, b2, interpret=True)
        ref = geglu_ff_xla(x, w1, b1, w2, b2)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def test_grad_matches_xla(self):
        from emox.ops.ff import fused_geglu_ff, geglu_ff_xla

        args = self._args(64, 128)
        loss = lambda f: lambda *a: jnp.sum(f(*a) ** 2)
        g_fused = jax.grad(loss(lambda *a: fused_geglu_ff(*a, interpret=True)), argnums=(0, 1, 2, 3, 4))(*args)
        g_ref = jax.grad(loss(geglu_ff_xla), argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)

    def test_dispatch(self, monkeypatch):
        from emox.ops import ff

        args = self._args(64, 320)
        # auto: C=320 fits the VMEM budget -> fused; C=1280 -> xla
        assert ff._fits_vmem(320, 8 * 320, 256, 2)
        assert not ff._fits_vmem(1280, 8 * 1280, 256, 2)
        monkeypatch.setenv("EMOX_FF_IMPL", "xla")
        out = ff.geglu_ff(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ff.geglu_ff_xla(*args)), rtol=1e-6)
        with pytest.raises(ValueError):
            ff.geglu_ff(*args, impl="nope")

    def test_module_paths_share_params(self):
        """GEGLUFeedForward param tree is identical across impls, and the
        fused path applied with XLA-path params matches the XLA output."""
        from emox.nn.attention_blocks import GEGLUFeedForward

        x = jax.random.normal(jax.random.PRNGKey(3), (2, 40, 128)) * 0.3
        mod_x = GEGLUFeedForward(impl="xla")
        mod_f = GEGLUFeedForward(impl="fused_interpret")
        px = mod_x.init(jax.random.PRNGKey(4), x)
        pf = mod_f.init(jax.random.PRNGKey(4), x)
        assert jax.tree.structure(px) == jax.tree.structure(pf)
        for a, b in zip(jax.tree.leaves(px), jax.tree.leaves(pf)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out_x = mod_x.apply(px, x)
        out_f = mod_f.apply(px, x)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=2e-5, rtol=1e-5)

    def test_module_fused_grad_flows(self):
        from emox.nn.attention_blocks import GEGLUFeedForward

        x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 64)) * 0.3
        mod = GEGLUFeedForward(impl="fused_interpret")
        p = mod.init(jax.random.PRNGKey(6), x)
        g = jax.grad(lambda pp: jnp.sum(mod.apply(pp, x) ** 2))(p)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        assert float(jnp.max(jnp.abs(g["params"]["proj_in"]["kernel"]))) > 0


class TestFusedQKV:
    """EMOX_FUSED_QKV=1 folds self-attn q/k/v into one matmul — must be
    exactly the separate-dots math with an unchanged param tree."""

    def test_attention_parity_and_params(self, monkeypatch):
        from emox.nn.attention_blocks import Attention

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 64)) * 0.4
        ref_kv = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64)) * 0.4
        mod = Attention(heads=2, head_dim=32)
        monkeypatch.delenv("EMOX_FUSED_QKV", raising=False)
        p = mod.init(jax.random.PRNGKey(2), x)
        out_sep = mod.apply(p, x, extra_kv=ref_kv, extra_tile=2)
        monkeypatch.setenv("EMOX_FUSED_QKV", "1")
        p_f = mod.init(jax.random.PRNGKey(2), x)
        assert jax.tree.structure(p) == jax.tree.structure(p_f)
        out_fused = mod.apply(p, x, extra_kv=ref_kv, extra_tile=2)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_sep), atol=1e-6, rtol=1e-6)
        # cross-attention ignores the flag (q and k/v read different inputs)
        ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 64))
        out_c = mod.apply(p, x, context=ctx)
        monkeypatch.delenv("EMOX_FUSED_QKV")
        np.testing.assert_array_equal(np.asarray(out_c), np.asarray(mod.apply(p, x, context=ctx)))

    def test_frame_axis_parity(self, monkeypatch):
        from emox.nn.attention_blocks import FrameAxisAttention

        x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 12, 64)) * 0.4
        mod = FrameAxisAttention(heads=2, head_dim=32)
        monkeypatch.delenv("EMOX_FUSED_QKV", raising=False)
        p = mod.init(jax.random.PRNGKey(5), x)
        out_sep = mod.apply(p, x)
        monkeypatch.setenv("EMOX_FUSED_QKV", "1")
        assert jax.tree.structure(mod.init(jax.random.PRNGKey(5), x)) == jax.tree.structure(p)
        out_fused = mod.apply(p, x)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_sep), atol=1e-6, rtol=1e-6)


class TestFusedLNGEGLUBlock:
    """Fused x + FF(LN(x)) block kernel vs the plain module path."""

    def _args(self, m, c, mult=4, seed=7):
        ks = jax.random.split(jax.random.PRNGKey(seed), 7)
        x = jax.random.normal(ks[0], (2, m // 2, c)) * 0.5
        gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
        beta = 0.05 * jax.random.normal(ks[2], (c,))
        w1 = jax.random.normal(ks[3], (c, 2 * mult * c)) * (c ** -0.5)
        b1 = 0.01 * jax.random.normal(ks[4], (2 * mult * c,))
        w2 = jax.random.normal(ks[5], (mult * c, c)) * ((mult * c) ** -0.5)
        b2 = 0.01 * jax.random.normal(ks[6], (c,))
        return x, gamma, beta, w1, b1, w2, b2

    @pytest.mark.parametrize("m,c", [(64, 64), (512, 320)])
    def test_matches_xla(self, m, c):
        from emox.ops.ff import fused_ln_geglu_ff, ln_geglu_ff_xla

        args = self._args(m, c)
        out = fused_ln_geglu_ff(*args, interpret=True)
        ref = ln_geglu_ff_xla(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def test_grad_matches_xla(self):
        from emox.ops.ff import fused_ln_geglu_ff, ln_geglu_ff_xla

        args = self._args(64, 128)
        loss = lambda f: lambda *a: jnp.sum(f(*a) ** 2)
        gf = jax.grad(loss(lambda *a: fused_ln_geglu_ff(*a, interpret=True)), argnums=tuple(range(7)))(*args)
        gr = jax.grad(loss(ln_geglu_ff_xla), argnums=tuple(range(7)))(*args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)

    def test_transformer_block_parity(self, monkeypatch):
        """TransformerBlock output with the fused FF sub-layer matches the
        plain path on the SAME params; param trees identical."""
        from emox.nn.attention_blocks import TransformerBlock

        x = jax.random.normal(jax.random.PRNGKey(8), (2, 24, 64)) * 0.4
        mod = TransformerBlock(heads=2, head_dim=32, use_cross=False)
        monkeypatch.delenv("EMOX_FF_IMPL", raising=False)
        p = mod.init(jax.random.PRNGKey(9), x)
        out_plain, bank_plain = mod.apply(p, x)
        monkeypatch.setenv("EMOX_FF_IMPL", "fused_interpret")
        p_f = mod.init(jax.random.PRNGKey(9), x)
        assert jax.tree.structure(p) == jax.tree.structure(p_f)
        out_fused, bank_fused = mod.apply(p, x)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain), atol=5e-5, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(bank_fused), np.asarray(bank_plain))

    def test_temporal_transformer_parity(self, monkeypatch):
        from emox.nn.attention_blocks import TemporalTransformer

        x = jax.random.normal(jax.random.PRNGKey(10), (1, 4, 6, 6, 64)) * 0.4
        mod = TemporalTransformer(heads=2, head_dim=32)
        monkeypatch.delenv("EMOX_FF_IMPL", raising=False)
        p = mod.init(jax.random.PRNGKey(11), x)
        out_plain = mod.apply(p, x)
        monkeypatch.setenv("EMOX_FF_IMPL", "fused_interpret")
        out_fused = mod.apply(p, x)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain), atol=5e-5, rtol=1e-4)
        g = jax.grad(lambda pp: jnp.sum(mod.apply(pp, x) ** 2))(p)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()


class TestWideLNGEGLU:
    """F-tiled wide-C variant of the fused LN+FF block kernel."""

    @pytest.mark.parametrize("m,c,bf", [(96, 128, 256), (64, 320, 256), (64, 256, 512)])
    def test_matches_xla(self, m, c, bf):
        from emox.ops.ff import fused_ln_geglu_ff, ln_geglu_ff_xla

        t = TestFusedLNGEGLUBlock()
        args = t._args(m, c)
        out = fused_ln_geglu_ff(*args, block_m=64, block_f=bf, interpret=True)
        ref = ln_geglu_ff_xla(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def test_grad_matches_xla(self):
        from emox.ops.ff import fused_ln_geglu_ff, ln_geglu_ff_xla

        t = TestFusedLNGEGLUBlock()
        args = t._args(64, 128)
        loss = lambda f: lambda *a: jnp.sum(f(*a) ** 2)
        gf = jax.grad(loss(lambda *a: fused_ln_geglu_ff(*a, block_m=32, block_f=128, interpret=True)),
                      argnums=tuple(range(7)))(*args)
        gr = jax.grad(loss(ln_geglu_ff_xla), argnums=tuple(range(7)))(*args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)

    def test_plan(self):
        from emox.ops.ff import ff_block_plan

        # C=320 level-0: narrow, weights resident; bm=512 is the measured
        # default (r5 on-chip A/B: 25.89 vs 25.50 steps/s)
        assert ff_block_plan(16384, 320, 4, 2) == (512, 0)
        # bm=512 needs M % 512 == 0; otherwise the narrow kernel keeps 256
        assert ff_block_plan(16384 + 256, 320, 4, 2) == (256, 0)
        # C=640 with many tokens: wide wins the traffic test
        bm, bf = ff_block_plan(16384, 640, 4, 2)
        assert bf > 0 and (640 * 4) % bf == 0
        # C=1280 mid-block with few tokens: weight refetch outweighs the
        # intermediate saving -> XLA keeps the site
        assert ff_block_plan(256, 1280, 4, 2) is None

    def test_plan_block_m_env_override(self, monkeypatch):
        from emox.ops.ff import ff_block_plan

        monkeypatch.setenv("EMOX_FF_BLOCK_M", "256")
        # honored where it divides M and fits VMEM (overrides the 512 default)
        assert ff_block_plan(16384, 320, 4, 2) == (256, 0)
        # ignored when it does not divide M (falls to the default ladder)
        monkeypatch.setenv("EMOX_FF_BLOCK_M", "512")
        assert ff_block_plan(16400, 320, 4, 2) == (256, 0)
        # ignored when the fp32 [bm, 2F] projection would blow VMEM
        monkeypatch.setenv("EMOX_FF_BLOCK_M", "2048")
        assert ff_block_plan(16384, 320, 4, 2) == (512, 0)


def test_forced_fused_bails_to_xla_when_unfittable():
    """EMOX_FF_IMPL=fused on a C=1280 site must not hand Mosaic an
    impossible weights-resident layout — it falls back to XLA."""
    from emox.ops import ff

    c = 1280
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (1, 8, c), jnp.float32) * 0.3
    w1 = jax.random.normal(ks[1], (c, 8 * c)) * 0.01
    b1 = jnp.zeros((8 * c,))
    w2 = jax.random.normal(ks[2], (4 * c, c)) * 0.01
    b2 = jnp.zeros((c,))
    out = ff.geglu_ff(x, w1, b1, w2, b2, impl="fused")  # would OOM VMEM if forced
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ff.geglu_ff_xla(x, w1, b1, w2, b2)), rtol=1e-6
    )


class TestFusedLNQKV:
    """Fused LayerNorm + q/k/v projection kernel (EMOX_LN_QKV=1)."""

    def _args(self, m, c, inner, seed=11):
        ks = jax.random.split(jax.random.PRNGKey(seed), 6)
        x = jax.random.normal(ks[0], (2, m // 2, c)) * 0.5
        gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
        beta = 0.05 * jax.random.normal(ks[2], (c,))
        ws = [jax.random.normal(k, (c, inner)) * (c ** -0.5) for k in ks[3:]]
        return (x, gamma, beta, *ws)

    @pytest.mark.parametrize("m,c,inner", [(64, 64, 64), (128, 320, 320), (64, 128, 256)])
    def test_matches_xla(self, m, c, inner):
        from emox.ops.ff import fused_ln_qkv, ln_qkv_xla

        args = self._args(m, c, inner)
        outs = fused_ln_qkv(*args, interpret=True)
        refs = ln_qkv_xla(*args)
        for o, r in zip(outs, refs):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=2e-5, rtol=1e-5)

    def test_grad_matches_xla(self):
        from emox.ops.ff import fused_ln_qkv, ln_qkv_xla

        args = self._args(64, 128, 128)
        loss = lambda f: lambda *a: sum(jnp.sum(o ** 2) for o in f(*a))
        gf = jax.grad(loss(lambda *a: fused_ln_qkv(*a, interpret=True)), argnums=tuple(range(6)))(*args)
        gr = jax.grad(loss(ln_qkv_xla), argnums=tuple(range(6)))(*args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)

    def test_plan(self):
        from emox.ops.ff import ln_qkv_plan

        assert ln_qkv_plan(16384, 320, 320, 2) is not None
        assert ln_qkv_plan(16384, 640, 640, 2) is not None
        assert ln_qkv_plan(256, 4096, 4096, 2) is None  # 3 x 32 MB of weights

    def test_transformer_block_parity(self, monkeypatch):
        """TransformerBlock with EMOX_LN_QKV=1 matches the plain path on
        the same params — incl. the ref-K/V + per-row-dropout branch."""
        from emox.nn.attention_blocks import TransformerBlock

        x = jax.random.normal(jax.random.PRNGKey(12), (4, 24, 64)) * 0.4
        ref_kv = jax.random.normal(jax.random.PRNGKey(13), (2, 24, 64)) * 0.4  # Lr == L (duplication-trick contract)
        drop = jnp.asarray([True, False, False, True])
        mod = TransformerBlock(heads=2, head_dim=32, use_cross=False)
        monkeypatch.delenv("EMOX_LN_QKV", raising=False)
        p = mod.init(jax.random.PRNGKey(14), x)
        out_plain, bank_p = mod.apply(p, x, ref_kv=ref_kv, ref_drop=drop, ref_tile=2)
        monkeypatch.setenv("EMOX_LN_QKV", "1")
        p_f = mod.init(jax.random.PRNGKey(14), x)
        assert jax.tree.structure(p) == jax.tree.structure(p_f)
        out_fused, bank_f = mod.apply(p, x, ref_kv=ref_kv, ref_drop=drop, ref_tile=2)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain), atol=5e-5, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(bank_f), np.asarray(bank_p))

    def test_temporal_transformer_parity_and_grads(self, monkeypatch):
        from emox.nn.attention_blocks import TemporalTransformer

        x = jax.random.normal(jax.random.PRNGKey(15), (1, 4, 6, 6, 64)) * 0.4
        mod = TemporalTransformer(heads=2, head_dim=32)
        monkeypatch.delenv("EMOX_LN_QKV", raising=False)
        p = mod.init(jax.random.PRNGKey(16), x)
        out_plain = mod.apply(p, x)
        monkeypatch.setenv("EMOX_LN_QKV", "1")
        out_fused = mod.apply(p, x)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain), atol=5e-5, rtol=1e-4)
        # proj_out is zero-init (identity module), which makes every grad
        # through the attention branch legitimately zero — perturb it so the
        # kernel's custom_vjp actually carries gradient
        import flax
        p2 = flax.core.unfreeze(p)
        p2["params"]["proj_out"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(17), p["params"]["proj_out"]["kernel"].shape) * 0.1
        )
        g = jax.grad(lambda pp: jnp.sum(mod.apply(pp, x) ** 2))(p2)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        assert float(jnp.max(jnp.abs(g["params"]["attn_0"]["to_q"]["kernel"]))) > 0
