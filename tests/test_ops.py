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
