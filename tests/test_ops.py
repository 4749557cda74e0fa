"""Unit tests for Pallas kernels (interpret mode on CPU) vs jnp references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emox.ops.attention import attention_xla, flash_attention, dot_product_attention
from emox.ops.groupnorm import group_norm, group_norm_xla


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
