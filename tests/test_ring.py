"""Ring attention: numerical parity with single-device attention on an
8-device CPU ring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from emox.core.config import MeshConfig
from emox.core.mesh import create_mesh
from emox.ops.attention import attention_xla
from emox.ops.ring import ring_attention, shard_seq


@pytest.fixture(scope="module")
def ring_mesh() -> Mesh:
    return create_mesh(MeshConfig(data=1, context=8, model=1))


class TestRingAttention:
    @pytest.mark.parametrize("lq,lk", [(64, 64), (128, 64), (64, 128)])
    def test_matches_dense(self, ring_mesh, lq, lk):
        b, h, d = 2, 4, 16
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, lq, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, lk, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, lk, d))
        ref = attention_xla(q, k, v)
        qs = shard_seq(q, ring_mesh)
        ks = shard_seq(k, ring_mesh)
        vs = shard_seq(v, ring_mesh)
        out = ring_attention(qs, ks, vs, ring_mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_output_stays_sharded(self, ring_mesh):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 64, 8))
        qs = shard_seq(q, ring_mesh)
        out = ring_attention(qs, qs, qs, ring_mesh)
        assert "context" in str(out.sharding)

    def test_ring_size_one_falls_back(self):
        mesh = create_mesh(MeshConfig(data=1, context=1, model=1), devices=jax.devices()[:1])
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 8))
        out = ring_attention(q, q, q, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(attention_xla(q, q, q)), atol=1e-6)

    def test_indivisible_raises(self, ring_mesh):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 60, 8))
        with pytest.raises(ValueError):
            ring_attention(q, q, q, ring_mesh)

    def test_jit_composes(self, ring_mesh):
        """ring_attention must be usable inside an outer jit."""
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 64, 8))
        qs = shard_seq(q, ring_mesh)

        @jax.jit
        def f(a):
            return ring_attention(a, a, a, ring_mesh) * 2.0

        np.testing.assert_allclose(
            np.asarray(f(qs)), np.asarray(attention_xla(q, q, q)) * 2.0, atol=2e-5
        )

    def test_gradients_match_dense(self, ring_mesh):
        """Ring attention is trainable: grads wrt q/k/v match dense."""
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 64, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 64, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 64, 8))

        def loss_ring(q, k, v):
            from emox.ops.ring import shard_seq

            qs, ks, vs = (shard_seq(x, ring_mesh) for x in (q, k, v))
            return jnp.sum(ring_attention(qs, ks, vs, ring_mesh) ** 2)

        def loss_dense(q, k, v):
            return jnp.sum(attention_xla(q, k, v) ** 2)

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gr, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
