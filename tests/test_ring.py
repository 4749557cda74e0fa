"""Ring attention: numerical parity with single-device attention on an
8-device CPU ring, plus the model integration (FrameAxisAttention /
TemporalTransformer ring path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emox.core.config import MeshConfig
from emox.core.mesh import create_mesh
from emox.ops.attention import attention_xla
from emox.ops.ring import ring_attention, ring_frame_attention, shard_seq


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

    def test_frame_layout_matches_dense(self, ring_mesh):
        """ring_frame_attention on [B,T,L,H,D] == dense attention per (l,h)."""
        b, t, l, h, d = 2, 16, 6, 4, 8
        q = jax.random.normal(jax.random.PRNGKey(0), (b, t, l, h, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, t, l, h, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, t, l, h, d))
        # dense reference in the same einsum layout
        s = jnp.einsum("bqlhd,bklhd->blhqk", q, k) * (d ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        ref = jnp.einsum("blhqk,bklhd->bqlhd", p, v)
        spec = NamedSharding(ring_mesh, P(None, "context", None, None, None))
        qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
        out = ring_frame_attention(qs, ks, vs, ring_mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.slow  # >15 s CPU compile; fast tier: -m 'not slow'
    def test_frame_ring_gradients(self, ring_mesh):
        b, t, l, h, d = 1, 8, 4, 2, 8
        q = jax.random.normal(jax.random.PRNGKey(0), (b, t, l, h, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, t, l, h, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, t, l, h, d))

        def loss_ring(q, k, v):
            return jnp.sum(ring_frame_attention(q, k, v, ring_mesh) ** 2)

        def loss_dense(q, k, v):
            s = jnp.einsum("bqlhd,bklhd->blhqk", q, k) * (d ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.sum(jnp.einsum("blhqk,bklhd->bqlhd", p, v) ** 2)

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gr, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


class TestModelRingIntegration:
    def test_temporal_transformer_ring_parity(self, ring_mesh):
        """TemporalTransformer with ring_mesh == without, same params."""
        from emox.nn.attention_blocks import TemporalTransformer

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4, 4, 16))
        tt_plain = TemporalTransformer(heads=2, head_dim=8)
        tt_ring = TemporalTransformer(heads=2, head_dim=8, ring_mesh=ring_mesh)
        params = tt_plain.init(jax.random.PRNGKey(1), x)
        # zero-init proj_out makes the module identity; randomise to get a
        # real signal through the attention path
        params = jax.tree.map(
            lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape) * 0.05 + p, params
        )
        y_plain = tt_plain.apply(params, x)
        xs = jax.device_put(x, NamedSharding(ring_mesh, P(None, "context")))
        y_ring = tt_ring.apply(params, xs)
        np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_plain), atol=3e-5)

    @pytest.mark.slow  # >30 s CPU compile; fast tier: -m 'not slow'
    def test_unet_ring_wired_when_mesh_has_context(self, ring_mesh):
        """EMOModel(mesh=...) predicts identically to the unsharded model."""
        from emox.models.emo import EMOModel
        from tests.test_models import tiny_config

        cfg = tiny_config()
        model_plain = EMOModel(cfg)
        model_ring = EMOModel(cfg, mesh=ring_mesh)
        params = model_plain.init_params(jax.random.PRNGKey(0), num_frames=8, image_size=32)
        lat = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 8, 4)), jnp.float32)
        ref = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 4)), jnp.float32)
        ts = jnp.zeros((1,), jnp.int32)
        y_plain = model_plain.predict_noise(params, lat, ts, ref)
        lat_s = jax.device_put(lat, NamedSharding(ring_mesh, P(None, "context")))
        y_ring = model_ring.predict_noise(params, lat_s, ts, ref)
        np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_plain), atol=5e-5)

    @pytest.mark.slow  # >15 s CPU compile; fast tier: -m 'not slow'
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
