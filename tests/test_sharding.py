"""Multi-device tests on the virtual 8-CPU mesh: mesh construction, batch/
param shardings, DP gradient equivalence, and the driver dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from emox.comm.runtime import initialize_distributed, is_master, process_info
from emox.comm.sharding import batch_spec, param_shardings, shard_batch
from emox.core.config import MeshConfig
from emox.core.mesh import create_mesh

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")


class TestMesh:
    def test_axes_sizes(self):
        mesh = create_mesh(MeshConfig(data=2, context=2, model=2))
        assert dict(mesh.shape) == {"data": 2, "context": 2, "model": 2}
        mesh2 = create_mesh(MeshConfig(data=-1, context=2, model=1))
        assert mesh2.shape["data"] == 4

    def test_process_info(self):
        info = initialize_distributed()
        assert info.process_count == 1 and is_master()
        assert process_info().global_devices >= 8


class TestShardings:
    def test_batch_spec(self):
        assert batch_spec(3) == P("data", None, None)
        assert batch_spec(5, frame_axis=1) == P("data", "context", None, None, None)

    def test_shard_batch_places_frames_on_context(self):
        mesh = create_mesh(MeshConfig(data=2, context=2, model=2))
        batch = {
            "frames": np.zeros((4, 8, 4, 4, 3), np.float32),
            "ref_image": np.zeros((4, 4, 4, 3), np.float32),
        }
        out = shard_batch(batch, mesh)
        fs = out["frames"].sharding
        assert fs.spec == P("data", "context", None, None, None)
        rs = out["ref_image"].sharding
        assert rs.spec == P("data", None, None, None)

    def test_param_shardings_tp_rules(self):
        mesh = create_mesh(MeshConfig(data=2, context=1, model=4))
        params = {
            "block": {"attn1": {"to_q": {"kernel": jnp.zeros((64, 64))},
                                 "to_out": {"kernel": jnp.zeros((64, 64)), "bias": jnp.zeros((64,))}}},
            "conv_in": {"kernel": jnp.zeros((3, 3, 4, 64))},
        }
        sh = param_shardings(params, mesh)
        assert sh["block"]["attn1"]["to_q"]["kernel"].spec == P(None, "model")
        assert sh["block"]["attn1"]["to_out"]["kernel"].spec == P("model", None)
        assert sh["block"]["attn1"]["to_out"]["bias"].spec == P()
        assert sh["conv_in"]["kernel"].spec == P()

    def test_dp_grad_matches_single_device(self):
        """Sharded-batch gradient == single-device gradient (GSPMD psum)."""
        mesh = create_mesh(MeshConfig(data=4, context=1, model=2))
        w = jnp.ones((8, 8))
        x = np.random.default_rng(0).normal(size=(8, 8)).astype(np.float32)

        def loss(w, x):
            return jnp.mean((x @ w) ** 2)

        g_single = jax.grad(loss)(w, jnp.asarray(x))
        xs = jax.device_put(jnp.asarray(x), jax.sharding.NamedSharding(mesh, P("data", None)))
        g_sharded = jax.jit(jax.grad(loss))(w, xs)
        np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded), atol=1e-6)


class TestDryrun:
    @pytest.mark.slow  # >30 s CPU compile; fast tier: -m 'not slow'
    def test_dryrun_multichip_8(self, capsys):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "1 train step OK" in out


class TestContextShardedInference:
    @pytest.mark.slow  # >30 s CPU compile; fast tier: -m 'not slow'
    def test_windowed_sampling_on_context_mesh(self):
        """Overlapping denoise windows shard over the mesh context axis
        inside one compiled program (the reference's rank::world_size window
        split, EMOAnimationPipeline.py:757, without host collectives)."""
        import dataclasses

        from emox.core.config import InferenceConfig, MeshConfig
        from emox.core.mesh import create_mesh
        from emox.infer.pipeline import EMOPipeline
        from emox.models.emo import EMOModel
        from test_models import tiny_config

        cfg = tiny_config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, use_audio=False, use_temporal=True),
            inference=InferenceConfig(
                context_frames=4, context_overlap=1, context_stride=1,
                video_length=8, width=32, height=32, num_inference_steps=2,
                guidance_scale=1.0,
            ),
        )
        mesh = create_mesh(MeshConfig(data=1, context=4, model=1))
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=4, image_size=32)
        pipe_sharded = EMOPipeline(model, cfg, mesh=mesh)
        pipe_plain = EMOPipeline(model, cfg)
        ref = jnp.zeros((1, 32, 32, 3))
        wav = jnp.zeros((1, 16000))
        lat_s = pipe_sharded.generate_latents(params, ref, wav, video_length=8)
        lat_p = pipe_plain.generate_latents(params, ref, wav, video_length=8)
        assert lat_s.shape == (1, 8, 16, 16, 4)
        np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_p), atol=1e-4)
