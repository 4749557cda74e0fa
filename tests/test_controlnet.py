"""ControlNetEncoder tests: residual alignment with the UNet skip list,
zero-init no-op behaviour, from_unet trunk seeding, scale knob."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emox.models.controlnet import (
    ControlNetEncoder,
    ControlSignals,
    controlnet_params_from_unet,
)
from emox.models.unet import UNet
from test_models import tiny_config


def _setup():
    cfg = tiny_config().model
    unet = UNet(cfg)
    cnet = ControlNetEncoder(cfg)
    lat = jnp.zeros((1, 2, 8, 8, 4))
    ts = jnp.zeros((1,), jnp.int32)
    cond = jnp.zeros((1, 32, 32, 3))
    u_params = unet.init(jax.random.PRNGKey(0), lat, ts)["params"]
    c_params = cnet.init(jax.random.PRNGKey(1), lat, ts, cond)["params"]
    return cfg, unet, cnet, u_params, c_params, lat, ts, cond


class TestControlNet:
    @pytest.mark.slow  # >30 s CPU compile; fast tier: -m 'not slow'
    def test_residuals_align_with_unet_skips(self):
        cfg, unet, cnet, u_params, c_params, lat, ts, cond = _setup()
        sig = cnet.apply({"params": c_params}, lat, ts, cond)
        assert isinstance(sig, ControlSignals)
        # skip count: conv_in + per-level layers + downsamples between levels
        n_levels = len(cfg.channel_multipliers)
        expect = 1 + n_levels * cfg.layers_per_block + (n_levels - 1)
        assert len(sig.down) == expect
        # injecting into the UNet must not shape-error
        out = unet.apply({"params": u_params}, lat, ts, control=sig)
        assert out.sample.shape == lat.shape

    def test_zero_init_is_noop(self):
        """Freshly-initialised ControlNet residuals are exactly zero
        (reference controlnet.py zero-conv convention), so the UNet output
        is unchanged."""
        _, unet, cnet, u_params, c_params, lat, ts, cond = _setup()
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, lat.shape)
        c = jax.random.normal(jax.random.PRNGKey(3), cond.shape)
        sig = cnet.apply({"params": c_params}, x, ts, c)
        for r in sig.down + [sig.mid]:
            np.testing.assert_allclose(np.asarray(r), 0.0)
        base = unet.apply({"params": u_params}, x, ts)
        with_c = unet.apply({"params": u_params}, x, ts, control=sig)
        np.testing.assert_allclose(np.asarray(base.sample), np.asarray(with_c.sample))

    def test_trained_residuals_change_output(self):
        _, unet, cnet, u_params, c_params, lat, ts, cond = _setup()
        x = jax.random.normal(jax.random.PRNGKey(2), lat.shape)
        sig = cnet.apply({"params": c_params}, x, ts, cond)
        # simulate training: non-zero residuals
        sig = ControlSignals([r + 0.1 for r in sig.down], sig.mid + 0.1)
        base = unet.apply({"params": u_params}, x, ts)
        with_c = unet.apply({"params": u_params}, x, ts, control=sig)
        assert not np.allclose(np.asarray(base.sample), np.asarray(with_c.sample))

    def test_per_frame_cond(self):
        _, unet, cnet, u_params, c_params, lat, ts, _ = _setup()
        cond_t = jnp.zeros((1, 2, 32, 32, 3))
        sig = cnet.apply({"params": c_params}, lat, ts, cond_t)
        assert sig.down[0].shape[0] == 2  # (B T) folded

    def test_from_unet_seeds_trunk(self):
        _, unet, cnet, u_params, c_params, lat, ts, cond = _setup()
        seeded = controlnet_params_from_unet(u_params, c_params)
        np.testing.assert_allclose(
            np.asarray(seeded["conv_in"]["kernel"]), np.asarray(u_params["conv_in"]["kernel"])
        )
        np.testing.assert_allclose(
            np.asarray(seeded["mid_res_0"]["conv1"]["kernel"]),
            np.asarray(u_params["mid_res_0"]["conv1"]["kernel"]),
        )
        # controlnet-only params untouched
        np.testing.assert_allclose(np.asarray(seeded["zero_conv_0"]["kernel"]), 0.0)

    def test_conditioning_scale(self):
        _, _, cnet, _, c_params, lat, ts, cond = _setup()
        sig = ControlSignals([jnp.ones((1, 2, 2, 4))], jnp.ones((1, 2, 2, 8)))
        s = sig.scaled(0.5)
        np.testing.assert_allclose(np.asarray(s.down[0]), 0.5)
        np.testing.assert_allclose(np.asarray(s.mid), 0.5)


class TestEMOControlNet:
    @pytest.mark.slow  # >30 s CPU compile; fast tier: -m 'not slow'
    def test_predict_noise_with_control(self):
        import dataclasses
        from emox.models.emo import EMOModel
        from test_models import tiny_config as emo_tiny

        cfg = emo_tiny()
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, use_controlnet=True, control_cond_channels=1))
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
        assert "controlnet" in params
        noisy = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 16, 4))
        ref = jnp.zeros((1, 16, 16, 4))
        ts = jnp.zeros((1,), jnp.int32)
        ctrl = jnp.ones((1, 2, 32, 32, 1))
        base = model.predict_noise(params, noisy, ts, ref)
        with_c = model.predict_noise(params, noisy, ts, ref, control_cond=ctrl)
        # zero-init branch: identical at init
        np.testing.assert_allclose(np.asarray(base), np.asarray(with_c), atol=1e-6)

    def test_stage4_mask(self):
        import dataclasses
        from emox.models.emo import EMOModel
        from emox.train.stages import trainable_mask
        from test_models import tiny_config as emo_tiny

        cfg = emo_tiny()
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, use_controlnet=True, control_cond_channels=1))
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
        m = trainable_mask(params, 4)
        assert all(jax.tree.leaves(m["controlnet"]))
        assert not any(jax.tree.leaves(m["denoiser"]))
        m1 = trainable_mask(params, 1)
        assert not any(jax.tree.leaves(m1["controlnet"]))

    def test_stage4_dataset_item(self, tmp_path):
        from emox.data.dataset import EMODataset
        from emox.data.fixtures import write_fixture_dataset
        from emox.data.precompute import precompute_dataset

        vdir = tmp_path / "v"
        meta = write_fixture_dataset(str(vdir), num_clips=1, num_frames=6, size=16)
        precompute_dataset(str(meta), str(vdir), str(tmp_path / "c"), width=16, height=16)
        ds = EMODataset(str(tmp_path / "c"), "stage4-control", num_frames=2)
        item = ds.sample(np.random.default_rng(0))
        assert item["control"].shape[0] == 2
        assert "frames" in item and "ref_image" in item
