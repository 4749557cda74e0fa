"""Diffusion tests: schedule math, window plans (property-tested), samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emox.core.config import DiffusionConfig
from emox.diffusion.context import ordered_halving, uniform_windows, window_plan
from emox.diffusion.interp import interpolate_latents, slerp_latents
from emox.diffusion.sampler import cfg_combine, ddim_invert, ddim_sample, windowed_ddim_sample
from emox.diffusion.schedule import (
    add_noise,
    ddim_step,
    ddpm_step,
    get_velocity,
    inference_timesteps,
    make_schedule,
    min_snr_loss_weight,
    pred_to_x0,
    snr,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule(DiffusionConfig())


class TestSchedule:
    def test_beta_endpoints(self, sched):
        # scaled_linear: betas[0] = 0.00085, betas[-1] = 0.012
        np.testing.assert_allclose(float(sched.betas[0]), 0.00085, rtol=1e-5)
        np.testing.assert_allclose(float(sched.betas[-1]), 0.012, rtol=1e-5)
        acp = np.asarray(sched.alphas_cumprod)
        assert np.all(np.diff(acp) < 0) and 0 < acp[-1] < acp[0] < 1

    def test_add_noise_extremes(self, sched):
        x0 = jnp.ones((2, 4, 4, 1))
        noise = jnp.full((2, 4, 4, 1), 2.0)
        t0 = jnp.zeros((2,), jnp.int32)
        out = add_noise(sched, x0, noise, t0)
        acp0 = float(sched.alphas_cumprod[0])
        expect = np.sqrt(acp0) * 1.0 + np.sqrt(1 - acp0) * 2.0
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)

    def test_pred_roundtrip_epsilon(self, sched):
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 4, 4, 3))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([100, 700])
        xt = add_noise(sched, x0, noise, t)
        x0_rec, eps_rec = pred_to_x0(sched, noise, xt, t)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-4)

    def test_v_prediction_roundtrip(self):
        s = make_schedule(DiffusionConfig(prediction_type="v_prediction"))
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([250, 900])
        xt = add_noise(s, x0, noise, t)
        v = get_velocity(s, x0, noise, t)
        x0_rec, eps_rec = pred_to_x0(s, v, xt, t)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-4)

    def test_zero_terminal_snr(self):
        s = make_schedule(DiffusionConfig(zero_terminal_snr=True))
        assert float(s.alphas_cumprod[-1]) < 1e-8
        assert float(snr(s, jnp.array([s.num_train_timesteps - 1]))[0]) < 1e-6

    def test_min_snr_weight(self, sched):
        t = jnp.array([0, 500, 999])
        w = min_snr_loss_weight(sched, t, gamma=5.0)
        s = np.asarray(snr(sched, t))
        np.testing.assert_allclose(np.asarray(w), np.minimum(s, 5.0) / s, rtol=1e-5)
        w_off = min_snr_loss_weight(sched, t, gamma=0.0)
        np.testing.assert_allclose(np.asarray(w_off), 1.0)

    def test_inference_timesteps(self):
        ts = np.asarray(inference_timesteps(1000, 50))
        assert ts.shape == (50,) and ts[0] == 980 and ts[-1] == 0
        assert np.all(np.diff(ts) == -20)

    def test_ddim_deterministic_recovers_x0_with_perfect_model(self, sched):
        """With the true epsilon as model output, DDIM from x_t steps toward x0."""
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([500])
        xt = add_noise(sched, x0, noise, t)
        out = ddim_step(sched, noise, xt, t, jnp.array([-1]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)

    def test_ddpm_step_final_no_noise(self, sched):
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([0])
        xt = add_noise(sched, x0, noise, t)
        out = ddpm_step(sched, noise, xt, t, jax.random.PRNGKey(2), clip_x0=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


class TestContextWindows:
    def test_ordered_halving_sequence(self):
        vals = [ordered_halving(i) for i in range(8)]
        np.testing.assert_allclose(vals, [0, 1 / 2, 1 / 4, 3 / 4, 1 / 8, 5 / 8, 3 / 8, 7 / 8])

    def test_short_clip_single_window(self):
        ws = uniform_windows(0, 8, context_size=16)
        assert ws == [list(range(8))]

    @pytest.mark.parametrize("num_frames,ctx,overlap", [(24, 16, 4), (40, 16, 4), (64, 16, 8)])
    def test_full_coverage_every_step(self, num_frames, ctx, overlap):
        for step in range(25):
            ws = uniform_windows(step, num_frames, ctx, 1, overlap)
            covered = set()
            for w in ws:
                assert len(w) == ctx
                assert all(0 <= f < num_frames for f in w)
                covered.update(w)
            assert covered == set(range(num_frames)), f"step {step}"

    def test_seams_rotate_across_steps(self):
        w0 = uniform_windows(0, 40, 16, 1, 4)
        w1 = uniform_windows(1, 40, 16, 1, 4)
        assert w0 != w1

    def test_window_plan_static_shape(self):
        plan = window_plan(num_steps=10, num_frames=40, context_size=16, context_overlap=4)
        assert plan.indices.shape[0] == 10
        assert plan.indices.shape[2] == 16
        assert plan.weights.shape == plan.indices.shape[:2]
        assert set(np.unique(plan.weights)) <= {0.0, 1.0}

    def test_window_plan_short_clip(self):
        plan = window_plan(num_steps=5, num_frames=8, context_size=16)
        assert plan.context_size == 8 and plan.max_windows == 1


class TestSamplers:
    def test_ddim_sample_perfect_model(self, sched):
        """A model that always returns the true noise must recover x0."""
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 2))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t_start = jnp.array([980])
        xt = add_noise(sched, x0, noise, t_start)

        # epsilon is constant in t for a fixed (x0, xt) pair only at t_start;
        # instead check: pure-noise input + model returning that noise -> x0=0
        final = ddim_sample(lambda lat, t: lat / jnp.sqrt(1 - sched.alphas_cumprod[t][:, None, None, None]), noise, sched, 50)
        # model_out = xt/sqrt(1-acp) => x0_pred = 0 at every step => final ~ 0
        np.testing.assert_allclose(np.asarray(final), 0.0, atol=1e-3)

    def test_windowed_matches_plain_for_single_window(self, sched):
        """When the whole clip fits one window, windowed == plain DDIM."""
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 4, 4, 2))
        plan = window_plan(num_steps=5, num_frames=8, context_size=16)

        def denoise(l, t):  # pretend-model: scaled identity
            return 0.1 * l

        def denoise_window(wl, t, idx):  # [W, B, c, h, w, C]
            return 0.1 * wl

        plain = ddim_sample(denoise, lat, sched, 5)
        windowed = windowed_ddim_sample(denoise_window, lat, sched, plan)
        np.testing.assert_allclose(np.asarray(windowed), np.asarray(plain), atol=1e-5)

    def test_windowed_overlap_averaging(self, sched):
        """Multi-window coverage normalises by hit count: a constant-output
        model gives identical results to single-window denoising."""
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 2, 2, 1))
        plan = window_plan(num_steps=4, num_frames=24, context_size=16, context_overlap=4)

        def denoise_window(wl, t, idx):
            return jnp.ones_like(wl) * 0.05

        out = windowed_ddim_sample(denoise_window, lat, sched, plan)
        ref = ddim_sample(lambda l, t: jnp.ones_like(l) * 0.05, lat, sched, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_ddim_invert_roundtrip(self, sched):
        """invert -> sample is (approximately) the identity for a model with
        input-independent output (DDIM steps are then exact mutual inverses;
        only the skipped x0 -> t_0 projection contributes error)."""
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 2)) * 0.3
        eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        model = lambda lat, t: jnp.broadcast_to(eps, lat.shape)
        inverted = ddim_invert(model, x0, sched, 20)
        assert not np.allclose(np.asarray(inverted), np.asarray(x0))
        back = ddim_sample(model, inverted, sched, 20)
        # error budget: skipped x0 -> t_0 projection (~sqrt(beta_0)*|eps|)
        # plus fp32 accumulation through the 1/sqrt(alpha_bar) amplification
        np.testing.assert_allclose(np.asarray(back), np.asarray(x0), atol=0.1)

    def test_ddim_invert_reaches_high_noise(self, sched):
        """Inverted latents should sit at the sampler's start noise level:
        variance grows toward ~(x0-scaled + eps-scaled) magnitude."""
        x0 = jnp.zeros((1, 4, 4, 2))
        eps = jnp.ones_like(x0)
        inverted = ddim_invert(lambda lat, t: jnp.broadcast_to(eps, lat.shape), x0, sched, 20)
        t_start = int(inference_timesteps(sched.num_train_timesteps, 20)[0])
        expect = float(jnp.sqrt(1 - sched.alphas_cumprod[t_start]))
        np.testing.assert_allclose(np.asarray(inverted), expect, atol=0.02)

    def test_cfg_combine(self):
        u, c = jnp.zeros((2, 2)), jnp.ones((2, 2))
        np.testing.assert_allclose(np.asarray(cfg_combine(u, c, 7.5)), 7.5)


class TestInterp:
    def test_slerp_endpoints(self):
        a = jax.random.normal(jax.random.PRNGKey(0), (4, 4))
        b = jax.random.normal(jax.random.PRNGKey(1), (4, 4))
        np.testing.assert_allclose(np.asarray(slerp_latents(a, b, 0.0)), np.asarray(a), atol=1e-5)
        np.testing.assert_allclose(np.asarray(slerp_latents(a, b, 1.0)), np.asarray(b), atol=1e-5)

    def test_interpolate_count(self):
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 2, 1))
        out = interpolate_latents(lat, 2)
        assert out.shape[1] == 7
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(lat[:, 0]))
        np.testing.assert_allclose(np.asarray(out[:, -1]), np.asarray(lat[:, -1]))
