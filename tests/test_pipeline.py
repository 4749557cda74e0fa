"""End-to-end EMOPipeline tests (tiny model, CPU): short/windowed/long
sampling, CFG batching equivalence, chunked decode, DDIM inversion."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emox.core.config import InferenceConfig
from emox.infer.pipeline import EMOPipeline
from emox.models.emo import EMOModel
from test_models import tiny_config



pytestmark = pytest.mark.slow  # multi-minute CPU compiles; fast tier: -m "not slow"

def pipe_config(cfg_batching=True, decode_chunk=0):
    cfg = tiny_config()
    return cfg.replace(
        model=dataclasses.replace(cfg.model, use_audio=True),
        inference=InferenceConfig(
            context_frames=8, context_overlap=2, video_length=4, width=32, height=32,
            num_inference_steps=2, guidance_scale=2.0, cfg_batching=cfg_batching,
            decode_chunk=decode_chunk,
        ),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = pipe_config()
    model = EMOModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), num_frames=4, image_size=32)
    ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 0.1
    wav = jax.random.normal(jax.random.PRNGKey(2), (1, 16000)) * 0.01
    return model, params, ref, wav


class TestPipeline:
    def test_short_clip_end_to_end(self, setup):
        model, params, ref, wav = setup
        pipe = EMOPipeline(model, pipe_config())
        frames = pipe(params, ref, wav, video_length=4)
        assert frames.shape == (1, 4, 32, 32, 3)
        assert np.isfinite(np.asarray(frames)).all()

    def test_cfg_batching_matches_sequential(self, setup):
        model, params, ref, wav = setup
        lat_b = EMOPipeline(model, pipe_config(cfg_batching=True)).generate_latents(
            params, ref, wav, video_length=4
        )
        lat_s = EMOPipeline(model, pipe_config(cfg_batching=False)).generate_latents(
            params, ref, wav, video_length=4
        )
        np.testing.assert_allclose(np.asarray(lat_b), np.asarray(lat_s), atol=1e-4)

    def test_decode_chunking_identical(self, setup):
        model, params, _, _ = setup
        lat = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 16, 4))
        full = model.decode_latents(params, lat)
        chunked = model.decode_latents(params, lat, chunk=2)
        np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)

    def test_generate_long_autoregressive(self, setup):
        model, params, ref, wav = setup
        pipe = EMOPipeline(model, pipe_config())
        frames = pipe.generate_long(
            params, ref, wav, total_frames=10, segment_length=4, num_motion_frames=1,
            num_inference_steps=2,
        )
        assert frames.shape == (1, 10, 32, 32, 3)

    def test_generate_long_is_compiled(self, setup):
        """Long path runs through the shape-keyed jit cache — at most 3
        segment programs + 1 decode, not an eager op-by-op loop."""
        model, params, ref, wav = setup
        pipe = EMOPipeline(model, pipe_config())
        pipe.generate_long(
            params, ref, wav, total_frames=10, segment_length=4, num_motion_frames=1,
            num_inference_steps=2,
        )
        seg_keys = [k for k in pipe._jitted if k[0] == "long_seg"]
        dec_keys = [k for k in pipe._jitted if k[0] == "long_decode"]
        assert 1 <= len(seg_keys) <= 3, seg_keys
        assert len(dec_keys) == 1

    def test_windowed_lock_and_control_compose(self, setup):
        """_sample_windowed accepts lock_latents + control_cond (VERDICT
        weak 7): long-clip windows + continuation + ControlNet in one call."""
        import dataclasses as dc

        cfg = pipe_config()
        cfg = cfg.replace(model=dc.replace(cfg.model, use_controlnet=True))
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=4, image_size=32)
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 0.1
        wav = jax.random.normal(jax.random.PRNGKey(2), (1, 16000)) * 0.01
        pipe = EMOPipeline(model, cfg)
        T = 12  # > context_frames=8 -> windowed path
        lock = jax.random.normal(jax.random.PRNGKey(3), (1, T, 16, 16, 4)) * 0.1
        control = jnp.zeros((1, T, 32, 32, 3))
        lat = pipe.generate_latents(
            params, ref, wav, video_length=T, num_inference_steps=2,
            lock_latents=lock, num_locked=2, control_cond=control,
        )
        assert lat.shape == (1, T, 16, 16, 4)
        assert np.isfinite(np.asarray(lat)).all()
        # locked prefix actually constrains the result: different lock ->
        # different output in the locked region's denoised continuation
        lat2 = pipe.generate_latents(
            params, ref, wav, video_length=T, num_inference_steps=2,
            lock_latents=lock * 5.0, num_locked=2, control_cond=control,
        )
        assert not np.allclose(np.asarray(lat), np.asarray(lat2))

    def test_call_with_control_cond(self, setup):
        """__call__ threads control_cond through to the denoiser (r5: the
        kwarg existed on generate_latents but the public entry point
        dropped it, so `overfit_one_clip --stage4-steps` crashed)."""
        import dataclasses as dc

        cfg = pipe_config()
        cfg = cfg.replace(model=dc.replace(cfg.model, use_controlnet=True))
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=4, image_size=32)
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 0.1
        wav = jax.random.normal(jax.random.PRNGKey(2), (1, 16000)) * 0.01
        pipe = EMOPipeline(model, cfg)
        control = jnp.ones((1, 4, 32, 32, 3)) * 0.5
        frames = pipe(params, ref, wav, video_length=4, control_cond=control)
        assert frames.shape == (1, 4, 32, 32, 3)
        assert np.isfinite(np.asarray(frames)).all()

    def test_invert_shapes(self, setup):
        model, params, ref, wav = setup
        pipe = EMOPipeline(model, pipe_config())
        video = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 32, 32, 3)) * 0.1
        inv = pipe.invert(params, video, ref, wav, num_inference_steps=2)
        assert inv.shape == (1, 4, 16, 16, 4)
        assert np.isfinite(np.asarray(inv)).all()


class TestPrecomputedBanks:
    def test_precomputed_banks_match_per_step_writer(self, setup):
        """One batched writer pass for all steps must reproduce the
        per-step writer exactly (same math; the reference reruns its
        appearance encoder every timestep, EMOAnimationPipeline.py:711-716)."""
        import dataclasses as dc

        model, params, ref, wav = setup
        base = pipe_config()
        on = base.replace(inference=dc.replace(base.inference, precompute_ref_banks=True))
        off = base.replace(inference=dc.replace(base.inference, precompute_ref_banks=False))
        lat_on = EMOPipeline(model, on).generate_latents(params, ref, wav, video_length=4)
        lat_off = EMOPipeline(model, off).generate_latents(params, ref, wav, video_length=4)
        np.testing.assert_allclose(np.asarray(lat_on), np.asarray(lat_off), atol=1e-5)

    def test_precomputed_banks_windowed(self, setup):
        import dataclasses as dc

        model, params, ref, wav = setup
        base = pipe_config()
        base = base.replace(inference=dc.replace(base.inference, context_frames=4, context_overlap=1))
        on = base.replace(inference=dc.replace(base.inference, precompute_ref_banks=True))
        off = base.replace(inference=dc.replace(base.inference, precompute_ref_banks=False))
        lat_on = EMOPipeline(model, on).generate_latents(params, ref, wav, video_length=6)
        lat_off = EMOPipeline(model, off).generate_latents(params, ref, wav, video_length=6)
        np.testing.assert_allclose(np.asarray(lat_on), np.asarray(lat_off), atol=1e-5)
