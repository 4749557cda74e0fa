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

    def test_invert_shapes(self, setup):
        model, params, ref, wav = setup
        pipe = EMOPipeline(model, pipe_config())
        video = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 32, 32, 3)) * 0.1
        inv = pipe.invert(params, video, ref, wav, num_inference_steps=2)
        assert inv.shape == (1, 4, 16, 16, 4)
        assert np.isfinite(np.asarray(inv)).all()
