"""CLIP conditioning threaded end-to-end (tiny model, CPU): prompt context
reaches the denoiser's cross-attention, CFG uncond uses the empty-prompt
embedding (reference magicanimate/pipelines/pipeline_animation.py:184-271),
and the CLIP identity embedding enters the time embedding (reference
EMOAnimationPipeline.py:867, Net.py:421-430)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emox.core.config import CLIPConfig, InferenceConfig
from emox.infer.pipeline import EMOPipeline
from emox.models.emo import EMOModel
from test_models import tiny_config

pytestmark = pytest.mark.slow


def clip_cfg(cfg_batching=True):
    cfg = tiny_config()
    return cfg.replace(
        model=dataclasses.replace(
            cfg.model, use_cross_attention=True, use_identity_embed=True, use_audio=True
        ),
        clip=CLIPConfig(
            text_enabled=True, vision_enabled=True, vocab_size=49408,
            text_hidden_dim=16, text_layers=1, text_heads=2, max_positions=16,
            vision_hidden_dim=8, vision_layers=1, vision_heads=2,
            image_size=16, patch_size=8, projection_dim=8,
        ),
        inference=InferenceConfig(
            context_frames=8, video_length=2, width=32, height=32,
            num_inference_steps=2, guidance_scale=2.0, cfg_batching=cfg_batching,
        ),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = clip_cfg()
    model = EMOModel(cfg)
    # cross_attention_dim must match the text encoder width for context
    assert cfg.model.cross_attention_dim == cfg.clip.text_hidden_dim
    params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
    ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 0.1
    wav = jax.random.normal(jax.random.PRNGKey(2), (1, 16000)) * 0.01
    return model, params, ref, wav


class TestPromptConditioning:
    def test_prompt_changes_output(self, setup):
        model, params, ref, wav = setup
        pipe = EMOPipeline(model, clip_cfg())
        lat_a = pipe.generate_latents(
            params, ref, wav, video_length=2,
            context=model.encode_text(params, jnp.full((1, 4), 7, jnp.int32)),
            uncond_context=model.encode_text(params, jnp.full((1, 4), 3, jnp.int32)),
        )
        lat_b = pipe.generate_latents(
            params, ref, wav, video_length=2,
            context=model.encode_text(params, jnp.full((1, 4), 11, jnp.int32)),
            uncond_context=model.encode_text(params, jnp.full((1, 4), 3, jnp.int32)),
        )
        assert np.isfinite(np.asarray(lat_a)).all()
        assert not np.allclose(np.asarray(lat_a), np.asarray(lat_b))

    def test_prompt_string_end_to_end(self, setup):
        model, params, ref, wav = setup
        pipe = EMOPipeline(model, clip_cfg())
        frames = pipe(params, ref, wav, video_length=2, prompt="a talking head")
        assert frames.shape == (1, 2, 32, 32, 3)
        assert np.isfinite(np.asarray(frames)).all()

    def test_uncond_is_empty_prompt(self, setup):
        """The CFG uncond branch must consume the empty-prompt embedding:
        guidance with negative_prompt="" must equal guidance where the
        uncond context is explicitly the empty-prompt encoding (reference
        _encode_prompt semantics)."""
        model, params, ref, wav = setup
        pipe = EMOPipeline(model, clip_cfg())
        ctx, unc = pipe.encode_prompt(params, "hello world", "")
        from emox.data.tokenizer import CLIPTokenizer

        tok = CLIPTokenizer()
        ids_empty = jnp.asarray(tok.encode([""], max_length=16))
        unc_direct = model.encode_text(params, ids_empty)
        np.testing.assert_allclose(np.asarray(unc), np.asarray(unc_direct), atol=1e-6)

    def test_cfg_batching_matches_sequential_with_prompt(self, setup):
        model, params, ref, wav = setup
        kw = dict(video_length=2, prompt="a portrait")
        f_b = EMOPipeline(model, clip_cfg(cfg_batching=True))(params, ref, wav, **kw)
        f_s = EMOPipeline(model, clip_cfg(cfg_batching=False))(params, ref, wav, **kw)
        np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_s), atol=1e-4)


class TestIdentityEmbedding:
    def test_zero_embed_is_noop(self, setup):
        """Zero identity embedding == no identity embedding (zero-init,
        bias-free projection)."""
        model, params, ref, wav = setup
        lat = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 8, 4))
        t = jnp.array([100], jnp.int32)
        ref_lat = model.encode_images(params, ref)
        out_none = model.predict_noise(params, lat, t, ref_lat)
        out_zero = model.predict_noise(
            params, lat, t, ref_lat, identity_embed=jnp.zeros((1, 8))
        )
        np.testing.assert_array_equal(np.asarray(out_none), np.asarray(out_zero))

    def test_identity_embed_wired(self, setup):
        """A nonzero embedding through a nonzero projection must change the
        denoiser output (the wiring the reference never finished)."""
        model, params, ref, wav = setup
        proj = params["denoiser"]["identity_embed_proj"]["kernel"]
        params2 = jax.tree_util.tree_map(lambda x: x, params)
        params2["denoiser"] = dict(params2["denoiser"])
        params2["denoiser"]["identity_embed_proj"] = {"kernel": jnp.ones_like(proj) * 0.1}
        lat = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 8, 4))
        t = jnp.array([100], jnp.int32)
        ref_lat = model.encode_images(params2, ref)
        emb = model.encode_image_embedding(
            params2, jnp.zeros((1, 16, 16, 3))
        )
        out0 = model.predict_noise(params2, lat, t, ref_lat)
        out1 = model.predict_noise(params2, lat, t, ref_lat, identity_embed=emb)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))

    def test_pipeline_use_identity(self, setup):
        model, params, ref, wav = setup
        pipe = EMOPipeline(model, clip_cfg())
        frames = pipe(params, ref, wav, video_length=2, use_identity=True)
        assert frames.shape == (1, 2, 32, 32, 3)
        assert np.isfinite(np.asarray(frames)).all()

    def test_training_feeds_identity_embed(self, setup):
        """The stage loss must CLIP-encode the reference image and feed it
        as identity_embed — otherwise the zero-init identity_embed_proj
        never receives gradient and inference --identity stays a silent
        no-op forever. Asserts nonzero grad on the projection kernel and
        that stage 1 marks it trainable."""
        import dataclasses as dc

        from emox.diffusion.schedule import make_schedule
        from emox.train.stages import stage_loss_fn, trainable_mask

        model, params, _, _ = setup
        cfg = clip_cfg()
        cfg = cfg.replace(train=dc.replace(cfg.train, uncond_ratio=0.0))
        loss_fn = stage_loss_fn(model, cfg, make_schedule(cfg.diffusion), 1)
        batch = {
            "images": jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3)) * 0.1,
            "ref_image": jax.random.normal(jax.random.PRNGKey(6), (2, 32, 32, 3)) * 0.1,
        }
        grads, _ = jax.grad(loss_fn, has_aux=True)(params, batch, jax.random.PRNGKey(7))
        g = np.asarray(grads["denoiser"]["identity_embed_proj"]["kernel"])
        assert np.abs(g).max() > 0.0
        mask = trainable_mask(params, 1)
        assert mask["denoiser"]["identity_embed_proj"]["kernel"]
