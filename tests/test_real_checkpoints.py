"""Gated REAL-pretrained-checkpoint integration tests (VERDICT r2 #7).

This environment cannot download runwayml/stable-diffusion-v1-5 or
facebook/wav2vec2-base-960h (zero egress), so layout parity is proven
against random-init torch models with exact upstream naming
(tests/test_interop.py). The day real files land, point these env vars at
them and the claim upgrades from "same layout" to "same weights":

  EMOX_SD15_VAE        diffusers AutoencoderKL state dict (.safetensors/.bin)
  EMOX_SD15_UNET       diffusers UNet2DConditionModel state dict
  EMOX_WAV2VEC2        transformers Wav2Vec2Model state dict
  EMOX_CLIP_TEXT       transformers CLIPTextModel state dict
  EMOX_CLIP_VISION     transformers CLIPVisionModelWithProjection state dict
  EMOX_CLIP_VOCAB      CLIP vocab (HF dir or openai bpe txt/gz)

Each test skips cleanly when its env var is absent. With diffusers /
transformers importable AND a real file present, the trajectory test also
cross-checks outputs against the torch model itself.
Documented in docs/PARITY.md.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _need(var: str) -> str:
    path = os.environ.get(var)
    if not path or not os.path.exists(path):
        pytest.skip(f"{var} not set / file absent (no real checkpoint in this env)")
    return path


def _sd15_model_config():
    from emox.core.config import ModelConfig

    return ModelConfig(
        base_channels=320, channel_multipliers=(1, 2, 4, 4), layers_per_block=2,
        norm_groups=32, attention_heads=8, resnet_temb_mode="add",
        cross_attention_dim=768, attention_levels=(0, 1, 2),
    )


class TestRealSD15:
    def test_vae_import_and_roundtrip(self):
        path = _need("EMOX_SD15_VAE")
        import jax.numpy as jnp

        from emox.core.config import VAEConfig
        from emox.interop.torch_import import import_vae, load_torch_state_dict
        from emox.models.vae import AutoencoderKL

        sd = load_torch_state_dict(path)
        tree = import_vae(sd, VAEConfig())
        report = tree.pop("__report__")
        assert not report.unused_source_keys, report.unused_source_keys[:10]
        vae = AutoencoderKL(VAEConfig())
        img = jnp.zeros((1, 64, 64, 3))
        dist = vae.apply({"params": tree}, img, method=AutoencoderKL.encode)
        z = dist.mode()
        out = vae.apply({"params": tree}, z, method=AutoencoderKL.decode)
        assert np.isfinite(np.asarray(out)).all()
        # a real VAE reconstructs a blank frame with low error
        assert float(np.abs(np.asarray(out) - np.asarray(img)).mean()) < 0.2

    def test_unet_import_clean(self):
        path = _need("EMOX_SD15_UNET")
        from emox.interop.torch_import import import_unet2d, load_torch_state_dict

        sd = load_torch_state_dict(path)
        tree = import_unet2d(sd, _sd15_model_config())
        report = tree.pop("__report__")
        assert not report.unused_source_keys, report.unused_source_keys[:10]
        video_only = ("_temporal", "_audio", "speed_embed", "face_mask_encoder", "null_context")
        bad = [p for p in report.missing_in_source if not any(v in p for v in video_only)]
        assert not bad, bad[:10]

    def test_denoise_trajectory_vs_torch(self):
        """Full cross-check: same weights, same noise, same DDIM schedule —
        emox latent trajectory vs the torch/diffusers UNet (driver bar:
        MSE <= 1e-2; random-init harness already achieves ~1e-12, see
        examples/golden_parity.py)."""
        unet_path = _need("EMOX_SD15_UNET")
        diffusers = pytest.importorskip("diffusers")
        import torch

        import jax.numpy as jnp

        from emox.diffusion.schedule import ddim_step, inference_timesteps, make_schedule
        from emox.core.config import Config, DiffusionConfig
        from emox.interop.torch_import import import_unet2d, load_torch_state_dict
        from emox.models.unet import UNet

        cfg = _sd15_model_config()
        tree = import_unet2d(load_torch_state_dict(unet_path), cfg)
        tree.pop("__report__")
        net = UNet(cfg)

        tnet = diffusers.UNet2DConditionModel.from_pretrained(
            os.path.dirname(unet_path), torch_dtype=torch.float32
        ) if os.path.isdir(os.path.dirname(unet_path)) else None
        if tnet is None:
            pytest.skip("torch UNet directory layout not available")
        tnet.eval()

        rng = np.random.default_rng(0)
        lat = rng.standard_normal((1, 32, 32, 4), np.float32)
        ctx = rng.standard_normal((1, 77, 768), np.float32) * 0.1
        sched = make_schedule(DiffusionConfig())
        ts = inference_timesteps(sched.num_train_timesteps, 5)
        ts_prev = np.concatenate([np.asarray(ts[1:]), [-1]])
        x_j = jnp.asarray(lat)
        x_t = torch.from_numpy(lat.transpose(0, 3, 1, 2))
        for t, tp in zip(np.asarray(ts), ts_prev):
            e_j = net.apply({"params": tree}, x_j, jnp.array([t]), context=jnp.asarray(ctx)).sample
            with torch.no_grad():
                e_t = tnet(x_t, torch.tensor([t]), encoder_hidden_states=torch.from_numpy(ctx)).sample
            x_j = ddim_step(sched, e_j, x_j, jnp.array([t]), jnp.array([int(tp)]))
            e_t_nhwc = e_t.numpy().transpose(0, 2, 3, 1)
            x_t_nhwc = np.asarray(
                ddim_step(sched, jnp.asarray(e_t_nhwc), jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)),
                          jnp.array([t]), jnp.array([int(tp)]))
            )
            x_t = torch.from_numpy(x_t_nhwc.transpose(0, 3, 1, 2))
        mse = float(np.mean((np.asarray(x_j) - x_t.numpy().transpose(0, 2, 3, 1)) ** 2))
        assert mse <= 1e-2, mse


class TestRealAudioAndCLIP:
    def test_wav2vec2_import(self):
        path = _need("EMOX_WAV2VEC2")
        import jax.numpy as jnp

        from emox.core.config import AudioConfig
        from emox.interop.torch_import import import_wav2vec2, load_torch_state_dict
        from emox.models.audio import AudioEncoder

        cfg = AudioConfig(hidden_dim=768, num_layers=12, num_heads=12, conv_dim=512)
        tree = import_wav2vec2(load_torch_state_dict(path), cfg)
        report = tree.pop("__report__")
        assert not report.unused_source_keys, report.unused_source_keys[:10]
        enc = AudioEncoder(cfg)
        out = enc.apply({"params": tree}, jnp.zeros((1, 16000)))
        assert np.isfinite(np.asarray(out)).all()

    def test_clip_text_import_and_known_embedding(self):
        path = _need("EMOX_CLIP_TEXT")
        import jax.numpy as jnp

        from emox.core.config import CLIPConfig
        from emox.data.tokenizer import CLIPTokenizer
        from emox.interop.torch_import import import_clip_text, load_torch_state_dict
        from emox.models.clip import CLIPTextEncoder

        cfg = CLIPConfig(text_enabled=True)
        tree = import_clip_text(load_torch_state_dict(path), cfg)
        report = tree.pop("__report__")
        assert not report.unused_source_keys, report.unused_source_keys[:10]
        tok = CLIPTokenizer()  # real vocab via EMOX_CLIP_VOCAB if set
        ids = jnp.asarray(tok.encode(["a photo of a talking head"]))
        out = CLIPTextEncoder(cfg).apply({"params": tree}, ids)
        assert out.shape == (1, 77, 768)
        assert np.isfinite(np.asarray(out)).all()

    def test_clip_vision_import(self):
        path = _need("EMOX_CLIP_VISION")
        import jax.numpy as jnp

        from emox.core.config import CLIPConfig
        from emox.interop.torch_import import import_clip_vision, load_torch_state_dict
        from emox.models.clip import CLIPVisionEncoder, clip_normalize

        cfg = CLIPConfig(vision_enabled=True)
        tree = import_clip_vision(load_torch_state_dict(path), cfg)
        report = tree.pop("__report__")
        assert not report.unused_source_keys, report.unused_source_keys[:10]
        img = clip_normalize(jnp.full((1, 224, 224, 3), 0.5))
        emb = CLIPVisionEncoder(cfg).apply({"params": tree}, img)
        assert emb.shape == (1, cfg.projection_dim)
        assert np.isfinite(np.asarray(emb)).all()
