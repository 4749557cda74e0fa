"""Interop parity: PyTorch (diffusers/transformers conventions) -> Flax.

The strongest correctness evidence in the suite: random-init torch models
with diffusers/transformers state-dict naming are imported into emox models
and the forward passes must match numerically (the driver's "latent MSE vs
PyTorch reference" bar, BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from emox.core.config import AudioConfig, ModelConfig, VAEConfig
from emox.interop.torch_import import import_unet2d, import_vae, import_wav2vec2, merge_imported
from emox.models.audio import AudioEncoder
from emox.models.unet import UNet
from emox.models.vae import AutoencoderKL

from tests.torch_ref import TMiniUNet, TMiniVAE

torch.manual_seed(0)


def _sd(model) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestVAEParity:
    def test_encode_decode_match(self):
        tm = TMiniVAE(chans=(16, 32), num_res=1, groups=4).eval()
        cfg = VAEConfig(base_channels=16, channel_multipliers=(1, 2), num_res_blocks=1, norm_groups=4)
        vae = AutoencoderKL(cfg)
        x_np = np.random.default_rng(0).normal(size=(1, 16, 16, 3)).astype(np.float32)
        params = vae.init(jax.random.PRNGKey(0), jnp.asarray(x_np))["params"]
        imported = import_vae(_sd(tm), cfg)
        report = imported["__report__"]
        assert not report.missing_in_source, report.missing_in_source[:5]
        assert not report.unused_source_keys, report.unused_source_keys[:5]
        params = merge_imported(params, imported)

        with torch.no_grad():
            t_moments = tm.encode_moments(torch.from_numpy(x_np).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        dist = vae.apply({"params": params}, jnp.asarray(x_np), method=AutoencoderKL.encode)
        j_moments = np.concatenate([np.asarray(dist.mean), np.asarray(dist.logvar)], axis=-1)
        np.testing.assert_allclose(j_moments, t_moments, atol=2e-4, rtol=2e-4)

        z_np = np.random.default_rng(1).normal(size=(1, 8, 8, 4)).astype(np.float32)
        with torch.no_grad():
            t_dec = tm.decode(torch.from_numpy(z_np).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        j_dec = np.asarray(vae.apply({"params": params}, jnp.asarray(z_np), method=AutoencoderKL.decode))
        np.testing.assert_allclose(j_dec, t_dec, atol=2e-4, rtol=2e-4)


class TestUNetParity:
    def test_forward_match(self):
        tm = TMiniUNet(chans=(16, 32), layers=1, groups=4, heads=2, cross_dim=16).eval()
        cfg = ModelConfig(
            base_channels=16, channel_multipliers=(1, 2), layers_per_block=1, norm_groups=4,
            attention_heads=2, resnet_temb_mode="add", cross_attention_dim=16,
            attention_levels=(0, 1), use_temporal=False, use_audio=False,
            use_speed=False, use_face_mask=False, use_reference=False,
        )
        net = UNet(cfg)
        rng = np.random.default_rng(0)
        x_np = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
        ctx_np = rng.normal(size=(2, 3, 16)).astype(np.float32)
        t_np = np.array([7, 400], np.int64)
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(x_np), jnp.asarray(t_np), context=jnp.asarray(ctx_np))["params"]
        imported = import_unet2d(_sd(tm), cfg)
        report = imported["__report__"]
        assert not report.missing_in_source, report.missing_in_source[:8]
        assert not report.unused_source_keys, report.unused_source_keys[:8]
        params = merge_imported(params, imported)

        with torch.no_grad():
            t_out = tm(
                torch.from_numpy(x_np).permute(0, 3, 1, 2), torch.from_numpy(t_np), torch.from_numpy(ctx_np)
            ).permute(0, 2, 3, 1).numpy()
        j_out = np.asarray(
            net.apply({"params": params}, jnp.asarray(x_np), jnp.asarray(t_np), context=jnp.asarray(ctx_np)).sample
        )
        np.testing.assert_allclose(j_out, t_out, atol=5e-4, rtol=5e-4)

    def test_inflation_report_for_3d(self):
        """Importing 2D weights into the video denoiser leaves temporal/audio/
        speed/face params at init and reports them (strict=False semantics,
        reference unet_controlnet.py:516-523)."""
        tm = TMiniUNet(chans=(16, 32), layers=1, groups=4, heads=2, cross_dim=16).eval()
        cfg = ModelConfig(
            base_channels=16, channel_multipliers=(1, 2), layers_per_block=1, norm_groups=4,
            attention_heads=2, resnet_temb_mode="add", cross_attention_dim=16,
            attention_levels=(0, 1),
        )
        imported = import_unet2d(_sd(tm), cfg)
        report = imported["__report__"]
        assert not report.missing_in_source
        assert not report.unused_source_keys
        # merge into full 3D denoiser params: spatial sites load, the rest stay
        net = UNet(cfg)
        x = jnp.zeros((1, 2, 8, 8, 4))
        ts = jnp.zeros((1,), jnp.int32)
        audio = jnp.zeros((1, 2, 5, 768))
        params = net.init(
            jax.random.PRNGKey(0), x, ts, audio=audio, speeds=jnp.zeros((1, 2)),
            face_mask=jnp.zeros((1, 16, 16, 1)),
        )["params"]
        merged = merge_imported(params, imported)
        # a temporal param survives untouched (zero-init proj_out)
        tp = merged["down_0_0_temporal"]["proj_out"]["kernel"]
        np.testing.assert_allclose(np.asarray(tp), 0.0)


class TestWav2Vec2Parity:
    def test_forward_match_vs_transformers(self):
        """Import a random-init HuggingFace Wav2Vec2Model (tiny config) and
        match its forward output exactly."""
        from transformers import Wav2Vec2Config, Wav2Vec2Model

        hf_cfg = Wav2Vec2Config(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2, intermediate_size=128,
            conv_dim=(16,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2), conv_stride=(5, 2, 2, 2, 2, 2, 2),
            feat_extract_norm="group", do_stable_layer_norm=False,
            num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
            hidden_act="gelu", feat_extract_activation="gelu", layer_norm_eps=1e-6,
        )
        hf = Wav2Vec2Model(hf_cfg).eval()
        cfg = AudioConfig(hidden_dim=32, num_layers=2, num_heads=2, conv_dim=16)
        enc = AudioEncoder(cfg)
        wav = np.random.default_rng(0).normal(size=(1, 8000)).astype(np.float32)
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(wav))["params"]
        imported = import_wav2vec2(_sd(hf), cfg)
        report = imported["__report__"]
        assert not report.missing_in_source, report.missing_in_source[:8]
        params = merge_imported(params, imported)

        with torch.no_grad():
            t_out = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
        j_out = np.asarray(enc.apply({"params": params}, jnp.asarray(wav)))
        assert j_out.shape == t_out.shape
        np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-4)
