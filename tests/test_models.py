"""Model-level tests: UNet site alignment, VAE shapes, audio alignment,
EMO composition (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emox.core.config import AudioConfig, Config, DataConfig, ModelConfig, VAEConfig
from emox.models.audio import AudioEncoder, align_audio_to_frames, audio_feature_rate
from emox.models.emo import EMOModel
from emox.models.unet import UNet, reference_net_config
from emox.models.vae import AutoencoderKL, DiagonalGaussian


def tiny_config() -> Config:
    return Config(
        vae=VAEConfig(base_channels=16, channel_multipliers=(1, 2), num_res_blocks=1, norm_groups=4, sample_size=32),
        model=ModelConfig(
            base_channels=16, channel_multipliers=(1, 2), layers_per_block=1, norm_groups=4,
            attention_head_dim=8, cross_attention_dim=16, attention_levels=(0, 1), audio_context_dim=32,
        ),
        audio=AudioConfig(hidden_dim=32, num_layers=1, num_heads=2, conv_dim=16),
        data=DataConfig(width=32, height=32, num_frames=2),
    )


@pytest.fixture(scope="module")
def emo():
    cfg = tiny_config()
    model = EMOModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
    return model, params


class TestVAE:
    def test_roundtrip_shapes(self):
        cfg = tiny_config().vae
        vae = AutoencoderKL(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
        params = vae.init(jax.random.PRNGKey(1), x)
        dist = vae.apply(params, x, method=AutoencoderKL.encode)
        assert dist.mean.shape == (1, 16, 16, 4)
        rec = vae.apply(params, dist.mode(), method=AutoencoderKL.decode)
        assert rec.shape == x.shape

    def test_diagonal_gaussian(self):
        moments = jnp.concatenate([jnp.zeros((1, 4, 4, 2)), jnp.zeros((1, 4, 4, 2))], -1)
        d = DiagonalGaussian(moments)
        np.testing.assert_allclose(np.asarray(d.kl()), 0.0, atol=1e-6)
        s = d.sample(jax.random.PRNGKey(0))
        assert s.shape == (1, 4, 4, 2)


class TestUNet:
    def test_ref_site_alignment(self):
        """Writer emits exactly the sites the reader consumes."""
        cfg = tiny_config().model
        ref_net = UNet(reference_net_config(cfg))
        ref_lat = jnp.zeros((1, 8, 8, 4))
        ts = jnp.zeros((1,), jnp.int32)
        rp = ref_net.init(jax.random.PRNGKey(0), ref_lat, ts, emit_ref=True)
        out = ref_net.apply(rp, ref_lat, ts, emit_ref=True)
        # sites: down attn (levels 0,1 x 1 layer) + mid + up (levels 0,1 x 2 layers)
        assert len(out.ref_features) == 2 + 1 + 4
        den = UNet(cfg)
        vid = jnp.zeros((1, 2, 8, 8, 4))
        dp = den.init(jax.random.PRNGKey(1), vid, ts, ref_features=out.ref_features)
        y = den.apply(dp, vid, ts, ref_features=out.ref_features)
        assert y.sample.shape == vid.shape

    def test_ref_features_change_output(self):
        cfg = tiny_config().model
        ref_net = UNet(reference_net_config(cfg))
        ts = jnp.zeros((1,), jnp.int32)
        r1 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        r2 = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4)) * 2
        rp = ref_net.init(jax.random.PRNGKey(1), r1, ts, emit_ref=True)
        f1 = ref_net.apply(rp, r1, ts, emit_ref=True).ref_features
        f2 = ref_net.apply(rp, r2, ts, emit_ref=True).ref_features
        den = UNet(cfg)
        vid = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8, 8, 4))
        dp = den.init(jax.random.PRNGKey(3), vid, ts, ref_features=f1)
        y1 = den.apply(dp, vid, ts, ref_features=f1).sample
        y2 = den.apply(dp, vid, ts, ref_features=f2).sample
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    @pytest.mark.slow  # >30 s CPU compile; fast tier: -m 'not slow'
    def test_ref_dropout_equals_no_ref(self):
        """ref_dropout=True rows == running with no ref features at all
        (K/V = [own, own] is exactly plain self-attention) — the true CFG
        uncond branch (reference mutual_self_attention.py:243-255)."""
        cfg = tiny_config().model
        ref_net = UNet(reference_net_config(cfg))
        ts = jnp.zeros((2,), jnp.int32)
        r = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        rp = ref_net.init(jax.random.PRNGKey(1), r[:1], ts[:1], emit_ref=True)
        feats = ref_net.apply(rp, r, ts, emit_ref=True).ref_features
        den = UNet(cfg)
        vid = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 8, 8, 4))
        dp = den.init(jax.random.PRNGKey(3), vid, ts, ref_features=feats)
        y_drop = den.apply(dp, vid, ts, ref_features=feats,
                           ref_dropout=jnp.array([True, True])).sample
        y_noref = den.apply(dp, vid, ts, ref_features=None).sample
        np.testing.assert_allclose(np.asarray(y_drop), np.asarray(y_noref), atol=1e-5, rtol=1e-5)
        # partial dropout: row 0 dropped matches no-ref, row 1 matches with-ref
        y_mixed = den.apply(dp, vid, ts, ref_features=feats,
                            ref_dropout=jnp.array([True, False])).sample
        y_ref = den.apply(dp, vid, ts, ref_features=feats).sample
        np.testing.assert_allclose(np.asarray(y_mixed[0]), np.asarray(y_noref[0]), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(y_mixed[1]), np.asarray(y_ref[1]), atol=1e-5, rtol=1e-5)
        assert not np.allclose(np.asarray(y_ref), np.asarray(y_noref))

    @pytest.mark.slow  # >15 s CPU compile; fast tier: -m 'not slow'
    def test_gn_ref_adain_transfer(self):
        """AdaIN GN-stat mode (reference mutual_self_attention.py:319-530):
        the writer emits per-site spatial mean/var banks; the reader
        renormalises to them. Uncond rows with style_fidelity=1 keep their
        own statistics (x_c term = x), matching the reference's uc_mask."""
        import dataclasses
        cfg = dataclasses.replace(tiny_config().model, use_gn_ref=True, style_fidelity=1.0)
        ref_net = UNet(reference_net_config(cfg))
        ts = jnp.zeros((2,), jnp.int32)
        r = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        rp = ref_net.init(jax.random.PRNGKey(1), r[:1], ts[:1], emit_ref=True)
        rout = ref_net.apply(rp, r, ts, emit_ref=True)
        assert rout.ref_gn is not None and len(rout.ref_gn) == len(rout.ref_features)
        for st in rout.ref_gn:
            assert st.shape[0] == 2 and st.shape[-1] == 2  # [B,1,1,C,2]
        den = UNet(cfg)
        vid = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 8, 8, 4))
        dp = den.init(jax.random.PRNGKey(3), vid, ts, ref_features=rout.ref_features)
        y_plain = den.apply(dp, vid, ts, ref_features=rout.ref_features).sample
        y_adain = den.apply(dp, vid, ts, ref_features=rout.ref_features, ref_gn=rout.ref_gn).sample
        assert not np.allclose(np.asarray(y_plain), np.asarray(y_adain)), "AdaIN must change the output"
        # all-dropped rows with style_fidelity=1.0: AdaIN is bypassed entirely
        y_drop_gn = den.apply(dp, vid, ts, ref_features=rout.ref_features, ref_gn=rout.ref_gn,
                              ref_dropout=jnp.array([True, True])).sample
        y_drop = den.apply(dp, vid, ts, ref_features=rout.ref_features,
                           ref_dropout=jnp.array([True, True])).sample
        np.testing.assert_allclose(np.asarray(y_drop_gn), np.asarray(y_drop), atol=1e-5, rtol=1e-5)

    def test_use_reference_flag_disables_ref(self):
        """ModelConfig.use_reference=False makes ref features a no-op."""
        import dataclasses
        cfg = tiny_config().model
        ref_net = UNet(reference_net_config(cfg))
        ts = jnp.zeros((1,), jnp.int32)
        r = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        rp = ref_net.init(jax.random.PRNGKey(1), r, ts, emit_ref=True)
        feats = ref_net.apply(rp, r, ts, emit_ref=True).ref_features
        vid = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8, 8, 4))
        den_off = UNet(dataclasses.replace(cfg, use_reference=False))
        dp = den_off.init(jax.random.PRNGKey(3), vid, ts, ref_features=feats)
        y_feats = den_off.apply(dp, vid, ts, ref_features=feats).sample
        y_none = den_off.apply(dp, vid, ts, ref_features=None).sample
        np.testing.assert_allclose(np.asarray(y_feats), np.asarray(y_none), atol=0, rtol=0)

    def test_single_frame_4d_input(self):
        cfg = tiny_config().model
        net = UNet(reference_net_config(cfg))
        x = jnp.zeros((2, 8, 8, 4))
        ts = jnp.zeros((2,), jnp.int32)
        p = net.init(jax.random.PRNGKey(0), x, ts)
        y = net.apply(p, x, ts)
        assert y.sample.shape == x.shape


class TestAudio:
    def test_encoder_shapes(self):
        cfg = tiny_config().audio
        enc = AudioEncoder(cfg)
        wav = jnp.zeros((1, 16000))
        p = enc.init(jax.random.PRNGKey(0), wav)
        feats = enc.apply(p, wav)
        assert feats.ndim == 3 and feats.shape[0] == 1 and feats.shape[2] == cfg.hidden_dim
        # ~49-50 feature frames for 1s at 16kHz with stride 320
        assert 45 <= feats.shape[1] <= 50

    def test_align_zero_padding(self):
        """Edge frames get zero-padded context (reference Net.py:656)."""
        feats = jnp.ones((1, 10, 4))
        win = align_audio_to_frames(feats, num_frames=3, feature_rate=2.0, video_fps=1.0, context=2)
        assert win.shape == (1, 3, 5, 4)
        w = np.asarray(win)
        # frame 0, offsets -2,-1 -> indices -4,-2 -> zero
        np.testing.assert_allclose(w[0, 0, 0], 0.0)
        np.testing.assert_allclose(w[0, 0, 1], 0.0)
        np.testing.assert_allclose(w[0, 0, 2], 1.0)

    def test_align_numpy_parity(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(2, 37, 8)).astype(np.float32)
        T, fps, rate, ctx = 5, 12.5, 49.0, 2
        win = np.asarray(align_audio_to_frames(jnp.asarray(feats), T, rate, fps, ctx))
        for f in range(T):
            for j, off in enumerate(range(-ctx, ctx + 1)):
                idx = int(np.round((f + off) / fps * rate))
                expect = feats[:, idx] if 0 <= idx < 37 else np.zeros((2, 8), np.float32)
                np.testing.assert_allclose(win[:, f, j], expect, atol=1e-6)


class TestEMOComposition:
    def test_full_forward(self, emo):
        model, params = emo
        img = jnp.zeros((1, 32, 32, 3))
        z = model.encode_images(params, img)
        assert z.shape == (1, 16, 16, 4)
        vid = jnp.zeros((1, 2, 16, 16, 4))
        aw = model.encode_audio(params, jnp.zeros((1, 16000)), 2)
        pred = model.predict_noise(
            params, vid, jnp.zeros((1,), jnp.int32), z, aw,
            speeds=jnp.zeros((1, 2)), face_mask=jnp.zeros((1, 32, 32, 1)),
        )
        assert pred.shape == vid.shape
        assert model.decode_latents(params, vid).shape == (1, 2, 32, 32, 3)

    def test_gn_ref_mode_through_predict_noise(self):
        """use_gn_ref threads writer AdaIN banks through EMOModel.predict_noise."""
        import dataclasses
        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, use_gn_ref=True))
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
        vid = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 16, 4))
        ref = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 4))
        ts = jnp.array([100])
        rout = model.reference_outputs(params, ref, ts)
        assert rout.ref_gn is not None
        pred = model.predict_noise(params, vid, ts, ref)
        assert pred.shape == vid.shape and bool(jnp.all(jnp.isfinite(pred)))

    def test_conditioning_is_identity_at_init(self, emo):
        """Zero-init audio/speed/face layers: removing them changes nothing
        at init (progressive-stage insertion safety)."""
        model, params = emo
        vid = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 4))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
        ts = jnp.array([100])
        aw = model.encode_audio(params, jax.random.normal(jax.random.PRNGKey(2), (1, 16000)), 2)
        with_cond = model.predict_noise(
            params, vid, ts, ref, aw, speeds=jnp.full((1, 2), 0.5),
            face_mask=jnp.ones((1, 32, 32, 1)),
        )
        without = model.predict_noise(params, vid, ts, ref)
        np.testing.assert_allclose(np.asarray(with_cond), np.asarray(without), atol=1e-5)


def test_face_feat_precompute_exact():
    """Pre-encoded face residual (EMOModel.encode_face_mask ->
    predict_noise(face_feat=)) must equal the in-step mask encoder
    EXACTLY (same submodule params, same math, computed once per clip)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emox.models.emo import EMOModel

    cfg = tiny_config()
    model = EMOModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
    lat_size = 32 // cfg.vae.downscale
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 2, lat_size, lat_size, 4))
    t = jnp.array([77], jnp.int32)
    ref = model.encode_images(params, jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 0.1)
    mask = (jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 1)) > 0.5).astype(jnp.float32)
    out_mask = model.predict_noise(params, lat, t, ref, face_mask=mask)
    ff = model.encode_face_mask(params, mask, lat.shape[2])
    out_feat = model.predict_noise(params, lat, t, ref, face_feat=ff)
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(out_feat))
