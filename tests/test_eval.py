"""Quality-metric tests (emox.eval).

The reference has no evaluation surface to mirror (SURVEY.md section 6);
these tests pin the metric definitions instead: known-value identities,
monotonicity under degradation, and — via the audio-correlated synthetic
fixtures (emox/data/fixtures.py builds mouth motion from the waveform
envelope, the correlation reference junk/AudioAttention/train.py:82-151
trains on) — that the sync proxy actually discriminates matched from
mismatched audio."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from emox.data.fixtures import make_synthetic_clip
from emox.eval import (
    audio_sync_score,
    evaluate_clip,
    frame_audio_envelope,
    frechet_distance,
    identity_similarity,
    pearson,
    psnr,
    ssim,
    temporal_flicker,
)


@pytest.fixture(scope="module")
def clip():
    return make_synthetic_clip(seed=0, num_frames=24, height=64, width=64)


class TestFidelity:
    def test_psnr_identical_capped(self):
        a = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32))
        assert float(psnr(a, a)) == pytest.approx(100.0)

    def test_psnr_monotonic_in_noise(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        lo = a + rng.normal(0, 0.01, a.shape).astype(np.float32)
        hi = a + rng.normal(0, 0.2, a.shape).astype(np.float32)
        assert float(psnr(jnp.asarray(lo), jnp.asarray(a))) > float(psnr(jnp.asarray(hi), jnp.asarray(a)))

    def test_ssim_identity_and_range(self):
        rng = np.random.default_rng(2)
        a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)
        b = rng.uniform(-1, 1, a.shape).astype(np.float32)
        s = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert -1.0 <= s < 0.5  # unrelated noise: structurally dissimilar

    def test_ssim_beats_psnr_on_structure(self):
        """Constant luminance shift: PSNR drops hard, SSIM stays high —
        the classic property separating the two metrics."""
        rng = np.random.default_rng(3)
        a = rng.uniform(-0.5, 0.5, (1, 32, 32, 3)).astype(np.float32)
        shifted = a + 0.2
        noisy = a + rng.normal(0, 0.2, a.shape).astype(np.float32)
        assert float(ssim(jnp.asarray(shifted), jnp.asarray(a))) > float(
            ssim(jnp.asarray(noisy), jnp.asarray(a))
        )

    def test_flicker_zero_for_identical_motion(self, clip):
        g = jnp.asarray(clip["frames"])
        assert float(temporal_flicker(g, g)) == 0.0
        # static video vs moving gt: all of gt's motion becomes mismatch
        frozen = jnp.broadcast_to(g[:1], g.shape)
        assert float(temporal_flicker(frozen, g)) > 0.0


class TestSync:
    def test_envelope_shape_and_norm(self, clip):
        env = frame_audio_envelope(jnp.asarray(clip["wav"]), 24, 640)
        assert env.shape == (24,)
        assert float(jnp.max(env)) == pytest.approx(1.0, abs=1e-5)

    def test_sync_discriminates_matched_audio(self, clip):
        other = make_synthetic_clip(seed=1, num_frames=24, height=64, width=64)
        g = jnp.asarray(clip["frames"])
        m = jnp.asarray(clip["face_masks"])
        matched = float(audio_sync_score(g, m, jnp.asarray(clip["wav"])))
        mismatched = float(audio_sync_score(g, m, jnp.asarray(other["wav"])))
        assert matched > 0.8  # mouth is driven by this envelope by construction
        assert matched > mismatched + 0.3

    def test_pearson_constant_series_is_zero(self):
        assert float(pearson(jnp.ones(8), jnp.arange(8.0))) == 0.0


class TestIdentity:
    def test_cosine_bounds(self):
        rng = np.random.default_rng(4)
        e = rng.normal(size=(6, 32)).astype(np.float32)
        assert float(identity_similarity(jnp.asarray(e), jnp.asarray(e[0]))) <= 1.0 + 1e-6
        same = np.broadcast_to(e[0], e.shape)
        assert float(identity_similarity(jnp.asarray(same), jnp.asarray(e[0]))) == pytest.approx(1.0, abs=1e-5)
        assert float(identity_similarity(jnp.asarray(-same), jnp.asarray(e[0]))) == pytest.approx(-1.0, abs=1e-5)


class TestFrechet:
    def test_matches_analytic_diagonal_case(self):
        """Diagonal-gaussian ground truth: FD = |mu_a - mu_b|^2 +
        sum_i (sqrt(v_a_i) - sqrt(v_b_i))^2."""
        from emox.eval import frechet_distance

        rng = np.random.default_rng(0)
        a = rng.normal(0, 1, (4000, 4)).astype(np.float32)
        assert float(frechet_distance(jnp.asarray(a), jnp.asarray(a[:2000]))) < 0.05
        b = a[2000:] * np.array([2.0, 1, 1, 1], np.float32) + np.array([3.0, 0, 0, 0], np.float32)
        fd = float(frechet_distance(jnp.asarray(a[:2000]), jnp.asarray(b)))
        assert fd == pytest.approx(3.0**2 + (1.0 - 2.0) ** 2, rel=0.1)

    def test_flattens_feature_dims(self):
        from emox.eval import frechet_distance

        rng = np.random.default_rng(1)
        a = rng.normal(size=(64, 2, 3)).astype(np.float32)
        b = rng.normal(size=(64, 2, 3)).astype(np.float32)
        assert np.isfinite(float(frechet_distance(jnp.asarray(a), jnp.asarray(b))))


class TestEvaluateClip:
    def test_keys_follow_inputs(self, clip):
        g = clip["frames"]
        out = evaluate_clip(g + 0.01, gt=g)
        assert set(out) == {"psnr_db", "ssim", "temporal_flicker"}
        out = evaluate_clip(g, gt=g, masks=clip["face_masks"], wav=clip["wav"])
        assert {"audio_sync", "gt_audio_sync"} <= set(out)
        assert all(isinstance(v, float) for v in out.values())

    def test_shape_mismatch_raises(self, clip):
        with pytest.raises(ValueError):
            evaluate_clip(clip["frames"][:, :32], gt=clip["frames"])

    def test_frechet_single_frame_raises(self):
        with pytest.raises(ValueError, match=">= 2 frames"):
            frechet_distance(jnp.ones((1, 4)), jnp.ones((3, 4)))


class TestCLI:
    def test_eval_command_end_to_end(self, tmp_path, clip):
        from emox.cli import main

        gt_path = os.path.join(tmp_path, "gt.npz")
        np.savez_compressed(
            gt_path, frames=clip["frames"], face_masks=clip["face_masks"],
            wav=clip["wav"], fps=25.0,
        )
        gen = np.clip(
            clip["frames"] + np.random.default_rng(0).normal(0, 0.05, clip["frames"].shape), -1, 1
        ).astype(np.float32)
        gen_path = os.path.join(tmp_path, "gen.npz")
        np.savez_compressed(gen_path, frames=gen)
        out_path = os.path.join(tmp_path, "metrics.json")
        rc = main(["eval", "--gen", gen_path, "--gt", gt_path, "--out", out_path])
        assert rc == 0
        with open(out_path) as f:
            m = json.load(f)
        assert m["psnr_db"] > 20.0
        assert m["ssim"] > 0.5
        assert m["audio_sync"] > 0.8

    def test_eval_npy_gt_and_fps_override(self, tmp_path, clip):
        """--gt <file>.npy must load as plain frames (np.load on .npy is
        an ndarray, not a context manager), and an explicit --fps must win
        over a gt cache's stored fps."""
        from emox.cli import main

        gt_npy = os.path.join(tmp_path, "gt.npy")
        np.save(gt_npy, clip["frames"][:4])
        gen_path = os.path.join(tmp_path, "gen.npz")
        np.savez_compressed(gen_path, frames=clip["frames"][:4] + 0.02)
        out_path = os.path.join(tmp_path, "m.json")
        assert main(["eval", "--gen", gen_path, "--gt", gt_npy, "--out", out_path]) == 0
        with open(out_path) as f:
            assert "psnr_db" in json.load(f)

        # fps flag vs cache fps: flag wins -> different audio_sync framing
        gt_npz = os.path.join(tmp_path, "gtf.npz")
        np.savez_compressed(gt_npz, frames=clip["frames"], face_masks=clip["face_masks"],
                            wav=clip["wav"], fps=25.0)
        o1, o2 = os.path.join(tmp_path, "m1.json"), os.path.join(tmp_path, "m2.json")
        assert main(["eval", "--gen", gen_path, "--gt", gt_npz, "--out", o1]) == 0
        assert main(["eval", "--gen", gen_path, "--gt", gt_npz, "--fps", "50", "--out", o2]) == 0
        with open(o1) as f1, open(o2) as f2:
            m1, m2 = json.load(f1), json.load(f2)
        assert m1["audio_sync"] != m2["audio_sync"]

    @pytest.mark.slow
    def test_eval_with_params_latent_frechet(self, tmp_path, clip):
        """--params wires the VAE-latent Frechet metric into the CLI."""
        import types

        import jax
        import yaml

        from emox.cli import main
        from emox.core.config import load_config
        from emox.models.emo import EMOModel
        from emox.train.trainer import Checkpointer

        tiny = {
            "vae": {"base_channels": 8, "channel_multipliers": [1, 2], "num_res_blocks": 1, "norm_groups": 4},
            "model": {"base_channels": 8, "channel_multipliers": [1, 2], "layers_per_block": 1,
                      "norm_groups": 4, "attention_head_dim": 4, "cross_attention_dim": 8,
                      "attention_levels": [1], "audio_context_dim": 16, "use_cross_attention": False},
            "audio": {"hidden_dim": 16, "num_layers": 1, "num_heads": 2, "conv_dim": 8},
            "data": {"width": 64, "height": 64},
        }
        cfg_path = os.path.join(tmp_path, "tiny.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(tiny, f)
        cfg = load_config(cfg_path)
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=64)
        ck = Checkpointer(os.path.join(tmp_path, "ckpt"))
        ck.save(0, types.SimpleNamespace(step=0, params=params, opt_state={"none": 0}, ema_params=None))
        ck.manager.wait_until_finished()

        gt_path = os.path.join(tmp_path, "gt.npz")
        np.savez_compressed(gt_path, frames=clip["frames"][:8], fps=25.0)
        gen_path = os.path.join(tmp_path, "gen.npz")
        np.savez_compressed(gen_path, frames=clip["frames"][:8] + 0.05)
        out_path = os.path.join(tmp_path, "m.json")
        rc = main(["eval", "--gen", gen_path, "--gt", gt_path,
                   "--params", os.path.join(tmp_path, "ckpt"), "--config", cfg_path,
                   "--out", out_path])
        assert rc == 0
        with open(out_path) as f:
            m = json.load(f)
        assert "latent_frechet" in m and np.isfinite(m["latent_frechet"])
