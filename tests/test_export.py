"""AOT export: serialize -> reload -> numerical identity (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emox.infer.export import export_denoise_step, load_exported, save_exported
from emox.models.emo import EMOModel
from test_models import tiny_config


class TestExport:
    @pytest.mark.slow  # >15 s CPU compile; fast tier: -m 'not slow'
    def test_roundtrip(self, tmp_path):
        cfg = tiny_config()
        model = EMOModel(cfg)
        T, size = 2, 32
        params = model.init_params(jax.random.PRNGKey(0), num_frames=T, image_size=size)
        exp = export_denoise_step(model, params, num_frames=T, image_size=size, dtype=jnp.float32)
        path = save_exported(exp, str(tmp_path / "step.bin"))
        fn = load_exported(path)

        lat = size // cfg.vae.downscale
        a_win = 2 * cfg.audio.context_frames + 1
        args = (
            params,
            jax.random.normal(jax.random.PRNGKey(1), (1, T, lat, lat, 4)),
            jnp.array([100], jnp.int32),
            jax.random.normal(jax.random.PRNGKey(2), (1, lat, lat, 4)),
            jax.random.normal(jax.random.PRNGKey(3), (1, T, a_win, cfg.audio.hidden_dim)),
            jnp.zeros((1, T)),
            jnp.ones((1, size, size, 1)),
        )
        out_loaded = fn(*args)
        out_direct = model.predict_noise(
            params, args[1], args[2], args[3], audio_windows=args[4], speeds=args[5], face_mask=args[6]
        )
        assert out_loaded.shape == (1, T, lat, lat, 4)
        np.testing.assert_allclose(np.asarray(out_loaded), np.asarray(out_direct), atol=2e-5)
