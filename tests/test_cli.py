"""CLI tests: parser wiring, config overrides, shipped YAML configs load."""

import glob
import os

import numpy as np
import pytest

from emox.cli import _load_audio, _load_image, _parse_overrides, build_parser
from emox.core.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestParser:
    def test_subcommands(self):
        p = build_parser()
        args = p.parse_args(["train", "--stage", "1"])
        assert args.stage == 1 and args.fn.__name__ == "cmd_train"
        args = p.parse_args(["infer", "--ref-image", "a.png", "--audio", "b.wav"])
        assert args.fn.__name__ == "cmd_infer"
        args = p.parse_args(["precompute", "--metadata", "m", "--videos", "v", "--cache", "c"])
        assert args.fn.__name__ == "cmd_precompute"
        args = p.parse_args(["bench", "--preset", "tiny"])
        assert args.fn.__name__ == "cmd_bench"

    def test_overrides(self):
        ov = _parse_overrides(["train.learning_rate=1e-3", "data.batch_size=8", "model.use_audio=false"])
        assert ov["train"]["learning_rate"] == 1e-3
        assert ov["data"]["batch_size"] == 8
        assert ov["model"]["use_audio"] is False

    def test_bad_override(self):
        with pytest.raises(SystemExit):
            _parse_overrides(["nodot=3"])


class TestShippedConfigs:
    @pytest.mark.parametrize("path", sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml"))))
    def test_loads(self, path):
        cfg = load_config(path)
        assert cfg.diffusion.num_train_timesteps == 1000

    def test_stage_values_match_reference(self):
        s1 = load_config(os.path.join(REPO, "configs", "stage1.yaml"))
        assert s1.train.learning_rate == 1e-4 and s1.data.batch_size == 4
        s2 = load_config(os.path.join(REPO, "configs", "stage2.yaml"))
        assert s2.train.learning_rate == 1e-5 and s2.data.num_frames == 8
        assert s2.audio.context_frames == 2
        s3 = load_config(os.path.join(REPO, "configs", "stage3.yaml"))
        assert s3.train.face_loss_weight == 0.5
        inf = load_config(os.path.join(REPO, "configs", "inference.yaml"))
        assert inf.inference.context_frames == 16 and inf.inference.context_overlap == 4
        assert inf.inference.guidance_scale == 7.5


class TestIO:
    def test_load_image_npy(self, tmp_path):
        p = str(tmp_path / "img.npy")
        np.save(p, np.zeros((16, 16, 3), np.float32))
        img = _load_image(p, 32, 32)
        assert img.shape == (32, 32, 3)

    def test_load_audio_wav(self, tmp_path):
        import wave

        p = str(tmp_path / "a.wav")
        pcm = (np.sin(np.linspace(0, 100, 8000)) * 20000).astype(np.int16)
        with wave.open(p, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes(pcm.tobytes())
        wav, sr = _load_audio(p, 16000)
        assert sr == 16000
        assert abs(len(wav) - 16000) <= 2  # resampled 1 s
