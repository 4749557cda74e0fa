"""Face-net bootstrap: trainer, shipped asset, FaceHelper.from_asset
(the trained replacement for the reference's MediaPipe FaceHelper,
reference Net.py:861-1156)."""

import numpy as np
import pytest

from emox.data.face import FaceHelper
from emox.data.fixtures import synthetic_face_batch, synthetic_face_frame
from emox.train.face_nets import load_face_nets, save_face_nets, train_face_nets


def test_generator_determinism_and_ranges():
    a = synthetic_face_frame(np.random.default_rng(5), 64, 64)
    b = synthetic_face_frame(np.random.default_rng(5), 64, 64)
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["image"].min() >= -1.0 and a["image"].max() <= 1.0
    assert set(np.unique(a["mask"])) <= {0.0, 1.0}
    assert a["landmarks"].shape == (6, 2)
    # nose (row 0) must sit inside the head mask
    y, x = (a["landmarks"][0] * 64).astype(int)
    assert a["mask"][y, x, 0] == 1.0


def test_train_smoke_and_roundtrip(tmp_path):
    params, metrics = train_face_nets(steps=3, batch_size=4, image_size=32, log_every=0)
    assert "val_landmark_mse" in metrics
    path = save_face_nets(params, str(tmp_path / "nets.npz"))
    loaded = load_face_nets(path)
    assert set(loaded) == {"face_locator", "landmarker"}
    # fp16 storage round-trip stays close
    k0 = params["face_locator"]["conv0"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(k0, np.float32), loaded["face_locator"]["conv0"]["kernel"], atol=2e-3
    )


def test_shipped_asset_quality():
    """The in-repo asset must actually localise synthetic faces: mask IoU
    and landmark error bars on a held-out distribution sample."""
    if load_face_nets() is None:
        pytest.skip("no shipped face-net asset")
    fh = FaceHelper.from_asset()
    rng = np.random.default_rng(123)
    batch = synthetic_face_batch(rng, 8, 128, 128)
    ious, errs = [], []
    for i in range(8):
        mask = fh.face_mask(batch["image"][i])
        inter = (mask * batch["mask"][i]).sum()
        union = np.maximum(mask, batch["mask"][i]).sum()
        ious.append(inter / union)
        lm = fh.landmark_fn(batch["image"][i])  # pixel (x, y)
        gt = batch["landmarks"][i] * 128  # (y, x)
        errs.append(np.abs(np.stack([lm[:, 1], lm[:, 0]], -1) - gt).mean())
    assert np.mean(ious) > 0.5, f"mask IoU too low: {np.mean(ious):.3f}"
    assert np.mean(errs) < 6.0, f"landmark err {np.mean(errs):.2f} px @128"


def test_asset_gives_nonzero_pose_series():
    if load_face_nets() is None:
        pytest.skip("no shipped face-net asset")
    from emox.data.fixtures import make_synthetic_clip

    fh = FaceHelper.from_asset()
    clip = make_synthetic_clip(seed=11, num_frames=8, height=64, width=64)
    speeds = fh.pose_speed_series(list(clip["frames"]), fps=25.0)
    assert speeds.shape == (8,)
    assert np.abs(speeds).max() > 0
