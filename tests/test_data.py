"""Data pipeline tests: fixtures, face/pose math, precompute, dataset."""

import json
import os

import numpy as np
import pytest

from emox.data.dataset import DataLoader, EMODataset
from emox.data.face import (
    geometric_prior_mask,
    head_pose_from_landmarks,
    mask_from_bbox,
    mask_from_probability,
    pose_velocities,
)
from emox.data.fixtures import make_synthetic_clip, write_fixture_dataset
from emox.data.precompute import precompute_clip, precompute_dataset, resample_linear


class TestFixtures:
    def test_deterministic(self):
        a = make_synthetic_clip(seed=3, num_frames=4, height=32, width=32)
        b = make_synthetic_clip(seed=3, num_frames=4, height=32, width=32)
        np.testing.assert_array_equal(a["frames"], b["frames"])
        np.testing.assert_array_equal(a["wav"], b["wav"])

    def test_shapes_and_ranges(self):
        c = make_synthetic_clip(seed=0, num_frames=8, height=32, width=32, fps=25.0)
        assert c["frames"].shape == (8, 32, 32, 3)
        assert c["face_masks"].shape == (8, 32, 32, 1)
        assert c["wav"].shape == (int(16000 * 8 / 25),)
        assert c["pose_speeds"].shape == (8,)
        assert c["frames"].min() >= -1.001 and c["frames"].max() <= 1.001
        assert set(np.unique(c["face_masks"])) <= {0.0, 1.0}
        # audio-visual correlation exists: mouth pixels vary with envelope
        assert c["face_masks"].sum() > 0

    def test_write_dataset(self, tmp_path):
        meta = write_fixture_dataset(str(tmp_path), num_clips=2, num_frames=4, size=32)
        with open(meta) as f:
            m = json.load(f)
        assert len(m["clips"]) == 2
        for cid in m["clips"]:
            assert os.path.exists(tmp_path / f"{cid}.npz")


class TestFace:
    def test_head_pose_frontal(self):
        """Symmetric frontal landmarks -> near-zero yaw/roll."""
        h = w = 100
        lm = np.array([[50, 50], [50, 85], [30, 35], [70, 35], [38, 65], [62, 65]], np.float64)
        pose = head_pose_from_landmarks(lm, h, w)
        assert pose is not None
        _, yaw, roll = pose
        assert abs(yaw) < 10 and abs(roll) < 10

    def test_pose_velocities(self):
        poses = np.zeros((5, 3), np.float32)
        poses[2:] = [10, 0, 0]  # jump at frame 2
        v = pose_velocities(poses, fps=25.0)
        assert v[0] == 0 and v[1] == 0
        assert v[2] > 0 and v[3] == 0

    def test_pose_debug_overlay(self):
        """Axis overlay (reference Net.py:1077-1087 draw_axis): modifies
        pixels near the anchor, leaves the rest, preserves shape/range."""
        from emox.data.face import draw_pose_axes, pose_debug_overlay
        from emox.data.fixtures import make_synthetic_clip

        frame = np.full((64, 64, 3), -0.5, np.float32)
        out = draw_pose_axes(frame, np.array([0.0, 0.0, 0.0]), np.array([0.5, 0.5]))
        assert out.shape == frame.shape
        changed = np.argwhere((out != frame).any(-1))
        assert len(changed) > 0
        # zero pose: X axis runs right, Y axis runs down from the anchor
        assert (out[32, 40] == (1.0, -1.0, -1.0)).all()   # red to the right
        assert (out[40, 32] == (-1.0, 1.0, -1.0)).all()   # green downward
        assert (frame == -0.5).all()  # input untouched

        clip = make_synthetic_clip(seed=0, num_frames=4, height=64, width=64)
        ov = pose_debug_overlay(clip["frames"], clip["landmarks"])
        if ov is not None:  # None only when cv2 is absent
            assert ov.shape == clip["frames"][0].shape
            assert not np.array_equal(ov, clip["frames"][0])

    def test_masks(self):
        m = mask_from_bbox(32, 32, (8, 8, 24, 24), pad_ratio=0.0)
        assert m.shape == (32, 32, 1) and m.sum() == 16 * 16
        g = geometric_prior_mask(32, 32)
        assert g[16, 16, 0] == 1.0 and g[0, 0, 0] == 0.0
        prob = np.zeros((32, 32, 1), np.float32)
        prob[10:20, 12:22] = 0.9
        mp = mask_from_probability(prob)
        assert mp[15, 15, 0] == 1.0 and mp[2, 2, 0] == 0.0


class TestPrecompute:
    def test_resample(self):
        wav = np.sin(np.linspace(0, 20 * np.pi, 44100)).astype(np.float32)
        out = resample_linear(wav, 44100, 16000)
        assert abs(len(out) - 16000) <= 1

    def test_precompute_from_npz(self, tmp_path):
        clip = make_synthetic_clip(seed=0, num_frames=4, height=32, width=32)
        src = tmp_path / "clip.npz"
        np.savez_compressed(src, **clip)
        out = precompute_clip(str(src), str(tmp_path / "cache" / "clip.npz"))
        assert out["frames"].shape[0] == 4
        assert os.path.exists(tmp_path / "cache" / "clip.npz")

    def test_precompute_dataset(self, tmp_path):
        vdir = tmp_path / "videos"
        meta = write_fixture_dataset(str(vdir), num_clips=2, num_frames=4, size=32)
        man = precompute_dataset(meta, str(vdir), str(tmp_path / "cache"), width=32, height=32)
        with open(man) as f:
            manifest = json.load(f)
        assert len(manifest) == 2

    def test_precompute_dataset_resumes(self, tmp_path):
        # skip_existing: a re-run must not redo finished clips (CelebV-HQ
        # scale, reference README.md:113-117) but still manifest them all
        vdir = tmp_path / "videos"
        meta = write_fixture_dataset(str(vdir), num_clips=2, num_frames=4, size=32)
        cache = tmp_path / "cache"
        precompute_dataset(meta, str(vdir), str(cache), width=32, height=32)
        mtimes = {p.name: p.stat().st_mtime_ns for p in cache.glob("*.npz")}
        man = precompute_dataset(meta, str(vdir), str(cache), width=32, height=32)
        assert {p.name: p.stat().st_mtime_ns for p in cache.glob("*.npz")} == mtimes
        with open(man) as f:
            manifest = json.load(f)
        assert len(manifest) == 2 and all(v["frames"] == 4 for v in manifest.values())
        # a stale cache entry (older than its source) is redone
        src = sorted(vdir.glob("synthetic_*.npz"))[0]
        stale = cache / src.name
        os.utime(stale, ns=(0, 0))
        os.utime(src)
        precompute_dataset(meta, str(vdir), str(cache), width=32, height=32)
        assert stale.stat().st_mtime_ns > mtimes[stale.name]


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cache")
    vdir = d / "videos"
    meta = write_fixture_dataset(str(vdir), num_clips=2, num_frames=8, size=32)
    precompute_dataset(str(meta), str(vdir), str(d / "cache"), width=32, height=32)
    return str(d / "cache")


class TestDataset:
    def test_stage_keys(self, cache_dir):
        rng = np.random.default_rng(0)
        ds0 = EMODataset(cache_dir, "stage0-facelocator", num_frames=4)
        assert set(ds0.sample(rng)) >= {"images", "masks"}  # +landmarks when cached
        ds1 = EMODataset(cache_dir, "stage1", num_frames=4)
        assert set(ds1.sample(rng)) == {"images", "ref_image"}
        ds2 = EMODataset(cache_dir, "stage2", num_frames=4)
        s2 = ds2.sample(rng)
        assert set(s2) == {"frames", "ref_image", "wav"}
        assert s2["frames"].shape[0] == 4
        ds3 = EMODataset(cache_dir, "stage3", num_frames=4)
        s3 = ds3.sample(rng)
        assert set(s3) == {"frames", "ref_image", "wav", "speeds", "masks"}
        assert s3["speeds"].shape == (4,)

    def test_wav_slice_length_includes_context(self, cache_dir):
        ds = EMODataset(cache_dir, "stage2", num_frames=4, audio_context_frames=2, fps=25.0)
        s = ds.sample(np.random.default_rng(0))
        expect = int(round((4 + 4) * 16000 / 25.0))
        assert abs(len(s["wav"]) - expect) <= 2

    def test_loader_batching_deterministic(self, cache_dir):
        ds = EMODataset(cache_dir, "stage1", num_frames=4)
        dl1 = iter(DataLoader(ds, batch_size=3, seed=7, prefetch=0))
        dl2 = iter(DataLoader(ds, batch_size=3, seed=7, prefetch=0))
        b1, b2 = next(dl1), next(dl2)
        assert b1["images"].shape == (3, 32, 32, 3)
        np.testing.assert_array_equal(b1["images"], b2["images"])

    def test_stage0_landmarks_follow_augmentation(self, cache_dir):
        """Augmented stage-0 samples transform landmark targets through the
        SAME geometry as the image (incl. flip left/right point swap)."""
        from emox.data.augment import AugmentConfig

        ds = EMODataset(cache_dir, "stage0-facelocator",
                        augment=AugmentConfig(horizontal_flip=1.0, crop_scale_min=1.0, brightness=0, contrast=0))
        ds_plain = EMODataset(cache_dir, "stage0-facelocator")
        s_aug = ds.sample(np.random.default_rng(5))
        s_plain = ds_plain.sample(np.random.default_rng(5))
        if "landmarks" not in s_plain:
            pytest.skip("fixture cache has no landmarks")
        lm_a, lm_p = s_aug["landmarks"], s_plain["landmarks"]
        # full-frame crop + guaranteed flip: y equal, x mirrored, l/r swapped
        order = [0, 1, 3, 2, 5, 4]
        np.testing.assert_allclose(lm_a[:, 0], lm_p[order, 0], atol=1e-5)
        np.testing.assert_allclose(lm_a[:, 1], 1.0 - lm_p[order, 1], atol=1e-5)

    def test_stage3_missing_vel3_raises_clearly(self, cache_dir, tmp_path):
        """speed_axes=3 over a cache without pose_vel3 -> clear error, not a
        shape crash inside the jitted step."""
        import glob
        old = str(tmp_path / "old_cache")
        os.makedirs(old)
        for p in glob.glob(os.path.join(cache_dir, "*.npz")):
            clip = dict(np.load(p))
            clip.pop("pose_vel3", None)
            np.savez_compressed(os.path.join(old, os.path.basename(p)), **clip)
        ds = EMODataset(old, "stage3", num_frames=4, speed_axes=3)
        with pytest.raises(ValueError, match="pose_vel3"):
            ds.sample(np.random.default_rng(0))

    def test_loader_multi_worker(self, cache_dir):
        """num_workers>1: thread pool produces well-formed batches."""
        ds = EMODataset(cache_dir, "stage1", num_frames=4)
        it = iter(DataLoader(ds, batch_size=2, seed=3, prefetch=4, num_workers=3))
        for _ in range(6):
            b = next(it)
            assert b["images"].shape == (2, 32, 32, 3)
            assert np.isfinite(b["images"]).all()

    def test_bad_stage_raises(self, cache_dir):
        with pytest.raises(ValueError):
            EMODataset(cache_dir, "stage9")


class TestShardedRecords:
    def test_roundtrip_parity(self, cache_dir, tmp_path):
        """write_shards + ShardedClipStore reproduce the npz arrays exactly,
        including partial (indexed) reads."""
        from emox.data.records import ShardedClipStore, write_shards

        out = str(tmp_path / "rec")
        write_shards(cache_dir, out, shard_bytes=1 << 20)
        store = ShardedClipStore(out)
        import glob
        for path in sorted(glob.glob(os.path.join(cache_dir, "*.npz"))):
            cid = os.path.basename(path)[:-4]
            clip = dict(np.load(path))
            assert set(store.keys(cid)) == set(clip)
            for k, a in clip.items():
                np.testing.assert_array_equal(store.get(cid, k), a)
            np.testing.assert_array_equal(
                store.get(cid, "frames", [0, clip["frames"].shape[0] - 1]),
                clip["frames"][[0, clip["frames"].shape[0] - 1]],
            )

    def test_tiny_shard_size_splits(self, cache_dir, tmp_path):
        """shard_bytes smaller than a clip -> one shard per clip, all readable."""
        from emox.data.records import ShardedClipStore, write_shards

        out = str(tmp_path / "rec")
        write_shards(cache_dir, out, shard_bytes=1)
        store = ShardedClipStore(out)
        assert len(store._index["shards"]) == len(store.clip_ids)
        for cid in store.clip_ids:
            assert store.num_frames(cid) > 0
            assert np.isfinite(store.get(cid, "frames", [0])).all()

    def test_dataset_sharded_matches_npz(self, cache_dir, tmp_path):
        """EMODataset over the sharded store yields the same samples as over
        npz caches for the same seed, every stage."""
        from emox.data.records import write_shards

        out = str(tmp_path / "rec")
        write_shards(cache_dir, out)
        for stage in ("stage0-facelocator", "stage1", "stage2", "stage3"):
            a = EMODataset(cache_dir, stage, num_frames=4, num_motion_frames=2 if stage == "stage2" else 0)
            b = EMODataset(out, stage, num_frames=4, num_motion_frames=2 if stage == "stage2" else 0)
            assert b._store is not None
            sa = a.sample(np.random.default_rng(7))
            sb = b.sample(np.random.default_rng(7))
            assert set(sa) == set(sb)
            for k in sa:
                np.testing.assert_array_equal(sa[k], sb[k], err_msg=f"{stage}/{k}")


class TestAugment:
    def test_geometry_shared_between_frames_and_masks(self):
        from emox.data.augment import AugmentConfig, augment_clip

        rng = np.random.default_rng(3)
        t, h, w = 4, 32, 32
        frames = np.zeros((t, h, w, 3), np.float32)
        frames[:, :, : w // 2] = 1.0  # left half bright
        masks = np.zeros((t, h, w, 1), np.float32)
        masks[:, :, : w // 2] = 1.0  # left half masked
        cfg = AugmentConfig(horizontal_flip=1.0, brightness=0.0, contrast=0.0,
                            crop_scale_min=1.0, crop_scale_max=1.0)
        out_f, out_m = augment_clip(frames, masks, cfg, rng)
        # flip moved the bright half right — in BOTH frames and masks
        assert out_f[0, 0, -1, 0] > 0.5 and out_f[0, 0, 0, 0] < 0.5
        assert out_m[0, 0, -1, 0] == 1.0 and out_m[0, 0, 0, 0] == 0.0
        # identical geometry across all frames
        for i in range(1, t):
            np.testing.assert_array_equal(out_m[0], out_m[i])

    def test_disabled_is_identity(self):
        from emox.data.augment import AugmentConfig, augment_clip

        rng = np.random.default_rng(0)
        frames = np.random.default_rng(1).normal(size=(2, 8, 8, 3)).astype(np.float32)
        out_f, out_m = augment_clip(frames, None, AugmentConfig(enabled=False), rng)
        np.testing.assert_array_equal(out_f, frames)
        assert out_m is None

    def test_masks_stay_binary(self):
        from emox.data.augment import AugmentConfig, augment_clip

        rng = np.random.default_rng(0)
        frames = np.zeros((2, 16, 16, 3), np.float32)
        masks = (np.random.default_rng(2).random((2, 16, 16, 1)) > 0.5).astype(np.float32)
        _, out_m = augment_clip(frames, masks, AugmentConfig(), rng)
        assert set(np.unique(out_m)) <= {0.0, 1.0}

    def test_dataset_with_augment(self, cache_dir):
        from emox.data.augment import AugmentConfig
        from emox.data.dataset import EMODataset

        ds = EMODataset(cache_dir, "stage2", num_frames=2, augment=AugmentConfig())
        item = ds.sample(np.random.default_rng(0))
        assert item["frames"].shape[0] == 2
        assert np.abs(item["frames"]).max() <= 1.0


class TestVideoReader:
    def test_reader_roundtrip(self, tmp_path):
        pytest.importorskip("cv2")
        from emox.infer.video_io import VideoReader, save_video

        frames = (np.random.default_rng(0).random((5, 32, 32, 3)) * 2 - 1).astype(np.float32)
        path = str(tmp_path / "clip.mp4")
        out = save_video(frames, path, fps=10.0)
        if not out.endswith(".mp4"):
            pytest.skip("no mp4 encoder available")
        with VideoReader(out) as vr:
            assert vr.width == 32 and vr.height == 32
            assert abs(vr.fps - 10.0) < 0.5
            got = list(vr)
        assert len(got) == 5
        assert got[0].shape == (32, 32, 3)


class TestLandmarkProvider:
    def test_fixture_landmarks_consistent_with_mask(self):
        clip = make_synthetic_clip(seed=0, num_frames=4, height=64, width=64)
        lm = clip["landmarks"]
        assert lm.shape == (4, 6, 2)
        assert np.all(lm >= 0) and np.all(lm <= 1)
        # nose tip sits inside the face mask
        for f in range(4):
            y, x = (lm[f, 0] * 64).astype(int)
            assert clip["face_masks"][f, y, x, 0] == 1.0

    @pytest.mark.slow  # >15 s CPU compile; fast tier: -m 'not slow'
    def test_landmark_net_trains_on_fixtures(self):
        """Stage-0 joint training: landmark MSE decreases on fixture clips
        (the trained MediaPipe replacement, VERDICT item 4)."""
        import jax
        import jax.numpy as jnp
        import optax

        from emox.models.emo import EMOModel
        from emox.train.stages import stage_loss_fn, trainable_mask
        from emox.diffusion.schedule import make_schedule
        from tests.test_models import tiny_config

        cfg = tiny_config()
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
        loss_fn = stage_loss_fn(model, cfg, make_schedule(cfg.diffusion), 0)
        mask = trainable_mask(params, 0)
        assert any(jax.tree.leaves(mask["landmarker"])), "landmarker must train in stage 0"

        clip = make_synthetic_clip(seed=1, num_frames=8, height=32, width=32)
        batch = {
            "images": clip["frames"],
            "masks": clip["face_masks"],
            "landmarks": clip["landmarks"],
        }
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, metrics

        key = jax.random.PRNGKey(2)
        first = None
        for i in range(30):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, sub)
            if first is None:
                first = float(metrics["landmark_mse"])
        last = float(metrics["landmark_mse"])
        assert last < first * 0.7, (first, last)

    def test_face_helper_from_model(self):
        import jax

        from emox.models.emo import EMOModel
        from emox.data.face import FaceHelper
        from tests.test_models import tiny_config

        model = EMOModel(tiny_config())
        params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
        fh = FaceHelper.from_model(model, params)
        frame = make_synthetic_clip(seed=0, num_frames=1, height=32, width=32)["frames"][0]
        m = fh.face_mask(frame)
        assert m.shape == (32, 32, 1)
        lm = fh.landmark_fn(frame)
        assert lm.shape == (6, 2)
        pose = fh.head_pose(frame)
        assert pose is None or pose.shape == (3,)

    def test_from_landmark_file_and_precompute(self, tmp_path):
        """precompute_clip with a sibling .landmarks.npy export: masks come
        from the landmark extent (not the ellipse prior) and pose speeds
        are non-zero for a moving head."""
        from emox.data.face import geometric_prior_mask

        clip = make_synthetic_clip(seed=2, num_frames=8, height=64, width=64)
        src = tmp_path / "clip.npz"
        # drop fixture masks/speeds so precompute must derive them
        np.savez(src, frames=clip["frames"], wav=clip["wav"])
        lm_px = clip["landmarks"][:, :, ::-1] * 64.0  # (y,x)->(x,y) pixels
        np.save(tmp_path / "clip.landmarks.npy", lm_px)
        out = precompute_clip(str(src), str(tmp_path / "out.npz"), width=64, height=64)
        prior = geometric_prior_mask(64, 64)
        assert not np.allclose(out["face_masks"][0], prior), "mask must come from landmarks"
        assert np.any(out["pose_speeds"] > 0), "moving head must yield non-zero speeds"
        assert out["pose_vel3"].shape == (8, 3)
        assert np.any(np.abs(out["pose_vel3"]) > 0)

    @pytest.mark.slow  # >15 s CPU compile; fast tier: -m 'not slow'
    def test_per_axis_speed_model(self):
        """speed_axes=3 model consumes [B, T, 3] signed velocities."""
        import dataclasses
        import jax
        import jax.numpy as jnp

        from emox.models.emo import EMOModel
        from tests.test_models import tiny_config

        cfg = tiny_config()
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, speed_axes=3))
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
        lat = jnp.zeros((1, 2, 8, 8, 4))
        ref = jnp.zeros((1, 8, 8, 4))
        v3 = jnp.ones((1, 2, 3)) * 0.3
        out = model.predict_noise(params, lat, jnp.zeros((1,), jnp.int32), ref, speeds=v3)
        assert out.shape == lat.shape
        # direction matters: opposite yaw gives a different prediction after
        # perturbing the zero-init speed head
        params2 = jax.tree.map(lambda x: x, params)
        params2["denoiser"]["speed_embed"]["fc2"]["kernel"] = (
            jnp.ones_like(params2["denoiser"]["speed_embed"]["fc2"]["kernel"]) * 0.01
        )
        o1 = model.predict_noise(params2, lat, jnp.zeros((1,), jnp.int32), ref, speeds=v3)
        o2 = model.predict_noise(params2, lat, jnp.zeros((1,), jnp.int32), ref, speeds=-v3)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestLRUCache:
    def test_bounded_memory(self, cache_dir):
        ds = EMODataset(cache_dir, stage="stage1", max_cached_clips=1)
        rng = np.random.default_rng(0)
        for _ in range(8):
            ds.sample(rng)
        assert len(ds._cache) <= 1

    def test_lru_evicts_oldest(self, tmp_path):
        vdir = tmp_path / "v"
        meta = write_fixture_dataset(str(vdir), num_clips=3, num_frames=4, size=16)
        precompute_dataset(str(meta), str(vdir), str(tmp_path / "c"), width=16, height=16)
        ds = EMODataset(str(tmp_path / "c"), stage="stage1", max_cached_clips=2)
        for _, path in ds.clips:
            ds._load(path)
        assert len(ds._cache) == 2
        # most-recently-used stays
        assert ds.clips[-1][1] in ds._cache


def test_precompute_writes_control_render(tmp_path):
    """precompute must write dense 'control' pose renders whenever it has a
    landmark series, and the stage-4 dataset must consume THEM (not the
    face-mask fallback) with augmentation-aligned geometry (VERDICT r2
    missing #8 / ADVICE r2 medium)."""
    import numpy as np

    from emox.data.dataset import EMODataset
    from emox.data.fixtures import make_synthetic_clip
    from emox.data.precompute import precompute_clip

    clip = make_synthetic_clip(seed=3, num_frames=6, height=32, width=32)
    src = tmp_path / "clip.npz"
    np.savez(src, **clip)
    out = precompute_clip(str(src), str(tmp_path / "cache" / "clip.npz"), width=32, height=32)
    assert "control" in out and out["control"].shape == (6, 32, 32, 3)
    assert out["control"].max() > 0.5  # blobs/lines actually drawn

    ds = EMODataset(str(tmp_path / "cache"), "stage4-control", num_frames=2)
    item = ds.sample(np.random.default_rng(0))
    assert item["control"].shape == (2, 32, 32, 3)
    # the render, not the binary mask fallback: contains intermediate values
    vals = np.unique(item["control"])
    assert ((vals > 0.01) & (vals < 0.99)).any()


def test_stage4_mixed_control_sources_batch(tmp_path):
    """A cache mixing clips WITH precomputed 'control' renders and clips
    WITHOUT (mask fallback) must still batch for stage 4: the fallback is
    tiled to the render's 3 channels so np.stack sees one shape and the
    ControlNet cond conv sees control_cond_channels=3 either way."""
    import numpy as np

    from emox.data.dataset import DataLoader, EMODataset
    from emox.data.fixtures import make_synthetic_clip
    from emox.data.precompute import precompute_clip

    clip = make_synthetic_clip(seed=5, num_frames=4, height=32, width=32)
    src = tmp_path / "src.npz"
    np.savez(src, **clip)
    cache = tmp_path / "cache"
    precompute_clip(str(src), str(cache / "with_control.npz"), width=32, height=32)
    precompute_clip(str(src), str(cache / "no_control.npz"), width=32, height=32,
                    with_control=False)

    ds = EMODataset(str(cache), "stage4-control", num_frames=2)
    dl = DataLoader(ds, batch_size=8, seed=0, prefetch=0)
    batch = next(iter(dl))
    assert batch["control"].shape == (8, 2, 32, 32, 3)
    assert batch["control"].dtype == np.float32
    assert batch["control"].min() >= 0.0 and batch["control"].max() <= 1.0


def test_stage0_mixed_annotation_batch(tmp_path):
    """Batches over caches mixing annotated and bare clips must keep the
    landmarks key with a per-item validity flag (ADVICE r2)."""
    import numpy as np

    from emox.data.dataset import DataLoader, EMODataset
    from emox.data.fixtures import make_synthetic_clip

    cache = tmp_path / "cache"
    cache.mkdir()
    a = make_synthetic_clip(seed=0, num_frames=4, height=32, width=32)
    np.savez(cache / "with_lm.npz", **a)
    b = {k: v for k, v in a.items() if k != "landmarks"}
    np.savez(cache / "no_lm.npz", **b)
    ds = EMODataset(str(cache), "stage0-facelocator")
    dl = DataLoader(ds, batch_size=8, seed=0, prefetch=0)
    batch = next(iter(dl))
    assert "landmarks" in batch and "landmarks_valid" in batch
    assert batch["landmarks"].shape == (8, 6, 2)
    assert set(np.unique(batch["landmarks_valid"])) <= {0.0, 1.0}


def test_bare_clip_gets_trained_masks_and_speeds(tmp_path):
    """VERDICT r2 missing #2 done-criterion: precompute on a BARE clip (no
    face_masks / landmarks / pose keys, no sibling .landmarks.npy, no
    --face-ckpt) must fall back to the SHIPPED trained face nets and
    produce masks != the geometric ellipse prior and |pose_speeds| > 0."""
    import numpy as np

    from emox.data.face import geometric_prior_mask
    from emox.data.fixtures import make_synthetic_clip
    from emox.data.precompute import precompute_clip
    from emox.train.face_nets import load_face_nets

    if load_face_nets() is None:
        import pytest

        pytest.skip("no shipped face-net asset")

    clip = make_synthetic_clip(seed=7, num_frames=8, height=64, width=64)
    bare = {"frames": clip["frames"], "wav": clip["wav"]}  # nothing else
    src = tmp_path / "bare.npz"
    np.savez(src, **bare)
    out = precompute_clip(str(src), str(tmp_path / "cache" / "bare.npz"), width=64, height=64)

    prior = geometric_prior_mask(64, 64)
    masks = out["face_masks"]
    # masks must track the moving head, not the static centre ellipse
    per_frame_diff = np.abs(masks - prior[None]).mean(axis=(1, 2, 3))
    assert per_frame_diff.max() > 0.02, f"masks identical to prior ({per_frame_diff})"
    # and they should actually overlap the true head region decently
    inter = (masks * clip["face_masks"]).sum()
    union = np.maximum(masks, clip["face_masks"]).sum()
    assert inter / union > 0.3, f"IoU vs GT head too low: {inter/union:.3f}"
    # nonzero head-pose velocities from the landmark series
    assert np.abs(out["pose_speeds"]).max() > 0
    assert np.abs(out["pose_vel3"]).max() > 0
    # control renders written too (landmarks came from the trained net)
    assert "control" in out and out["control"].max() > 0.5


class TestVideoGrid:
    def test_tile_video_grid_layout(self):
        from emox.infer.video_io import tile_video_grid

        b, t, h, w = 5, 3, 8, 6
        videos = np.stack([np.full((t, h, w, 3), i / 4.0, np.float32) for i in range(b)])
        grid = tile_video_grid(videos, n_cols=3, pad=2, pad_value=-1.0)
        # 5 clips in 3 cols -> 2 rows; borders of 2px between and around
        assert grid.shape == (t, 2 * (h + 2) + 2, 3 * (w + 2) + 2, 3)
        # cell (row 1, col 1) holds clip index 4
        assert np.allclose(grid[:, 2 + (h + 2) : 2 + (h + 2) + h, 2 + (w + 2) : 2 + (w + 2) + w], 1.0)
        # padding stays pad_value
        assert np.allclose(grid[:, :2, :], -1.0)

    def test_tile_rejects_wrong_rank(self):
        from emox.infer.video_io import tile_video_grid

        with pytest.raises(ValueError):
            tile_video_grid(np.zeros((3, 8, 6, 3), np.float32))

    def test_save_videos_grid_writes(self, tmp_path):
        from emox.infer.video_io import save_videos_grid

        videos = (np.random.default_rng(0).random((4, 2, 16, 16, 3)) * 2 - 1).astype(np.float32)
        out = save_videos_grid(videos, str(tmp_path / "grid.npz"), fps=8.0, n_cols=2)
        data = np.load(out)
        assert data["frames"].shape == (2, 2 * 18 + 2, 2 * 18 + 2, 3)
