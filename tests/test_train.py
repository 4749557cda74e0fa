"""Trainer tests: per-stage freezing, loss decrease, checkpoint resume,
stage chaining — tiny configs on the CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emox.core.config import (
    AudioConfig, Config, DataConfig, DiffusionConfig, MeshConfig, ModelConfig, TrainConfig, VAEConfig,
)
from emox.data.dataset import DataLoader, EMODataset
from emox.data.fixtures import write_fixture_dataset
from emox.data.precompute import precompute_dataset
from emox.models.emo import EMOModel
from emox.train.stages import trainable_mask
from emox.train.trainer import Trainer



pytestmark = pytest.mark.slow  # multi-minute CPU compiles; fast tier: -m "not slow"

def tiny_config(tmp, stage=1, steps=4) -> Config:
    return Config(
        vae=VAEConfig(base_channels=8, channel_multipliers=(1, 2), num_res_blocks=1, norm_groups=4),
        model=ModelConfig(
            base_channels=8, channel_multipliers=(1, 2), layers_per_block=1, norm_groups=4,
            attention_head_dim=4, cross_attention_dim=8, attention_levels=(1,), audio_context_dim=16,
        ),
        audio=AudioConfig(hidden_dim=16, num_layers=1, num_heads=2, conv_dim=8),
        diffusion=DiffusionConfig(snr_gamma=5.0, noise_offset=0.05),
        mesh=MeshConfig(data=2, context=1, model=1),
        data=DataConfig(width=32, height=32, num_frames=2, batch_size=2),
        train=TrainConfig(
            stage=stage, num_steps=steps, learning_rate=1e-3, log_every=2,
            checkpoint_every=steps, checkpoint_dir=os.path.join(tmp, "ckpt"),
            compute_dtype="float32",
        ),
    )


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("traindata")
    vdir = d / "videos"
    meta = write_fixture_dataset(str(vdir), num_clips=2, num_frames=8, size=32)
    precompute_dataset(str(meta), str(vdir), str(d / "cache"), width=32, height=32)
    return str(d / "cache")


class TestMasks:
    def test_stage_masks_partition(self, tmp_path):
        cfg = tiny_config(str(tmp_path))
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
        for stage in (0, 1, 2, 3):
            mask = trainable_mask(params, stage)
            leaves = jax.tree.leaves(mask)
            assert any(leaves), f"stage {stage} trains nothing"
            assert not all(leaves), f"stage {stage} trains everything"
        m1 = trainable_mask(params, 1)
        # stage1: vae+audio frozen, temporal frozen
        assert not any(jax.tree.leaves(m1["vae"]))
        assert not any(jax.tree.leaves(m1["audio_encoder"]))
        assert any(jax.tree.leaves(m1["denoiser"]))
        m2 = trainable_mask(params, 2)
        assert not any(jax.tree.leaves(m2["reference_net"]))
        m3 = trainable_mask(params, 3)
        d3 = m3["denoiser"]
        assert any(jax.tree.leaves(d3["speed_embed"]))
        assert any(jax.tree.leaves(d3["face_mask_encoder"]))


class TestTraining:
    def _run(self, tmp, cache_dir, stage, stage_name, steps=4):
        cfg = tiny_config(tmp, stage=stage, steps=steps)
        trainer = Trainer(cfg)
        ds = EMODataset(cache_dir, stage_name, num_frames=2)
        dl = DataLoader(ds, batch_size=2, seed=0, prefetch=0)
        metrics = trainer.fit(dl, num_steps=steps)
        return trainer, metrics

    def test_stage0_facelocator(self, tmp_path, cache_dir):
        trainer, metrics = self._run(str(tmp_path), cache_dir, 0, "stage0-facelocator")
        assert np.isfinite(metrics["loss"])
        assert int(trainer.state.step) == 4

    def test_stage1_updates_only_trainable(self, tmp_path, cache_dir):
        cfg = tiny_config(str(tmp_path), stage=1, steps=2)
        trainer = Trainer(cfg)
        # deep-copy: the train step donates its input buffers
        before = jax.tree.map(lambda x: np.array(x, copy=True), trainer.state.params)
        ds = EMODataset(cache_dir, "stage1", num_frames=2)
        trainer.fit(DataLoader(ds, batch_size=2, seed=0, prefetch=0), num_steps=2)
        after = trainer.state.params
        # frozen: vae unchanged
        for b, a in zip(jax.tree.leaves(before["vae"]), jax.tree.leaves(after["vae"])):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
        # trained: denoiser conv_in changed
        assert not np.allclose(
            np.asarray(before["denoiser"]["conv_in"]["kernel"]),
            np.asarray(after["denoiser"]["conv_in"]["kernel"]),
        )
        # temporal frozen at stage1
        np.testing.assert_array_equal(
            np.asarray(before["denoiser"]["down_1_0_temporal"]["proj_out"]["kernel"]),
            np.asarray(after["denoiser"]["down_1_0_temporal"]["proj_out"]["kernel"]),
        )

    def test_stage2_and_3(self, tmp_path, cache_dir):
        t2, m2 = self._run(str(tmp_path), cache_dir, 2, "stage2", steps=2)
        assert np.isfinite(m2["loss"])
        t3, m3 = self._run(str(tmp_path) + "3", cache_dir, 3, "stage3", steps=2)
        assert np.isfinite(m3["loss"]) and "face_mse" in m3

    def test_checkpoint_resume(self, tmp_path, cache_dir):
        cfg = tiny_config(str(tmp_path), stage=1, steps=2)
        t1 = Trainer(cfg)
        ds = EMODataset(cache_dir, "stage1", num_frames=2)
        t1.fit(DataLoader(ds, batch_size=2, seed=0, prefetch=0), num_steps=2)
        assert t1.ckpt.latest_step() == 2
        t2 = Trainer(cfg)
        resumed = t2.resume()
        assert resumed == 2
        for a, b in zip(jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_stage_chaining(self, tmp_path, cache_dir):
        cfg1 = tiny_config(str(tmp_path), stage=1, steps=2)
        t1 = Trainer(cfg1)
        ds = EMODataset(cache_dir, "stage1", num_frames=2)
        t1.fit(DataLoader(ds, batch_size=2, seed=0, prefetch=0), num_steps=2)
        cfg2 = tiny_config(str(tmp_path), stage=2, steps=1)
        t2 = Trainer(cfg2)
        assert t2.load_params_from_stage(1)
        np.testing.assert_allclose(
            np.asarray(t2.state.params["denoiser"]["conv_in"]["kernel"]),
            np.asarray(t1.state.params["denoiser"]["conv_in"]["kernel"]),
        )

    def test_train_step_compiles_once(self, tmp_path, cache_dir):
        """Calls 1 and 2 share ONE compiled program (ADVICE r4): the init
        state's `step` leaf used to carry SingleDeviceSharding while the
        step output carried NamedSharding, so the second call silently
        compiled an identical second program (minutes at flagship scale)."""
        cfg = tiny_config(str(tmp_path), stage=1, steps=2)
        trainer = Trainer(cfg)
        ds = EMODataset(cache_dir, "stage1", num_frames=2)
        batch = next(iter(DataLoader(ds, batch_size=2, seed=0, prefetch=0)))
        key = jax.random.PRNGKey(0)
        state, _ = trainer.train_step(trainer.state, batch, key)
        state, _ = trainer.train_step(state, batch, key)
        assert trainer._train_step._cache_size() == 1

    def test_loss_decreases_overfit(self, tmp_path, cache_dir):
        """Overfit-one-batch sanity (the reference's declared test strategy,
        README.md:119-121): stage-1 loss drops over 30 steps."""
        cfg = tiny_config(str(tmp_path), stage=1, steps=30)
        cfg = cfg.replace(train=TrainConfig(
            stage=1, num_steps=30, learning_rate=3e-3, log_every=1,
            checkpoint_every=0, checkpoint_dir=os.path.join(str(tmp_path), "ck2"),
            compute_dtype="float32", seed=0,
        ))
        trainer = Trainer(cfg)
        ds = EMODataset(cache_dir, "stage1", num_frames=2)
        batch = next(iter(DataLoader(ds, batch_size=2, seed=0, prefetch=0)))
        losses = []
        key = jax.random.PRNGKey(0)
        for i in range(30):
            key, sub = jax.random.split(key)
            trainer.state, metrics = trainer._train_step(trainer.state, batch, sub)
            losses.append(float(metrics["loss"]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestMotionFrames:
    def test_dataset_motion_frames(self, cache_dir):
        ds = EMODataset(cache_dir, "stage2", num_frames=2, num_motion_frames=2)
        item = ds.sample(np.random.default_rng(0))
        assert item["motion_frames"].shape[0] == 2

    def test_stage2_loss_with_motion_frames(self, tmp_path, cache_dir):
        """Motion-frame priming: loss compiles, is finite, and masks the
        motion frames (loss equals the same batch without priming when the
        model ignores temporal context is NOT required — just shape/finite)."""
        from emox.diffusion.schedule import make_schedule
        from emox.models.emo import EMOModel
        from emox.train.stages import stage_loss_fn

        cfg = tiny_config(str(tmp_path), stage=2)
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=4, image_size=32)
        sched = make_schedule(cfg.diffusion)
        loss_fn = stage_loss_fn(model, cfg, sched, 2)
        ds = EMODataset(cache_dir, "stage2", num_frames=2, num_motion_frames=2)
        dl = DataLoader(ds, batch_size=2, seed=0, prefetch=0)
        batch = next(iter(dl))
        loss, metrics = loss_fn(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))


class TestEval:
    def test_evaluate_and_best_checkpoint(self, tmp_path, cache_dir):
        import dataclasses

        cfg = tiny_config(str(tmp_path), stage=1, steps=2)
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, eval_every=1))
        trainer = Trainer(cfg)
        ds = EMODataset(cache_dir, "stage1", num_frames=2)
        dl = DataLoader(ds, batch_size=2, seed=0, prefetch=0)
        ev_dl = DataLoader(ds, batch_size=2, seed=99, prefetch=0)
        m = trainer.fit(dl, num_steps=2, eval_batches=ev_dl)
        assert "eval_loss" in m and np.isfinite(m["eval_loss"])
        assert trainer.best_ckpt.latest_step() is not None


class TestStage5VAE:
    """Stage 5 (emox extension): VAE pretraining — the zero-weight stand-in
    for the reference's pretrained SD VAE (train_stage_1_referencenet.py:
    124-133 loads runwayml/sd-1.5; emox can also bootstrap its own)."""

    def test_mask_trains_only_vae(self, tmp_path):
        cfg = tiny_config(str(tmp_path))
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
        m5 = trainable_mask(params, 5)
        assert all(jax.tree.leaves(m5["vae"]))
        for top in ("denoiser", "reference_net", "audio_encoder", "face_locator"):
            if top in m5:
                assert not any(jax.tree.leaves(m5[top])), f"{top} must stay frozen at stage 5"

    def test_vae_loss_decreases_and_reports_latent_std(self, tmp_path, cache_dir):
        cfg = tiny_config(str(tmp_path), stage=5, steps=30)
        trainer = Trainer(cfg)
        ds = EMODataset(cache_dir, "stage1", num_frames=2)
        dl = DataLoader(ds, batch_size=2, seed=0, prefetch=0)
        it = iter(dl)
        # one manual step to capture the initial loss, then fit the rest
        batch = next(it)
        key = jax.random.PRNGKey(0)
        loss0, metrics0 = trainer.loss_fn(trainer.state.params, jax.tree.map(jnp.asarray, batch), key)
        metrics = trainer.fit(dl, num_steps=30)
        assert np.isfinite(metrics["loss"])
        assert metrics["loss"] < float(loss0), (metrics["loss"], float(loss0))
        assert metrics["latent_std"] > 0
        assert "recon_mse" in metrics and "kl" in metrics

    def test_stage5_chains_into_stage1(self, tmp_path, cache_dir):
        cfg5 = tiny_config(str(tmp_path), stage=5, steps=2)
        t5 = Trainer(cfg5)
        ds = EMODataset(cache_dir, "stage1", num_frames=2)
        t5.fit(DataLoader(ds, batch_size=2, seed=0, prefetch=0), num_steps=2)
        cfg1 = tiny_config(str(tmp_path), stage=1, steps=2)
        t1 = Trainer(cfg1, init_params=t5.state.params)
        vae_before = jax.tree.map(lambda x: np.array(x, copy=True), t1.state.params["vae"])
        m1 = t1.fit(DataLoader(ds, batch_size=2, seed=0, prefetch=0), num_steps=2)
        assert np.isfinite(m1["loss"])
        # the pretrained VAE stays frozen through stage 1
        for b, a in zip(jax.tree.leaves(vae_before), jax.tree.leaves(t1.state.params["vae"])):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    def test_vae_encode_mode_vs_sample(self, tmp_path, cache_dir):
        """vae_encode='mode' must bypass the posterior draw (the sample path
        and the mode path see different latents for the same RNG key)."""
        import dataclasses

        from emox.train.stages import stage_loss_fn
        from emox.diffusion.schedule import make_schedule

        cfg = tiny_config(str(tmp_path), stage=1, steps=1)
        model = EMOModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0), num_frames=2, image_size=32)
        ds = EMODataset(cache_dir, "stage1", num_frames=2)
        batch = jax.tree.map(jnp.asarray, next(iter(DataLoader(ds, batch_size=2, seed=0, prefetch=0))))
        sched = make_schedule(cfg.diffusion)
        key = jax.random.PRNGKey(3)
        l_sample, _ = stage_loss_fn(model, cfg, sched, 1)(params, batch, key)
        cfg_mode = cfg.replace(train=dataclasses.replace(cfg.train, vae_encode="mode"))
        l_mode, _ = stage_loss_fn(model, cfg_mode, sched, 1)(params, batch, key)
        l_mode2, _ = stage_loss_fn(model, cfg_mode, sched, 1)(params, batch, key)
        assert np.isfinite(float(l_sample)) and np.isfinite(float(l_mode))
        assert float(l_mode) == float(l_mode2)  # deterministic given the key
        assert float(l_sample) != float(l_mode)  # the draw actually differs
