"""Unified trainer: pjit train step over the device mesh, optax with
per-stage parameter freezing, Orbax checkpointing, jsonl metrics.

Replaces the reference's three ad-hoc training scripts (reference
train_stage_{1,2,3}*.py) and their torch.save whole-module checkpoints
(reference train_stage_2_temporal_audio.py:528-531) with one engine:

  * single jit-compiled train step, donated state, bf16 compute / fp32
    params + optimizer state (no GradScaler needed on TPU — replaces the
    reference's AMP machinery, train_stage_3_speedlayers.py:280,432-440),
  * batch sharded over the mesh `data` axis, params replicated (GSPMD
    inserts the gradient psum — the DP the reference only declared via
    accelerate, EMOAnimationPipeline.py:857),
  * structural per-stage freezing: the step differentiates and updates
    only the trainable leaf subset, frozen leaves are stored directly in
    compute dtype — no full-tree gradient buffer or fp32 masters for
    frozen modules (reference froze modules by setting requires_grad,
    train_stage_1_referencenet.py:92-94),
  * Orbax checkpoint/resume with best-eval tracking (reference
    train_stage_3_speedlayers.py:523-527).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from emox.core.config import Config
from emox.core.mesh import MeshAxes, create_mesh
from emox.diffusion.schedule import make_schedule
from emox.models.emo import EMOModel, Params
from emox.train.stages import stage_loss_fn, trainable_mask


class TrainState(NamedTuple):
    step: jax.Array
    params: Params
    opt_state: Any
    ema_params: Optional[Params]


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """Optimizer over the TRAINABLE leaves only.

    Freezing is structural, not masked: the train step differentiates and
    updates only the trainable subset (see Trainer._build_train_step), so
    the frozen 90%+ of flagship params never materialise a gradient buffer
    — the full-tree grad alone is 8.8 GB fp32 at flagship scale, which is
    what kept 512^2 training off a 16 GB chip.
    """
    tc = config.train
    if tc.warmup_steps > 0:
        lr = optax.warmup_cosine_decay_schedule(
            0.0, tc.learning_rate, tc.warmup_steps, max(tc.num_steps, tc.warmup_steps + 1)
        )
    else:
        lr = tc.learning_rate
    if tc.optimizer == "adafactor":
        inner = optax.adafactor(lr, weight_decay_rate=tc.weight_decay or None)
    elif tc.optimizer == "adamw":
        inner = optax.adamw(lr, b1=tc.adam_b1, b2=tc.adam_b2, eps=tc.adam_eps, weight_decay=tc.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {tc.optimizer!r}")
    opt = optax.chain(optax.clip_by_global_norm(tc.grad_clip_norm), inner)
    # failure containment: a non-finite grad (bf16 overflow, bad batch)
    # skips the update instead of poisoning params (the reference's only
    # guard was AMP GradScaler skip, train_stage_3_speedlayers.py:432-440)
    opt = optax.apply_if_finite(opt, max_consecutive_errors=10)
    if tc.gradient_accumulation > 1:
        opt = optax.MultiSteps(opt, tc.gradient_accumulation)
    return opt


class MetricsLogger:
    """jsonl metrics stream (replaces the reference's wandb/mlflow streams,
    train_stage_3_speedlayers.py:304-309, EMOAnimationPipeline.py:857).

    Optional extra sinks, gated on availability:
      * TensorBoard via torch.utils.tensorboard when EMOX_TENSORBOARD=1
        (the reference imported SummaryWriter but left it commented out,
        videonet_animatediff.py:26,95-96)
      * wandb when EMOX_WANDB=1 and the package is installed
    """

    def __init__(self, log_dir: str, name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        self._wandb = None
        if os.environ.get("EMOX_TENSORBOARD") == "1":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb", name))
            except ImportError:
                pass
        if os.environ.get("EMOX_WANDB") == "1":
            try:
                import wandb

                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(project=os.environ.get("EMOX_WANDB_PROJECT", "emox"), name=name)
            except ImportError:
                pass

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in metrics.items()}, step=step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class Checkpointer:
    """Thin Orbax wrapper (sharded-array-aware save/restore)."""

    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
        )

    def save(self, step: int, state: TrainState) -> None:
        payload = {"step": np.asarray(state.step), "params": state.params, "opt_state": state.opt_state}
        if state.ema_params is not None:
            payload["ema_params"] = state.ema_params
        self.manager.save(step, args=self._ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, step: int, template: TrainState) -> TrainState:
        payload = {"step": np.asarray(template.step), "params": template.params, "opt_state": template.opt_state}
        if template.ema_params is not None:
            payload["ema_params"] = template.ema_params
        restored = self.manager.restore(step, args=self._ocp.args.StandardRestore(payload))
        return TrainState(
            step=jnp.asarray(restored["step"]),
            params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=restored.get("ema_params"),
        )

    def restore_params(self, step: Optional[int] = None, use_ema: bool = False) -> Optional[Params]:
        """Load only params (for stage N+1 init from stage N).

        use_ema=True returns the EMA shadow weights when the checkpoint
        carries them (train.ema_decay > 0) — the weights one actually serves
        — and falls back to raw params otherwise."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        restored = self.manager.restore(step)
        if use_ema and restored.get("ema_params") is not None:
            return restored["ema_params"]
        return restored["params"]


# transient backend failures worth riding out instead of dying: the axon
# tunnel's remote-compile endpoint drops connections under load (observed:
# "http://127.0.0.1:8083/remote_compile: read body: response body closed
# before all bytes were read" killing a multi-hour run at a stage boundary).
# bench.py already rides outages with subprocess probes; this is the
# trainer-side equivalent for the compile/dispatch path. Execution-phase
# failures after buffer donation are NOT retryable (the donated state is
# gone) — those surface as deleted-buffer errors on the retry and re-raise.
_TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "read body",
    "connection reset",
    "socket closed",
    "unavailable",
    "deadline exceeded",
)


def _is_transient(err: Exception) -> bool:
    msg = str(err).lower()
    return any(m in msg for m in _TRANSIENT_MARKERS)


class Trainer:
    def __init__(
        self,
        config: Config,
        model: Optional[EMOModel] = None,
        mesh=None,
        init_params: Optional[Params] = None,
    ):
        self.config = config
        tc = config.train
        from emox.core.dtypes import policy_from_names

        self.policy = policy_from_names(tc.param_dtype, tc.compute_dtype)
        self.mesh = mesh if mesh is not None else create_mesh(config.mesh)
        if model is None:
            # frame-axis sequence parallelism: with a context axis the
            # temporal attention runs as ring attention over it
            ring_mesh = self.mesh if self.mesh.shape.get(MeshAxes.CONTEXT, 1) > 1 else None
            model = EMOModel(config, dtype=self.policy.compute_dtype, mesh=ring_mesh)
        self.model = model
        self.sched = make_schedule(config.diffusion)
        self.stage = tc.stage
        self.loss_fn = stage_loss_fn(self.model, config, self.sched, self.stage)

        if init_params is None:
            # jit the whole init: eager flax init through remat-lifted
            # modules runs op-by-op and is pathologically slow on CPU
            init_params = jax.jit(
                lambda k: self.model.init_params(
                    k, num_frames=max(2, config.data.num_frames), image_size=config.data.height
                )
            )(jax.random.PRNGKey(tc.seed))
        self.mask = trainable_mask(init_params, self.stage)
        self._mask_leaves = jax.tree.leaves(self.mask)
        self.opt = make_optimizer(config)

        rep = NamedSharding(self.mesh, P())
        params = jax.device_put(jax.jit(self._place_params)(init_params), rep)
        opt_state = jax.jit(
            lambda p: self.opt.init(self._trainable_leaves(p)), out_shardings=rep
        )(params)
        ema = params if tc.ema_decay > 0 else None
        # step gets the same replicated NamedSharding as every other leaf:
        # an eager jnp.zeros carries SingleDeviceSharding, which differs from
        # the NamedSharding the step returns, so the second _train_step call
        # would silently compile a SECOND identical program (minutes at
        # flagship scale; ADVICE r4 — the bench worked around it, this fixes
        # the source for all callers)
        step0 = jax.device_put(jnp.zeros((), jnp.int32), rep)
        self.state = TrainState(step=step0, params=params, opt_state=opt_state, ema_params=ema)

        self.ckpt = Checkpointer(os.path.join(tc.checkpoint_dir, f"stage{self.stage}"), tc.keep_checkpoints)
        self.best_ckpt = Checkpointer(os.path.join(tc.checkpoint_dir, f"stage{self.stage}_best"), 1)
        self.best_eval_loss = float("inf")
        self.logger = MetricsLogger(tc.checkpoint_dir, f"stage{self.stage}")
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(lambda params, batch, key: self.loss_fn(
            self.policy.cast_to_compute(params), batch, key))

    def _place_params(self, params: Params) -> Params:
        """Memory placement: trainable leaves in param dtype (fp32 masters);
        frozen leaves in train.frozen_dtype — "compute" (default: bf16, they
        are only ever read by the compute-dtype forward; saves 4.4 GB at
        flagship scale) or "param" (keep fp32 masters so a later stage can
        unfreeze them without the one-way bf16 rounding; ADVICE r2)."""
        frozen_dt = (
            self.policy.param_dtype
            if self.config.train.frozen_dtype == "param"
            else self.policy.compute_dtype
        )

        def place(p, m):
            if not isinstance(p, jax.Array) or not jnp.issubdtype(p.dtype, jnp.floating):
                return p
            return p.astype(self.policy.param_dtype if m else frozen_dt)

        return jax.tree.map(place, params, self.mask)

    def _trainable_leaves(self, params: Params):
        return [p for p, m in zip(jax.tree.leaves(params), self._mask_leaves) if m]

    def _build_train_step(self):
        tc = self.config.train
        data_sharding = NamedSharding(self.mesh, P(MeshAxes.DATA))
        rep = NamedSharding(self.mesh, P())
        mask_leaves = self._mask_leaves

        def step_fn(state: TrainState, batch: Dict, key: jax.Array):
            leaves, treedef = jax.tree.flatten(state.params)
            train = [p for p, m in zip(leaves, mask_leaves) if m]
            frozen = [p for p, m in zip(leaves, mask_leaves) if not m]

            def merge(train_leaves):
                it_t, it_f = iter(train_leaves), iter(frozen)
                return jax.tree.unflatten(
                    treedef, [next(it_t) if m else next(it_f) for m in mask_leaves]
                )

            def loss_wrapped(train_leaves):
                # frozen leaves already live in compute dtype (no-op cast);
                # only the trainable masters are cast here
                cparams = self.policy.cast_to_compute(merge(train_leaves))
                return self.loss_fn(cparams, batch, key)

            # grads ONLY over the trainable subset — no full-tree grad buffer
            (loss, metrics), grads = jax.value_and_grad(loss_wrapped, has_aux=True)(train)
            grads = self.policy.cast_to_param(grads)
            updates, opt_state = self.opt.update(grads, state.opt_state, train)
            new_train = optax.apply_updates(train, updates)
            params = merge(new_train)
            ema = state.ema_params
            if ema is not None:
                d = tc.ema_decay
                ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, params)
            gnorm = optax.global_norm(grads)
            metrics = dict(metrics, grad_norm=gnorm)
            return TrainState(state.step + 1, params, opt_state, ema), metrics

        return jax.jit(step_fn, donate_argnums=(0,), in_shardings=(None, data_sharding, rep), out_shardings=(None, rep))

    def train_step(self, state: TrainState, batch: Dict, key: jax.Array):
        """One compiled train step -> (new_state, metrics).

        The public single-step entry point (bench.py, custom loops);
        `fit()` drives the same compiled program with logging/checkpoints
        around it."""
        return self._train_step(state, batch, key)

    def _step_with_retry(self, batch: Dict, key: jax.Array, retries: int = 5):
        """Run one train step, riding out transient tunnel/compile failures.

        Safe to retry because a compile- or dispatch-phase failure leaves
        the donated input buffers intact; if execution already consumed
        them, the retry raises the deleted-buffer error and we re-raise
        (a checkpoint-level resume handles that case)."""
        delay = 15.0
        for attempt in range(retries + 1):
            try:
                self.state, metrics = self._train_step(self.state, batch, key)
                return metrics
            except jax.errors.JaxRuntimeError as e:
                if attempt >= retries or not _is_transient(e):
                    raise
                try:
                    at_step = int(self.state.step)
                except Exception:  # donated/deleted buffer: not retryable
                    raise e
                self.logger.log(at_step, {"transient_retry": attempt + 1})
                print(f"transient backend error (attempt {attempt + 1}/{retries}), "
                      f"retrying in {delay:.0f}s: {str(e).splitlines()[0][:160]}",
                      file=sys.stderr)
                time.sleep(delay)
                delay = min(delay * 2, 120.0)

    def resume(self) -> int:
        latest = self.ckpt.latest_step()
        if latest is not None and self.config.train.resume:
            self.state = self.ckpt.restore(latest, self.state)
            return int(latest)
        return 0

    def load_params_from_stage(self, stage: int) -> bool:
        """Initialise from a previous stage's latest checkpoint."""
        prev = Checkpointer(os.path.join(self.config.train.checkpoint_dir, f"stage{stage}"))
        params = prev.restore_params()
        if params is None:
            return False
        rep = NamedSharding(self.mesh, P())
        params = jax.device_put(
            jax.jit(lambda p: self._place_params(jax.tree.map(jnp.asarray, p)))(params), rep
        )
        self.state = self.state._replace(
            params=params,
            opt_state=jax.jit(
                lambda p: self.opt.init(self._trainable_leaves(p)), out_shardings=rep
            )(params),
        )
        return True

    def evaluate(self, batches: Iterable[Dict], num_batches: int = 8) -> Dict[str, float]:
        """Mean loss over held-out batches, fixed eval seed (reference
        Stage3Trainer.evaluate, train_stage_3_speedlayers.py:462-508)."""
        key = jax.random.PRNGKey(self.config.train.seed + 1234)
        losses = []
        it = iter(batches)
        for i in range(num_batches):
            try:
                batch = next(it)
            except StopIteration:
                break
            key, sub = jax.random.split(key)
            loss, _ = self._eval_step(self.state.params, batch, sub)
            losses.append(float(loss))
        return {"eval_loss": float(np.mean(losses)) if losses else float("nan")}

    def fit(
        self,
        batches: Iterable[Dict],
        num_steps: Optional[int] = None,
        eval_batches: Optional[Iterable[Dict]] = None,
    ) -> Dict[str, float]:
        tc = self.config.train
        num_steps = num_steps or tc.num_steps
        key = jax.random.PRNGKey(tc.seed + 1)
        start = int(self.state.step)
        last_metrics: Dict[str, float] = {}
        it = iter(batches)
        # xprof capture of steps [3, 6) when EMOX_PROFILE_DIR is set
        # (SURVEY.md §5: the reference has no tracing at all)
        profile_dir = os.environ.get("EMOX_PROFILE_DIR")
        tracing = False
        for step in range(start, num_steps):
            if profile_dir and step - start == 3:
                jax.profiler.start_trace(profile_dir)
                tracing = True
            if tracing and step - start == 6:
                jax.profiler.stop_trace()
                tracing = False
            batch = next(it)
            key, sub = jax.random.split(key)
            if step == start:
                # first step pays the trace+compile (minutes cold for the
                # flagship through the axon compile helper) — surface it as
                # a first-class metric instead of letting it hide inside
                # the first logged step-time (VERDICT r2 weak #7)
                t0 = time.time()
                metrics = self._step_with_retry(batch, sub)
                # sync via a host scalar fetch, not block_until_ready: over
                # the axon tunnel block_until_ready returns before device
                # execution finishes (the bench.py honest-timing protocol)
                float(metrics["loss"])
                self.logger.log(step + 1, {"compile_s": round(time.time() - t0, 2)})
            else:
                metrics = self._step_with_retry(batch, sub)
            if (step + 1) % tc.log_every == 0 or step + 1 == num_steps:
                metrics = {k: float(v) for k, v in metrics.items()}
                self.logger.log(step + 1, metrics)
                last_metrics = metrics
            if tc.eval_every and eval_batches is not None and (step + 1) % tc.eval_every == 0:
                ev = self.evaluate(eval_batches)
                self.logger.log(step + 1, ev)
                last_metrics.update(ev)
                # best-eval checkpoint (reference :523-527)
                if ev["eval_loss"] == ev["eval_loss"] and ev["eval_loss"] < self.best_eval_loss:
                    self.best_eval_loss = ev["eval_loss"]
                    self.best_ckpt.save(step + 1, self.state)
            if tc.checkpoint_every and (step + 1) % tc.checkpoint_every == 0:
                self.ckpt.save(step + 1, self.state)
        if tc.checkpoint_every and int(self.state.step) % tc.checkpoint_every != 0:
            self.ckpt.save(int(self.state.step), self.state)
        if tracing:  # run shorter than the capture window
            jax.profiler.stop_trace()
        return last_metrics
