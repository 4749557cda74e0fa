"""Noise schedules + denoise steps as pure functions.

DDPM/DDIM with the reference's hyperparameters (1000 train steps,
scaled_linear betas 0.00085 -> 0.012, reference
train_stage_1_referencenet.py:145-150) plus the training-loss shaping the
reference configures (min-SNR gamma, zero-terminal-SNR rescale, noise
offset — reference configs/training/stage0.yaml). No scheduler objects with
mutable state: a Schedule is an immutable pytree of precomputed tables and
every step is a pure function, scan/jit friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from emox.core.config import DiffusionConfig


class Schedule(NamedTuple):
    betas: jax.Array  # [T]
    alphas_cumprod: jax.Array  # [T]
    num_train_timesteps: int
    prediction_type: str


def _betas(cfg: DiffusionConfig) -> jax.Array:
    T = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        return jnp.linspace(cfg.beta_start, cfg.beta_end, T, dtype=jnp.float64)
    if cfg.beta_schedule == "scaled_linear":
        return jnp.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, T, dtype=jnp.float64) ** 2
    if cfg.beta_schedule == "squaredcos_cap_v2":
        t = jnp.arange(T + 1, dtype=jnp.float64) / T
        f = jnp.cos((t + 0.008) / 1.008 * jnp.pi / 2) ** 2
        return jnp.clip(1.0 - f[1:] / f[:-1], 0.0, 0.999)
    raise ValueError(f"unknown beta schedule {cfg.beta_schedule!r}")


def _rescale_zero_terminal_snr(acp: jax.Array) -> jax.Array:
    """Shift/scale sqrt(alpha_bar) so the final step has zero SNR
    (arXiv:2305.08891; reference stage0.yaml zero-SNR flag)."""
    s = jnp.sqrt(acp)
    s0, sT = s[0], s[-1]
    s = s - sT
    s = s * s0 / (s0 - sT)
    return s**2


def make_schedule(cfg: DiffusionConfig) -> Schedule:
    betas = _betas(cfg)
    acp = jnp.cumprod(1.0 - betas)
    if cfg.zero_terminal_snr:
        acp = _rescale_zero_terminal_snr(acp)
        betas = 1.0 - acp / jnp.concatenate([jnp.ones(1, acp.dtype), acp[:-1]])
    return Schedule(
        betas=betas.astype(jnp.float32),
        alphas_cumprod=acp.astype(jnp.float32),
        num_train_timesteps=cfg.num_train_timesteps,
        prediction_type=cfg.prediction_type,
    )


def _gather(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """table[t] broadcast to an ndim-shaped batch factor."""
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def add_noise(sched: Schedule, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
    acp = _gather(sched.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise


def get_velocity(sched: Schedule, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
    acp = _gather(sched.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * x0


def snr(sched: Schedule, t: jax.Array) -> jax.Array:
    acp = sched.alphas_cumprod[t]
    return acp / (1.0 - acp)


def min_snr_loss_weight(sched: Schedule, t: jax.Array, gamma: float) -> jax.Array:
    """Min-SNR-gamma weighting (arXiv:2303.09556; reference stage0.yaml
    snr_gamma: 5.0). Returns per-sample weights; gamma<=0 -> ones."""
    if gamma <= 0:
        return jnp.ones_like(t, dtype=jnp.float32)
    s = snr(sched, t)
    w = jnp.minimum(s, gamma) / jnp.maximum(s, 1e-8)
    if sched.prediction_type == "v_prediction":
        w = jnp.minimum(s, gamma) / (s + 1.0)
    return w


def pred_to_x0(sched: Schedule, model_out: jax.Array, sample: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Convert model output to (x0, epsilon) under the prediction type."""
    acp = _gather(sched.alphas_cumprod, t, sample.ndim)
    sqrt_acp, sqrt_1macp = jnp.sqrt(acp), jnp.sqrt(1.0 - acp)
    if sched.prediction_type == "epsilon":
        eps = model_out
        x0 = (sample - sqrt_1macp * eps) / sqrt_acp
    elif sched.prediction_type == "v_prediction":
        x0 = sqrt_acp * sample - sqrt_1macp * model_out
        eps = sqrt_acp * model_out + sqrt_1macp * sample
    else:
        raise ValueError(f"unknown prediction type {sched.prediction_type!r}")
    return x0, eps


def inference_timesteps(num_train_timesteps: int, num_inference_steps: int) -> jax.Array:
    """Descending timestep sequence with 'leading' spacing (diffusers DDIM
    default, the reference's sampling convention)."""
    step = num_train_timesteps // num_inference_steps
    ts = (jnp.arange(num_inference_steps) * step).round().astype(jnp.int32)
    return ts[::-1]


def ddim_step(
    sched: Schedule,
    model_out: jax.Array,
    sample: jax.Array,
    t: jax.Array,
    t_prev: jax.Array,
    eta: float = 0.0,
    key: Optional[jax.Array] = None,
    clip_x0: bool = False,
) -> jax.Array:
    """One DDIM update from t to t_prev (t_prev < 0 means final step)."""
    x0, eps = pred_to_x0(sched, model_out, sample, t)
    if clip_x0:
        x0 = jnp.clip(x0, -1.0, 1.0)
    acp_prev = jnp.where(t_prev >= 0, sched.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
    acp_prev = acp_prev.reshape(acp_prev.shape + (1,) * (sample.ndim - acp_prev.ndim))
    acp_t = _gather(sched.alphas_cumprod, t, sample.ndim)
    if eta > 0:
        var = (1 - acp_prev) / (1 - acp_t) * (1 - acp_t / acp_prev)
        sigma = eta * jnp.sqrt(jnp.maximum(var, 0.0))
    else:
        sigma = 0.0
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_prev - jnp.square(sigma), 0.0)) * eps
    prev = jnp.sqrt(acp_prev) * x0 + dir_xt
    if eta > 0:
        if key is None:
            raise ValueError("eta > 0 requires a PRNG key")
        prev = prev + sigma * jax.random.normal(key, sample.shape, sample.dtype)
    return prev


def ddpm_step(
    sched: Schedule,
    model_out: jax.Array,
    sample: jax.Array,
    t: jax.Array,
    key: jax.Array,
    clip_x0: bool = True,
) -> jax.Array:
    """One ancestral DDPM update from t to t-1."""
    x0, _ = pred_to_x0(sched, model_out, sample, t)
    if clip_x0:
        x0 = jnp.clip(x0, -1.0, 1.0)
    acp_t = _gather(sched.alphas_cumprod, t, sample.ndim)
    acp_prev = jnp.where(t > 0, sched.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)
    acp_prev = acp_prev.reshape(acp_prev.shape + (1,) * (sample.ndim - acp_prev.ndim))
    beta_t = _gather(sched.betas, t, sample.ndim)
    alpha_t = 1.0 - beta_t
    # posterior mean coefficients (Ho et al. 2020, eq. 7)
    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef_x0 * x0 + coef_xt * sample
    var = jnp.clip((1.0 - acp_prev) / (1.0 - acp_t) * beta_t, 1e-20, None)
    t_b = t.reshape(t.shape + (1,) * (sample.ndim - t.ndim))
    noise = jax.random.normal(key, sample.shape, sample.dtype)
    return mean + jnp.where(t_b > 0, jnp.sqrt(var) * noise, 0.0)
