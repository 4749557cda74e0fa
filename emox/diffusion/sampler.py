"""Samplers: jit-compiled lax.scan denoise loops.

Replaces the reference's Python-loop pipelines (reference
EMOAnimationPipeline.py:698-821, pipeline_animation.py:659-799) with fully
compiled programs:

  * ddim_sample — plain scan over timesteps (short clips / single frames).
  * windowed_ddim_sample — long-video denoising: per step, overlapping
    frame windows (static WindowPlan) are gathered, denoised (vmapped over
    the window axis — shardable over the mesh `context` axis, which is the
    compiled equivalent of the reference's rank-sharded window loop +
    gather/broadcast at EMOAnimationPipeline.py:757,796-821), and
    scatter-added back with hit-count normalisation.

CFG (classifier-free guidance) is composed by the caller inside
`denoise_fn`: the sampler stays agnostic to conditioning.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from emox.diffusion.context import WindowPlan
from emox.diffusion.schedule import Schedule, ddim_step, inference_timesteps


def ddim_sample(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    latents: jax.Array,
    sched: Schedule,
    num_steps: int,
    eta: float = 0.0,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """denoise_fn(latents, t[B]) -> model_out. Returns final latents."""
    ts = inference_timesteps(sched.num_train_timesteps, num_steps)
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
    keys = jax.random.split(key, num_steps) if key is not None else jnp.zeros((num_steps, 2), jnp.uint32)
    b = latents.shape[0]

    def body(lat, step):
        t, t_prev, k = step
        tb = jnp.full((b,), t, jnp.int32)
        out = denoise_fn(lat, tb)
        lat = ddim_step(sched, out, lat, tb, jnp.full((b,), t_prev, jnp.int32), eta=eta, key=k if eta > 0 else None)
        return lat, None

    final, _ = jax.lax.scan(body, latents, (ts, ts_prev, keys))
    return final


def windowed_ddim_sample(
    denoise_window_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    latents: jax.Array,  # [B, T, h, w, C]
    sched: Schedule,
    plan: WindowPlan,
    eta: float = 0.0,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """denoise_window_fn(window_latents [W,B,c,h,w,C], t [B], frame_idx [W,c])
    -> model outputs, vmapped over the leading window axis by the caller or
    internally here. The frame_idx lets the caller gather per-frame
    conditioning (audio windows, speeds) for each window.
    """
    num_steps = plan.num_steps
    ts = inference_timesteps(sched.num_train_timesteps, num_steps)
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
    keys = jax.random.split(key, num_steps) if key is not None else jnp.zeros((num_steps, 2), jnp.uint32)
    b, t_total = latents.shape[:2]
    indices = jnp.asarray(plan.indices)  # [S, W, c]
    weights = jnp.asarray(plan.weights)  # [S, W]

    def body(lat, step):
        t, t_prev, idx, w8, k = step  # idx [W, c], w8 [W]
        tb = jnp.full((b,), t, jnp.int32)
        # gather: [W, B, c, h, w, C]
        windows = lat[:, idx].transpose(1, 0, 2, 3, 4, 5)
        preds = denoise_window_fn(windows, tb, idx)  # [W, B, c, h, w, C]
        preds = preds * w8[:, None, None, None, None, None]
        # scatter-add over frames + hit counts
        wc = idx.shape[0] * idx.shape[1]
        flat_idx = idx.reshape(wc)
        flat_preds = preds.transpose(1, 0, 2, 3, 4, 5).reshape(b, wc, *lat.shape[2:])
        noise_sum = jnp.zeros_like(lat).at[:, flat_idx].add(flat_preds)
        counts = jnp.zeros((t_total,), jnp.float32).at[flat_idx].add(jnp.repeat(w8, idx.shape[1]))
        model_out = noise_sum / jnp.maximum(counts, 1e-6)[None, :, None, None, None]
        lat = ddim_step(sched, model_out, lat, tb, jnp.full((b,), t_prev, jnp.int32), eta=eta, key=k if eta > 0 else None)
        return lat, None

    final, _ = jax.lax.scan(body, latents, (ts, ts_prev, indices, weights, keys))
    return final


def cfg_combine(uncond: jax.Array, cond: jax.Array, scale: float) -> jax.Array:
    """Classifier-free guidance (reference EMOAnimationPipeline.py:812-814)."""
    return uncond + scale * (cond - uncond)


def ddim_invert(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    latents: jax.Array,
    sched: Schedule,
    num_steps: int,
) -> jax.Array:
    """Deterministic DDIM inversion: clean latents -> noise latents along the
    model's own trajectory (reference EMOAnimationPipeline.py:416-477
    `invert`, util.py:44-99 DDIM inversion helpers). Ascending timesteps;
    each update re-projects the (x0, eps) estimate at t onto noise level
    t_next — the exact algebraic reverse of `ddim_step`, so a perfect model
    round-trips invert -> sample to the original latents.
    """
    ts_all = inference_timesteps(sched.num_train_timesteps, num_steps)[::-1]  # ascending
    # transitions mirror the sampler's (t_{i+1} -> t_i) pairs; the initial
    # x0 -> t_0 projection is absorbed into the first step (alpha_bar[t_0]~1)
    ts, ts_next = ts_all[:-1], ts_all[1:]
    b = latents.shape[0]

    def body(lat, step):
        t, t_next = step
        tb = jnp.full((b,), t, jnp.int32)
        out = denoise_fn(lat, tb)
        lat = ddim_step(sched, out, lat, tb, jnp.full((b,), t_next, jnp.int32))
        return lat, None

    final, _ = jax.lax.scan(body, latents, (ts, ts_next))
    return final
