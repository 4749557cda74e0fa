"""Diffusion: schedules as pure functions, lax.scan samplers, context windows."""

from emox.diffusion.schedule import (
    Schedule,
    make_schedule,
    add_noise,
    get_velocity,
    snr,
    min_snr_loss_weight,
    inference_timesteps,
    ddim_step,
    ddpm_step,
)
from emox.diffusion.context import ordered_halving, uniform_windows, window_plan, WindowPlan
from emox.diffusion.sampler import ddim_sample, windowed_ddim_sample
from emox.diffusion.interp import lerp_latents, slerp_latents, interpolate_latents

__all__ = [
    "Schedule",
    "make_schedule",
    "add_noise",
    "get_velocity",
    "snr",
    "min_snr_loss_weight",
    "inference_timesteps",
    "ddim_step",
    "ddpm_step",
    "ordered_halving",
    "uniform_windows",
    "window_plan",
    "WindowPlan",
    "ddim_sample",
    "windowed_ddim_sample",
    "lerp_latents",
    "slerp_latents",
    "interpolate_latents",
]
