"""Full-scale golden parity: SD-1.5-config denoise trajectory, torch vs emox.

The driver's parity bar (BASELINE.md): latent MSE <= 1e-2 vs the PyTorch
reference on a 16-frame 256^2 clip. This harness builds the SD-1.5 UNet
layout at FULL scale (chans 320/640/1280/1280, 2 layers/block, 8 heads,
cross 768 — reference configs/unet-config.yaml) in PyTorch with exact
diffusers state-dict naming (tests/torch_ref.TMiniUNet; random init at full
scale, since checkpoints cannot be downloaded in this environment — the
naming/compute path is identical so a real SD-1.5 safetensors file loads
through the same importer), imports the weights via emox.interop, and runs
the SAME deterministic DDIM trajectory on both sides:

  torch : per-frame 2D UNet loop (frames folded into batch) — what the
          reference's pipeline does before temporal modules act
          (reference magicanimate/pipelines/pipeline_animation.py:659-817)
  emox  : the video denoiser (temporal/audio zero-init == identity at
          import time) through emox.diffusion ddim_step

Prints the trajectory latent MSE and per-step drift. Also checks wav2vec2
at the real base config (12 layers / 768 hidden) vs transformers.

Usage:  python examples/golden_parity.py [--frames 16] [--size 256]
        [--steps 3] [--scale full|mini]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--scale", choices=("full", "mini"), default="full")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import torch

    from emox.core.config import ModelConfig
    from emox.diffusion.schedule import make_schedule, inference_timesteps, ddim_step
    from emox.core.config import DiffusionConfig
    from emox.interop.torch_import import import_unet2d, merge_imported
    from emox.models.unet import UNet
    from torch_ref import TMiniUNet, timestep_embedding_torch  # noqa: F401

    torch.manual_seed(0)
    if args.scale == "full":
        chans, layers, groups, heads, cross = (320, 640, 1280, 1280), 2, 32, 8, 768
        attn_levels = (0, 1, 2)
    else:
        chans, layers, groups, heads, cross = (32, 64, 128, 128), 1, 8, 2, 32
        attn_levels = (0, 1, 2)

    print(f"building torch SD-1.5-layout UNet ({args.scale} scale)...", flush=True)
    t0 = time.time()
    tm = TMiniUNet(
        chans=chans, layers=layers, groups=groups, heads=heads, cross_dim=cross,
        attn_levels=attn_levels,
    ).eval()
    n_params = sum(p.numel() for p in tm.parameters())
    print(f"  {n_params/1e6:.0f}M params in {time.time()-t0:.0f}s", flush=True)

    cfg = ModelConfig(
        base_channels=chans[0],
        channel_multipliers=tuple(c // chans[0] for c in chans),
        layers_per_block=layers, norm_groups=groups, attention_heads=heads,
        resnet_temb_mode="add", cross_attention_dim=cross, attention_levels=attn_levels,
        use_temporal=True, use_audio=False, use_speed=False, use_face_mask=False,
        remat=False,
    )
    net = UNet(cfg)

    lat = args.size // 8
    B, T = 1, args.frames
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(B, T, lat, lat, 4)).astype(np.float32)
    ctx = rng.normal(size=(1, 4, cross)).astype(np.float32) * 0.2

    print("importing weights into emox...", flush=True)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    imported = import_unet2d(sd, cfg)
    report = imported.pop("__report__")
    print(f"  {report.summary()}", flush=True)
    assert not report.unused_source_keys, report.unused_source_keys[:10]

    print("initialising emox params (jit)...", flush=True)
    ts0 = jnp.zeros((B,), jnp.int32)
    params = jax.jit(
        lambda k: net.init(
            k, jnp.asarray(x0), ts0, context=jnp.broadcast_to(jnp.asarray(ctx), (B, 4, cross))
        )["params"]
    )(jax.random.PRNGKey(0))
    params = merge_imported(params, imported)

    dcfg = DiffusionConfig()
    sched = make_schedule(dcfg)
    steps = inference_timesteps(dcfg.num_train_timesteps, args.steps)
    steps_np = np.asarray(steps)

    # ---- torch DDIM loop (per-frame 2D) ---------------------------------
    print("running torch trajectory...", flush=True)
    alphas = np.cumprod(1.0 - np.asarray(sched.betas), axis=0).astype(np.float64)

    def ddim_np(eps, x, t, t_prev):
        a_t = alphas[t]
        a_prev = alphas[t_prev] if t_prev >= 0 else 1.0
        x0_pred = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        return np.sqrt(a_prev) * x0_pred + np.sqrt(1 - a_prev) * eps

    xt_t = x0.copy()
    t_traj = []
    with torch.no_grad():
        for i, t in enumerate(steps_np):
            t_prev = steps_np[i + 1] if i + 1 < len(steps_np) else -1
            xin = torch.from_numpy(xt_t.reshape(B * T, lat, lat, 4)).permute(0, 3, 1, 2)
            tt = torch.full((B * T,), int(t), dtype=torch.int64)
            cc = torch.from_numpy(np.broadcast_to(ctx, (B * T, 4, cross)).copy())
            eps = tm(xin, tt, cc).permute(0, 2, 3, 1).numpy().reshape(B, T, lat, lat, 4)
            xt_t = ddim_np(eps.astype(np.float64), xt_t.astype(np.float64), int(t), int(t_prev)).astype(np.float32)
            t_traj.append(xt_t.copy())
            print(f"  torch step {i} done", flush=True)

    # ---- emox DDIM loop (video UNet, temporal zero-init == identity) ----
    print("running emox trajectory...", flush=True)

    @jax.jit
    def emox_step(params, x, t, t_prev):
        tb = jnp.full((B,), t, jnp.int32)
        eps = net.apply(
            {"params": params}, x, tb,
            context=jnp.broadcast_to(jnp.asarray(ctx), (B, 4, cross)),
        ).sample
        return ddim_step(sched, eps, x, tb, jnp.full((B,), t_prev, jnp.int32))

    xt_j = jnp.asarray(x0)
    j_traj = []
    for i, t in enumerate(steps_np):
        t_prev = steps_np[i + 1] if i + 1 < len(steps_np) else -1
        xt_j = emox_step(params, xt_j, int(t), int(t_prev))
        j_traj.append(np.asarray(xt_j))
        print(f"  emox step {i} done", flush=True)

    for i, (a, b) in enumerate(zip(t_traj, j_traj)):
        mse = float(np.mean((a - b) ** 2))
        mx = float(np.abs(a - b).max())
        print(f"step {i}: latent MSE {mse:.3e}  max|d| {mx:.3e}")
    final_mse = float(np.mean((t_traj[-1] - j_traj[-1]) ** 2))
    print(f"RESULT: {args.frames}f {args.size}^2, {args.steps}-step DDIM trajectory "
          f"latent MSE = {final_mse:.3e} (bar: <= 1e-2) — {'PASS' if final_mse <= 1e-2 else 'FAIL'}")
    return 0 if final_mse <= 1e-2 else 1


if __name__ == "__main__":
    sys.exit(main())
