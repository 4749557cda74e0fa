"""EMO conditioning modules: speed buckets, face locator, face-mask encoder.

  * SpeedEncoder — head-rotation speed scalars -> tanh bucket encodings ->
    MLP embedding (reference Net.py:198-258: 9 buckets, centers
    linspace(-1, 1), radius 0.1; also reference Net.py:554-589
    SpeedController / train_stage_3_speedlayers.py:20-55). The embedding is
    ADDED TO THE TIME EMBEDDING of the denoiser — the injection point the
    reference never wired (reference EMOAnimationPipeline.py:784).
  * FaceLocator — predicts a 1-channel face-region logit mask from an RGB
    frame (reference Net.py:819-855: 3 conv+pool -> logit -> bilinear
    upsample; trained with BCEWithLogits in stage 0).
  * FaceMaskEncoder — encodes a given face mask into latent-resolution
    feature channels added at the denoiser's conv_in (reference
    Net.py:591-605 FaceRegionController; zero-init final conv, ControlNet
    convention from reference magicanimate/models/controlnet.py:49-91).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SpeedEncoder(nn.Module):
    """[B, S] head-rotation speeds (S axes, e.g. yaw/pitch/roll or 1) -> [B, dim]."""

    dim: int
    num_buckets: int = 9
    bucket_radius: float = 0.1
    max_speed: float = 1.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def bucket_centers(self) -> jax.Array:
        return jnp.linspace(-self.max_speed, self.max_speed, self.num_buckets)

    def encode_speed(self, speed: jax.Array) -> jax.Array:
        """Soft bucket encoding: tanh((s - c_i) / r) per bucket
        (reference Net.py:231-246 semantics)."""
        centers = self.bucket_centers()
        return jnp.tanh((speed[..., None] - centers) / self.bucket_radius)

    @nn.compact
    def __call__(self, speeds: jax.Array) -> jax.Array:
        if speeds.ndim == 1:
            speeds = speeds[:, None]
        enc = self.encode_speed(speeds.astype(jnp.float32))  # [B, S, K]
        enc = enc.reshape(speeds.shape[0], -1).astype(self.dtype)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(enc)
        h = nn.silu(h)
        return nn.Dense(
            self.dim, kernel_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name="fc2",
        )(h)


class FaceLocator(nn.Module):
    """RGB frame [B, H, W, 3] -> face-region logit mask [B, H, W, 1]."""

    features: Tuple[int, ...] = (32, 64, 128)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h0, w0, _ = x.shape
        h = x.astype(self.dtype)
        for i, f in enumerate(self.features):
            h = nn.Conv(f, (3, 3), dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        logits = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name="head")(h)
        return jax.image.resize(logits, (b, h0, w0, 1), method="bilinear")


class FaceLandmarkNet(nn.Module):
    """RGB frame [B, H, W, 3] -> 6 facial landmarks [B, 6, 2] (normalised
    (y, x) in [0, 1]) via heatmap soft-argmax.

    The trained replacement for the reference's MediaPipe FaceMesh landmark
    source (reference Net.py:861-1156 FaceHelper: HEAD_POSE_LANDMARKS =
    [33, 263, 1, 61, 291, 199] -> 6-point PnP head pose). The landmark
    order matches emox.data.face.CANONICAL_3D: nose tip, chin, left eye
    outer, right eye outer, left mouth corner, right mouth corner.
    Soft-argmax keeps it differentiable end-to-end for stage-0 training.
    """

    num_points: int = 6
    features: Tuple[int, ...] = (32, 64, 128)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.astype(self.dtype)
        for i, f in enumerate(self.features):
            h = nn.Conv(f, (3, 3), dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        heat = nn.Conv(
            self.num_points, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name="heat"
        )(h)  # [B, h', w', P]
        b, hh, ww, p = heat.shape
        w = jax.nn.softmax(heat.reshape(b, hh * ww, p).astype(jnp.float32), axis=1)
        ys = (jnp.arange(hh, dtype=jnp.float32) + 0.5) / hh
        xs = (jnp.arange(ww, dtype=jnp.float32) + 0.5) / ww
        grid_y = jnp.repeat(ys, ww)  # [hh*ww]
        grid_x = jnp.tile(xs, hh)
        y = jnp.einsum("blp,l->bp", w, grid_y)
        x_ = jnp.einsum("blp,l->bp", w, grid_x)
        return jnp.stack([y, x_], axis=-1).astype(self.dtype)  # [B, P, 2]


class FaceMaskEncoder(nn.Module):
    """Face mask [B, H, W, 1] (pixel res) -> [B, H/2^num_downs, ..., out_channels]
    additive residual for the denoiser conv_in. Zero-init final conv.
    num_downs matches the VAE downscale (3 for the standard 8x VAE)."""

    out_channels: int
    num_downs: int = 3
    features: Tuple[int, ...] = (16, 32, 96)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mask: jax.Array) -> jax.Array:
        h = mask.astype(self.dtype)
        for i in range(self.num_downs):
            f = self.features[min(i, len(self.features) - 1)]
            h = nn.Conv(f, (3, 3), strides=(2, 2), dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv{i}")(h)
            h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), kernel_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype, name="zero_conv",
        )(h)
