"""Paired data augmentation with shared randomness.

The reference applies torchvision transforms to frames and their
conditioning masks with a shared RNG state so both receive the same
geometry (reference Net.py:1163-1186 EmoVideoReader.augmentedImageAtFrame,
Net.py:1244-1252 augmentation with torch.set_rng_state). Here each clip
gets one sampled AugmentParams applied identically to every frame AND its
mask/control renders — explicit parameters instead of hidden RNG state.

Numpy only; runs in the host loader thread, never on the TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass(frozen=True)
class AugmentConfig:
    horizontal_flip: float = 0.5  # probability
    crop_scale_min: float = 0.85  # random-resized-crop area lower bound
    crop_scale_max: float = 1.0
    brightness: float = 0.1  # +/- range, frames only
    contrast: float = 0.1
    enabled: bool = True


@dataclass(frozen=True)
class AugmentParams:
    flip: bool
    y0: int
    x0: int
    crop_h: int
    crop_w: int
    brightness: float
    contrast: float


def sample_params(cfg: AugmentConfig, rng: np.random.Generator, height: int, width: int) -> AugmentParams:
    scale = rng.uniform(cfg.crop_scale_min, cfg.crop_scale_max)
    ch = max(1, int(round(height * np.sqrt(scale))))
    cw = max(1, int(round(width * np.sqrt(scale))))
    return AugmentParams(
        flip=bool(rng.random() < cfg.horizontal_flip),
        y0=int(rng.integers(0, height - ch + 1)),
        x0=int(rng.integers(0, width - cw + 1)),
        crop_h=ch,
        crop_w=cw,
        brightness=float(rng.uniform(-cfg.brightness, cfg.brightness)),
        contrast=float(rng.uniform(1 - cfg.contrast, 1 + cfg.contrast)),
    )


def apply_geometry(img: np.ndarray, p: AugmentParams, out_h: int, out_w: int) -> np.ndarray:
    """Crop/flip/resize [H, W, C] (frames AND masks: geometry only)."""
    from emox.data.native import resize_bilinear

    out = img[p.y0 : p.y0 + p.crop_h, p.x0 : p.x0 + p.crop_w]
    if p.flip:
        out = out[:, ::-1]
    if out.shape[:2] != (out_h, out_w):
        out = resize_bilinear(np.ascontiguousarray(out, np.float32), out_h, out_w)
    return out


def apply_color(img: np.ndarray, p: AugmentParams, pivot: Optional[float] = None) -> np.ndarray:
    """Brightness/contrast on [-1, 1] frames (NOT masks). Contrast pivots on
    `pivot` (the pre-resize crop mean — matches the fused native kernel) or
    the image's own mean."""
    m = img.mean() if pivot is None else pivot
    out = (img - m) * p.contrast + m + p.brightness
    return np.clip(out, -1.0, 1.0).astype(np.float32)


def augment_frame(frame: np.ndarray, p: AugmentParams, out_h: int, out_w: int, color: bool) -> np.ndarray:
    """One frame through geometry (+ color): fused native kernel when the
    host library is built, numpy otherwise (bit-compatible semantics)."""
    from emox.data import native

    out = native.augment_frame(
        frame, p.y0, p.x0, p.crop_h, p.crop_w, p.flip,
        p.brightness if color else 0.0, p.contrast if color else 1.0, out_h, out_w,
    )
    if out is not None:
        return out
    geo = apply_geometry(frame, p, out_h, out_w)
    if not color:
        return geo
    pivot = float(frame[p.y0 : p.y0 + p.crop_h, p.x0 : p.x0 + p.crop_w].mean())
    return apply_color(geo, p, pivot=pivot)


# landmark row order (emox/data/fixtures.py / face.py CANONICAL_3D):
# nose, chin, left eye, right eye, left mouth, right mouth — a horizontal
# flip must swap the left/right pairs as well as mirroring x
_FLIP_LANDMARK_ORDER = np.array([0, 1, 3, 2, 5, 4])


def apply_geometry_points(pts: np.ndarray, p: AugmentParams, in_h: int, in_w: int) -> np.ndarray:
    """Normalised (y, x) [..., 6, 2] landmarks through the same
    crop/flip/resize geometry as apply_geometry (resize keeps normalised
    coords; crop rescales; flip mirrors x AND swaps left/right rows).
    Points cropped out are clipped to the [0, 1] frame edge."""
    out = np.asarray(pts, np.float32).copy()
    y = (out[..., 0] * in_h - p.y0) / p.crop_h
    x = (out[..., 1] * in_w - p.x0) / p.crop_w
    if p.flip:
        x = 1.0 - x
        y = y[..., _FLIP_LANDMARK_ORDER]
        x = x[..., _FLIP_LANDMARK_ORDER]
    out[..., 0] = np.clip(y, 0.0, 1.0)
    out[..., 1] = np.clip(x, 0.0, 1.0)
    return out


def augment_clip(
    frames: np.ndarray,  # [T, H, W, 3] in [-1, 1]
    masks: Optional[np.ndarray],  # [T, H, W, 1] or None
    cfg: AugmentConfig,
    rng: np.random.Generator,
    points: Optional[np.ndarray] = None,  # [..., 6, 2] normalised (y, x)
    extra_maps: Optional[np.ndarray] = None,  # [T, H, W, C] continuous maps
):
    """One shared AugmentParams for the whole clip: temporal consistency,
    and frame/mask/landmark/control geometric alignment (the invariant the
    reference's shared-RNG dance exists to guarantee).

    extra_maps (e.g. stage-4 ControlNet pose renders) go through the SAME
    geometry as the frames they condition — no colour jitter, no binary
    threshold (ADVICE r2: unaugmented control renders were geometrically
    misaligned with their augmented target frames).

    Returns (frames, masks[, points][, extra_maps]) in argument order."""
    if not cfg.enabled:
        out = [frames, masks]
        if points is not None:
            out.append(points)
        if extra_maps is not None:
            out.append(extra_maps)
        return tuple(out)
    t, h, w = frames.shape[:3]
    p = sample_params(cfg, rng, h, w)
    out_frames = np.stack([augment_frame(f, p, h, w, color=True) for f in frames])
    out_masks = None
    if masks is not None:
        out_masks = np.stack([
            (augment_frame(m.astype(np.float32), p, h, w, color=False) > 0.5).astype(np.float32)
            for m in masks
        ])
    out = [out_frames, out_masks]
    if points is not None:
        out.append(apply_geometry_points(points, p, h, w))
    if extra_maps is not None:
        out.append(np.stack([
            augment_frame(m.astype(np.float32), p, h, w, color=False) for m in extra_maps
        ]))
    return tuple(out)
