"""Quality metrics for generated talking-head video.

The reference ships no evaluation surface at all — no FID/FVD/SyncNet, no
quality numbers anywhere in the tree (SURVEY.md section 6; absence verified
against reference README.md). This module gives emox the measurement layer
the reference lacks, scoped to what runs with zero external model downloads:

- reconstruction fidelity: PSNR + windowed SSIM
- temporal stability: frame-delta flicker vs ground truth
- identity preservation: CLIP-vision cosine between generated frames and
  the reference image (the role the CLIP image encoder plays in reference
  EMOAnimationPipeline.py:867)
- audio-visual sync proxy: correlation between a mouth-region appearance
  series and the per-frame audio RMS envelope — the exact correlation the
  reference's junk/AudioAttention prototype was built to learn
  (reference junk/AudioAttention/train.py:82-151) and that
  emox.data.fixtures builds into its synthetic clips by construction.

Everything is pure jittable JAX on static shapes (TPU-friendly: the SSIM
window is a depthwise conv, the series reductions are plain matmul-free
elementwise/reduce work XLA fuses).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "psnr",
    "ssim",
    "temporal_flicker",
    "frame_audio_envelope",
    "mouth_openness",
    "pearson",
    "audio_sync_score",
    "identity_similarity",
    "frechet_distance",
    "evaluate_clip",
]


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 2.0) -> jax.Array:
    """Peak signal-to-noise ratio in dB over all elements.

    Frames are [-1, 1] by emox convention, so data_range defaults to 2.
    Identical inputs return the 100 dB cap instead of inf (keeps the
    metric finite for JSON reporting and jit-safe).
    """
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    mse = jnp.maximum(mse, (data_range**2) * 1e-10)  # cap at 100 dB
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_kernel(window: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(window, dtype=jnp.float32) - (window - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]  # [w, w]


def _depthwise_blur(x: jax.Array, kernel2d: jnp.ndarray) -> jax.Array:
    """[N, H, W, C] valid-padded depthwise filter."""
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel2d[:, :, None, None], (*kernel2d.shape, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 2.0,
    data_min: float = -1.0,
    window: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean structural similarity (Wang et al. 2004 constants) over
    [T, H, W, C] (or [H, W, C]) frames; gaussian 11x11 window as a
    depthwise convolution. Requires H, W >= window.

    SSIM's luminance term is defined on NONNEGATIVE intensities; emox
    frames are zero-centered [-1, 1], where a constant brightness shift
    would wrongly flip the term negative. Inputs are therefore rescaled
    internally to [0, 1] via (x - data_min) / data_range (defaults match
    the emox frame convention) and scored with L = 1."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    x = (pred.astype(jnp.float32) - data_min) / data_range
    y = (target.astype(jnp.float32) - data_min) / data_range
    data_range = 1.0
    kern = _gaussian_kernel(window, sigma)
    mu_x = _depthwise_blur(x, kern)
    mu_y = _depthwise_blur(y, kern)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = _depthwise_blur(x * x, kern) - mu_xx
    sig_y = _depthwise_blur(y * y, kern) - mu_yy
    sig_xy = _depthwise_blur(x * y, kern) - mu_xy
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2.0 * mu_xy + c1) * (2.0 * sig_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sig_x + sig_y + c2)
    return jnp.mean(num / den)


def temporal_flicker(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared mismatch of consecutive-frame deltas, [T, H, W, C].

    A flow-free temporal-stability proxy: measures whether the generated
    video changes frame-to-frame the way the ground truth does (0 when
    motion is reproduced exactly; large when the output strobes or
    freezes). Lower is better."""
    dp = pred.astype(jnp.float32)[1:] - pred.astype(jnp.float32)[:-1]
    dt = target.astype(jnp.float32)[1:] - target.astype(jnp.float32)[:-1]
    return jnp.mean((dp - dt) ** 2)


def frame_audio_envelope(wav: jax.Array, num_frames: int, samples_per_frame: int) -> jax.Array:
    """Per-video-frame RMS amplitude of the waveform -> [T], max-normalised.

    Same definition the synthetic fixtures use to drive mouth opening
    (emox.data.fixtures._envelope), so sync scores on fixture data measure
    the real generative behaviour, not a definition mismatch."""
    wav = wav.astype(jnp.float32)
    need = num_frames * samples_per_frame
    wav = jnp.concatenate([wav, jnp.zeros(max(0, need - wav.shape[0]), jnp.float32)])[:need]
    seg = wav.reshape(num_frames, samples_per_frame)
    env = jnp.sqrt(jnp.mean(seg**2, axis=1))
    return env / jnp.maximum(jnp.max(env), 1e-8)


def mouth_openness(frames: jax.Array, masks: jax.Array) -> jax.Array:
    """Appearance-based mouth-openness proxy -> [T], one value per frame.

    Mean darkness (negative luminance) over the lower half of the face
    region: an open mouth exposes the dark oral cavity, so the series
    rises with openness on real faces and on the synthetic fixtures alike.
    The lower-face weight is the face mask gated below its own row
    centroid, computed per frame — no landmark dependency."""
    x = frames.astype(jnp.float32)
    m = masks.astype(jnp.float32)
    if m.ndim == 3:
        m = m[..., None]
    h = x.shape[1]
    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]  # [1, H, 1, 1]
    denom = jnp.maximum(jnp.sum(m, axis=(1, 2, 3), keepdims=True), 1e-6)
    cy = jnp.sum(m * rows, axis=(1, 2, 3), keepdims=True) / denom  # [T,1,1,1]
    lower = m * (rows > cy)
    lum = jnp.mean(x, axis=-1, keepdims=True)  # [-1, 1]
    w = jnp.maximum(jnp.sum(lower, axis=(1, 2, 3)), 1e-6)
    return -jnp.sum(lum * lower, axis=(1, 2, 3)) / w


def pearson(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pearson correlation of two 1-D series (0 when either is constant)."""
    a = a.astype(jnp.float32) - jnp.mean(a)
    b = b.astype(jnp.float32) - jnp.mean(b)
    denom = jnp.sqrt(jnp.sum(a**2) * jnp.sum(b**2))
    return jnp.where(denom > 1e-8, jnp.sum(a * b) / jnp.maximum(denom, 1e-8), 0.0)


def audio_sync_score(
    frames: jax.Array,
    masks: jax.Array,
    wav: jax.Array,
    fps: float = 25.0,
    sample_rate: int = 16000,
) -> jax.Array:
    """Audio-visual sync proxy in [-1, 1]: Pearson correlation between the
    mouth-openness series and the per-frame audio envelope. ~0 for
    unrelated audio/video; strongly positive when the mouth tracks the
    audio (SyncNet measures the same alignment with learned embeddings —
    this is the zero-download stand-in)."""
    t = frames.shape[0]
    spf = int(sample_rate / fps)
    return pearson(mouth_openness(frames, masks), frame_audio_envelope(wav, t, spf))


def identity_similarity(frame_embeds: jax.Array, ref_embed: jax.Array) -> jax.Array:
    """Mean cosine similarity between per-frame identity embeddings
    [T, D] and the reference-image embedding [D] (or [1, D]).

    Feed it EMOModel.encode_image_embedding outputs (CLIP-vision projected
    class token) to measure identity drift across the generated clip."""
    fe = frame_embeds.astype(jnp.float32)
    re = ref_embed.astype(jnp.float32).reshape(-1)
    fe = fe / jnp.maximum(jnp.linalg.norm(fe, axis=-1, keepdims=True), 1e-8)
    re = re / jnp.maximum(jnp.linalg.norm(re), 1e-8)
    return jnp.mean(fe @ re)


def frechet_distance(feats_a: jax.Array, feats_b: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Fréchet distance between two gaussian fits of feature sets [N, D].

    The FID/FVD family needs a pretrained Inception/I3D this environment
    cannot download; fitting the gaussians in emox's OWN VAE latent space
    (flatten encode_images outputs per frame) gives the same
    distribution-level comparison with zero external weights — a latent
    Fréchet distance. Uses the eigendecomposition form of
    tr((S_a S_b)^1/2) (symmetrised product, PSD-clipped), stable for the
    small-N/large-D regime typical of per-clip evaluation."""
    if feats_a.shape[0] < 2 or feats_b.shape[0] < 2:
        # jnp.cov divides by N-1: a single-frame set yields NaN, not a metric
        raise ValueError(
            f"frechet_distance needs >= 2 frames per set to fit a gaussian, "
            f"got {feats_a.shape[0]} vs {feats_b.shape[0]}"
        )
    a = feats_a.astype(jnp.float32).reshape(feats_a.shape[0], -1)
    b = feats_b.astype(jnp.float32).reshape(feats_b.shape[0], -1)
    mu_a, mu_b = jnp.mean(a, 0), jnp.mean(b, 0)
    ca = jnp.cov(a, rowvar=False) + eps * jnp.eye(a.shape[1])
    cb = jnp.cov(b, rowvar=False) + eps * jnp.eye(b.shape[1])
    diff = jnp.sum((mu_a - mu_b) ** 2)
    # tr((Ca Cb)^1/2) via eigvals of the symmetrised product: Ca Cb is
    # similar to Ca^1/2 Cb Ca^1/2 (PSD), whose eigenvalues are real >= 0
    ev_a, U = jnp.linalg.eigh(ca)
    sqrt_a = (U * jnp.sqrt(jnp.maximum(ev_a, 0.0))) @ U.T
    ev = jnp.linalg.eigvalsh(sqrt_a @ cb @ sqrt_a)
    tr_sqrt = jnp.sum(jnp.sqrt(jnp.maximum(ev, 0.0)))
    return diff + jnp.trace(ca) + jnp.trace(cb) - 2.0 * tr_sqrt


def evaluate_clip(
    gen: np.ndarray,
    gt: Optional[np.ndarray] = None,
    masks: Optional[np.ndarray] = None,
    wav: Optional[np.ndarray] = None,
    fps: float = 25.0,
    sample_rate: int = 16000,
) -> Dict[str, float]:
    """Compute every metric the provided inputs allow; returns plain floats.

    gen/gt: [T, H, W, 3] in [-1, 1]; masks: [T, H, W, 1]; wav: [S].
    With gt: psnr, ssim, temporal_flicker. With masks+wav: audio_sync
    (and gt_audio_sync when gt is also given, as the achievable anchor)."""
    out: Dict[str, float] = {}
    g = jnp.asarray(gen)
    if gt is not None:
        t = jnp.asarray(gt)
        if t.shape != g.shape:
            raise ValueError(f"gen {g.shape} vs gt {t.shape}: shapes must match (resize first)")
        out["psnr_db"] = float(psnr(g, t))
        out["ssim"] = float(ssim(g, t))
        out["temporal_flicker"] = float(temporal_flicker(g, t))
    if masks is not None and wav is not None:
        m = jnp.asarray(masks)
        w = jnp.asarray(wav)
        out["audio_sync"] = float(audio_sync_score(g, m, w, fps, sample_rate))
        if gt is not None:
            out["gt_audio_sync"] = float(audio_sync_score(jnp.asarray(gt), m, w, fps, sample_rate))
    return out
