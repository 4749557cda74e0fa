"""Train + ship the FaceLocator/FaceLandmarkNet weights.

The reference gets masks and head pose from MediaPipe FaceDetection +
FaceMesh at dataset time (reference Net.py:861-1156 FaceHelper). emox
replaces that dependency with two small trained nets; THIS module closes
the bootstrap: it trains them on the domain-randomised synthetic face
distribution (emox.data.fixtures.synthetic_face_frame — which carries
landmark + mask ground truth) and writes a ~1 MB checkpoint that ships
in-repo (emox/assets/face_nets.npz), so `emox precompute` on a bare mp4
yields real masks and nonzero pose velocities with zero extra inputs.

CLI: python -m emox train-face [--steps N] [--out PATH]
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

ASSET_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "face_nets.npz")


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def build_modules():
    from emox.nn.conditioners import FaceLandmarkNet, FaceLocator

    return FaceLocator(), FaceLandmarkNet()


def train_face_nets(
    steps: int = 1500,
    batch_size: int = 32,
    image_size: int = 128,
    learning_rate: float = 2e-3,
    seed: int = 0,
    log_every: int = 200,
) -> Tuple[Dict, Dict[str, float]]:
    """Train both nets jointly on synthetic faces; returns (params, metrics).

    params = {"face_locator": ..., "landmarker": ...} — the same collection
    names EMOModel.init_params uses, so the result drops into any emox
    checkpoint or loads standalone via load_face_nets().
    """
    import jax
    import jax.numpy as jnp
    import optax

    from emox.data.fixtures import synthetic_face_batch

    locator, landmarker = build_modules()
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, image_size, image_size, 3))
    params = {
        "face_locator": locator.init(key, dummy)["params"],
        "landmarker": landmarker.init(jax.random.fold_in(key, 1), dummy)["params"],
    }
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    def loss_fn(params, images, masks, landmarks):
        logits = locator.apply({"params": params["face_locator"]}, images)
        bce = jnp.mean(
            jnp.maximum(logits, 0) - logits * masks + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        lm = landmarker.apply({"params": params["landmarker"]}, images)
        lm_err = jnp.mean((lm.astype(jnp.float32) - landmarks) ** 2)
        return bce + 10.0 * lm_err, (bce, lm_err)

    @jax.jit
    def step(params, opt_state, images, masks, landmarks):
        (loss, (bce, lm_err)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, masks, landmarks
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, bce, lm_err

    rng = np.random.default_rng(seed)
    metrics = {}
    for i in range(steps):
        b = synthetic_face_batch(rng, batch_size, image_size, image_size)
        params, opt_state, loss, bce, lm_err = step(
            params, opt_state, b["image"], b["mask"], b["landmarks"]
        )
        if log_every and (i % log_every == 0 or i == steps - 1):
            metrics = {"loss": float(loss), "bce": float(bce), "landmark_mse": float(lm_err)}
            print(f"step {i}: loss {metrics['loss']:.4f} bce {metrics['bce']:.4f} "
                  f"lm_mse {metrics['landmark_mse']:.5f}", flush=True)
    # held-out validation (fresh seed)
    vrng = np.random.default_rng(seed + 10_000)
    vb = synthetic_face_batch(vrng, 64, image_size, image_size)
    _, (vbce, vlm) = loss_fn(params, vb["image"], vb["mask"], vb["landmarks"])
    metrics["val_bce"] = float(vbce)
    metrics["val_landmark_mse"] = float(vlm)
    metrics["val_landmark_px"] = float(np.sqrt(metrics["val_landmark_mse"]) * image_size)
    print(f"held-out: bce {metrics['val_bce']:.4f} lm_rmse ~{metrics['val_landmark_px']:.2f} px "
          f"@ {image_size}px", flush=True)
    return params, metrics


def save_face_nets(params: Dict, path: str = ASSET_PATH, dtype=np.float16) -> str:
    """Persist the face nets. NB: stored as float16 by default (halves the
    committed asset; ~1e-3 relative rounding vs the trained fp32 params —
    immaterial for mask/landmark heads). Pass dtype=np.float32 to keep
    full precision; load_face_nets restores float32 either way."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat = _flatten({k: params[k] for k in ("face_locator", "landmarker")})
    np.savez_compressed(path, **{k: v.astype(dtype) for k, v in flat.items()})
    return path


def load_face_nets(path: Optional[str] = None) -> Optional[Dict]:
    """Load the shipped (or given) face-net params; None if absent."""
    path = path or ASSET_PATH
    if not os.path.exists(path):
        return None
    flat = {k: np.asarray(v, np.float32) for k, v in np.load(path).items()}
    return _unflatten(flat)
