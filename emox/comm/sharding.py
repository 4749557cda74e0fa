"""GSPMD sharding rules for the (data, context, model) mesh.

  * data    — batch axis of every batch tensor (DP).
  * context — the video-frame axis (sequence parallelism over frames: the
    compiled equivalent of the reference sharding denoise windows
    rank::world_size, reference EMOAnimationPipeline.py:757).
  * model   — tensor parallelism: large projection kernels shard their
    output features; GSPMD propagates activation shardings and inserts the
    all-reduces (new capability; the reference has no TP).

Rules are path-pattern based so they apply to any emox model without
touching module code.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emox.core.mesh import MeshAxes

# kernels whose OUTPUT feature axis shards over `model`
_TP_OUT_PATTERNS = (
    r"to_q/kernel$", r"to_k/kernel$", r"to_v/kernel$",
    r"ff/proj_in/kernel$", r"ff1/kernel$",
)
# kernels whose INPUT feature axis shards over `model` (row-parallel:
# output needs the psum GSPMD will insert)
_TP_IN_PATTERNS = (
    r"to_out/kernel$", r"ff/proj_out/kernel$", r"ff2/kernel$",
)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a param pytree: TP rules on matching kernels,
    replication otherwise."""
    model_size = mesh.shape.get(MeshAxes.MODEL, 1)

    def rule(path, leaf):
        if model_size > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            p = _path_str(path)
            if any(re.search(pat, p) for pat in _TP_OUT_PATTERNS) and leaf.shape[-1] % model_size == 0:
                spec = [None] * leaf.ndim
                spec[-1] = MeshAxes.MODEL
                return NamedSharding(mesh, P(*spec))
            if any(re.search(pat, p) for pat in _TP_IN_PATTERNS) and leaf.shape[-2] % model_size == 0:
                spec = [None] * leaf.ndim
                spec[-2] = MeshAxes.MODEL
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_spec(ndim: int, frame_axis: Optional[int] = None) -> P:
    """PartitionSpec for a batch tensor: axis 0 -> data, frame axis -> context."""
    spec = [None] * ndim
    spec[0] = MeshAxes.DATA
    if frame_axis is not None and frame_axis < ndim:
        spec[frame_axis] = MeshAxes.CONTEXT
    return P(*spec)


# batch keys that carry a frame axis at dim 1
_FRAME_KEYS = {"frames", "speeds"}


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Device-put a host batch with data (+context on frame axes) sharding."""
    ctx = mesh.shape.get(MeshAxes.CONTEXT, 1)

    def put(key, arr):
        arr = np.asarray(arr)
        frame_axis = 1 if (key in _FRAME_KEYS and arr.ndim >= 2 and ctx > 1 and arr.shape[1] % ctx == 0) else None
        return jax.device_put(arr, NamedSharding(mesh, batch_spec(arr.ndim, frame_axis)))

    return {k: put(k, v) for k, v in batch.items()}


def with_context_sharding(x: jax.Array, mesh: Mesh, frame_axis: int = 1) -> jax.Array:
    """Constrain an activation's frame axis to the context mesh axis inside
    jit (lets GSPMD keep per-frame work local and only communicate at
    temporal attention)."""
    if mesh.shape.get(MeshAxes.CONTEXT, 1) <= 1:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, batch_spec(x.ndim, frame_axis)))
