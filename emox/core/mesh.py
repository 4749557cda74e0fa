"""Device mesh construction + sharding helpers.

TPU-native replacement for the reference's NCCL process-group setup
(reference magicanimate/utils/dist_tools.py:18-59) and per-step host-mediated
gather/broadcast (reference EMOAnimationPipeline.py:796-821): one
`jax.sharding.Mesh` with axes (data, context, model); GSPMD inserts the
collectives over ICI/DCN inside a single compiled program.

Axes:
  data    — batch sharding (DP)
  context — video-frame/window axis sharding (the reference's
            `global_context[rank::world_size]` sequence parallelism,
            reference EMOAnimationPipeline.py:757)
  model   — tensor parallelism over attention heads / MLP channels
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emox.core.config import MeshConfig


class MeshAxes:
    DATA = "data"
    CONTEXT = "context"
    MODEL = "model"
    ALL = (DATA, CONTEXT, MODEL)


def create_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, context, model) mesh over the given devices.

    A -1 in any axis absorbs the remaining device count (like a reshape -1).
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = [cfg.data, cfg.context, cfg.model]
    n_free = sizes.count(-1)
    if n_free > 1:
        raise ValueError("at most one mesh axis may be -1")
    fixed = math.prod(s for s in sizes if s != -1)
    if n_free == 1:
        if n % fixed != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes product {fixed}")
        sizes[sizes.index(-1)] = n // fixed
    elif fixed < n:
        devices = devices[:fixed]  # explicit sub-mesh (e.g. tests, debug)
    elif fixed > n:
        raise ValueError(f"mesh {sizes} needs {fixed} devices, have {n}")
    arr = np.array(devices).reshape(sizes)
    return Mesh(arr, cfg.axis_names)


def local_mesh(context: int = 1, model: int = 1) -> Mesh:
    """All local devices, data-parallel by default."""
    return create_mesh(MeshConfig(data=-1, context=context, model=model))


def single_device_mesh() -> Mesh:
    return create_mesh(MeshConfig(data=1, context=1, model=1), devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh, ndim: int, frame_axis: Optional[int] = None) -> NamedSharding:
    """Shard axis 0 over `data`, and optionally a frame axis over `context`."""
    spec = [None] * ndim
    spec[0] = MeshAxes.DATA
    if frame_axis is not None and mesh.shape.get(MeshAxes.CONTEXT, 1) > 1:
        spec[frame_axis] = MeshAxes.CONTEXT
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_replicated(params, mesh: Mesh):
    """Replicate a param pytree across the mesh (DP baseline; TP rules can
    override individual leaves via logical sharding constraints later)."""
    sharding = replicated(mesh)
    return jax.device_put(params, sharding)


def put_batch(batch, mesh: Mesh, frame_axis: Optional[int] = None):
    """Device-put a host batch pytree with batch-axis (and optional
    frame-axis) sharding."""

    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, frame_axis if x.ndim > (frame_axis or 0) else None))

    return jax.tree.map(_put, batch)
