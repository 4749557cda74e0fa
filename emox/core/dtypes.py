"""Mixed-precision policy: bf16 compute, fp32 params/optimizer state.

Replaces the reference's fp16 + AMP GradScaler machinery
(reference train_stage_3_speedlayers.py:280,395,432-440,
magicanimate/pipelines/animation.py:96-100). On TPU bf16 has fp32's exponent
range so no loss scaling is needed.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.output_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_POLICY = Policy()

_NAMES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def dtype_by_name(name: str) -> jnp.dtype:
    if name not in _NAMES:
        raise ValueError(f"unknown dtype {name!r}; expected one of {sorted(_NAMES)}")
    return _NAMES[name]


def policy_from_names(param_dtype: str = "float32", compute_dtype: str = "bfloat16") -> Policy:
    return Policy(param_dtype=dtype_by_name(param_dtype), compute_dtype=dtype_by_name(compute_dtype))
