"""Persistent XLA compile-cache activation that actually works here.

The axon environment pre-imports jax in sitecustomize on EVERY
interpreter, so `os.environ["JAX_COMPILATION_CACHE_DIR"] = ...` set by
application code is read never: jax's config default was already
snapshotted at that pre-import. Discovered round 4 — every prior "warm"
run was silently recompiling (6-8 min flagship headlines, the r3 driver
bench timeout). `jax.config.update` works at any time, so route every
entry point through here instead of env vars.

Flagship programs cold-compile in minutes through the axon compile
helper; cached re-runs of the exact HLO deserialize in seconds.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/emox_tpu_cache"


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax's persistent compile cache at `path` (idempotent).

    Skipped when running on forced-CPU (tests): caching single-core CPU
    compiles of tiny test programs would only churn disk. Returns the
    active cache dir or None when skipped.
    """
    import jax

    if (os.environ.get("JAX_PLATFORMS", "") or "").strip() == "cpu":
        return None
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # flagship compiles are minutes; tiny helper jits are noise. 2 s keeps
    # every program that matters while skipping scalar-fetch lambdas.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
