"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-device tests need no hardware: XLA_FLAGS host-platform device count
gives 8 virtual CPU devices (SURVEY.md §4 test-strategy note). Pallas kernels
run in interpret mode on CPU.
"""

import os

# Force CPU: the session environment pre-sets JAX_PLATFORMS=axon (the
# tunneled TPU chip); tests must NOT run over the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("EMOX_ATTENTION_IMPL", "xla")
os.environ.setdefault("EMOX_GROUPNORM_IMPL", "xla")

import jax  # noqa: E402

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the TPU
# tunnel plugin at interpreter start, BEFORE this conftest runs — env vars
# alone don't stick. Re-force the platform post-import (backends init
# lazily, so this is still early enough).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: full-suite reruns skip recompiling unchanged
# train-step/sampler programs (CPU compiles of the full EMO step take
# minutes each)
jax.config.update("jax_compilation_cache_dir", os.environ.get("EMOX_JAX_CACHE", "/tmp/emox_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
