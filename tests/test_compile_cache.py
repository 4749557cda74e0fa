"""enable_persistent_cache must apply via jax.config.update (the env-var
route is dead here: the environment pre-imports jax before application
code runs, freezing config defaults — see emox/core/compile_cache.py)."""

import os

import jax

from emox.core.compile_cache import enable_persistent_cache


def test_skips_on_forced_cpu(monkeypatch):
    # the test suite itself forces cpu, so this is the live branch
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert enable_persistent_cache("/tmp/should_not_be_used") is None


def test_applies_via_config_update(monkeypatch, tmp_path):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        got = enable_persistent_cache(str(tmp_path / "cc"))
        assert got == str(tmp_path / "cc")
        assert jax.config.jax_compilation_cache_dir == got
        assert os.path.isdir(got)
        # idempotent re-entry with the default arg keeps an explicit dir
        # only if env agrees; just assert it doesn't raise
        enable_persistent_cache(got)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
