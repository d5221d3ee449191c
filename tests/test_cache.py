"""runtime/cache.py — the shared persistent-compile-cache opt-in.

Every CLI and measurement tool routes through enable_persistent_cache
(bench.py, config_from_args, the quality-cell drivers); pin its
resolution order: explicit arg > $CONZIC_JAX_CACHE > repo-local
.jax_cache > ~/.cache fallback when the checkout isn't writable.
"""

import os

import jax

from conzic_tpu.runtime.cache import _DEFAULT_DIR, enable_persistent_cache


def _restore(prev):
    jax.config.update("jax_compilation_cache_dir", prev)


def test_explicit_dir_wins(tmp_path, monkeypatch):
    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("CONZIC_JAX_CACHE", str(tmp_path / "env"))
        got = enable_persistent_cache(str(tmp_path / "arg"))
        assert got == str(tmp_path / "arg")
        assert jax.config.jax_compilation_cache_dir == got
    finally:
        _restore(prev)


def test_env_overrides_default(tmp_path, monkeypatch):
    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("CONZIC_JAX_CACHE", str(tmp_path / "env"))
        assert enable_persistent_cache() == str(tmp_path / "env")
    finally:
        _restore(prev)


def test_default_is_repo_local_and_unwritable_falls_back(monkeypatch):
    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("CONZIC_JAX_CACHE", raising=False)
        # the default resolves inside this checkout (writable here)
        assert enable_persistent_cache() == _DEFAULT_DIR
        assert _DEFAULT_DIR.endswith(".jax_cache")
        # an unwritable target (and parent) falls back to ~/.cache
        got = enable_persistent_cache("/proc/definitely/not/writable")
        assert got == os.path.join(
            os.path.expanduser("~"), ".cache", "conzic_tpu", "jax_cache")
    finally:
        _restore(prev)
