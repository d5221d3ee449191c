"""Persistent XLA compilation cache configuration.

Full-size engine programs take ~4-6 min to compile on the axon TPU's
remote compiler; the persistent cache makes every later process with the
same shapes start in seconds. bench.py has always configured this — the
measurement tools (quality-cell drivers etc.) each pay the full compile
otherwise, which dominated their wall-clock. One shared helper so every
TPU-heavy entry point opts in identically.

Call BEFORE the first computation (backend init is fine, compilation is
what matters). Safe to call more than once.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at the repo-local
    ``.jax_cache/`` (or ``cache_dir`` / ``$CONZIC_JAX_CACHE``); falls
    back to ``~/.cache/conzic_tpu/jax_cache`` when the checkout isn't
    writable (pip-installed package)."""
    import jax

    cache_dir = cache_dir or os.environ.get("CONZIC_JAX_CACHE", _DEFAULT_DIR)
    # usable = an existing writable directory, or a creatable path (no
    # entry yet, writable parent). An existing-but-unwritable dir (or a
    # non-dir entry) must fall back even when the parent IS writable —
    # otherwise cache writes silently fail and every run pays the full
    # remote compile.
    if os.path.exists(cache_dir):
        usable = os.path.isdir(cache_dir) and os.access(cache_dir, os.W_OK)
    else:
        usable = os.access(os.path.dirname(cache_dir) or ".", os.W_OK)
    if not usable:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "conzic_tpu", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
