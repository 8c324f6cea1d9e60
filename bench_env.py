"""Shared benchmark environment setup — the single home for the
compile-cache discipline every on-chip benchmark needs (remote TPU
compiles cost 5-10+ min per variant; the persistent cache makes re-runs
cheap — see CLAUDE.md / SCALING.md).

Usage, FIRST thing in any bench entry point (before other jax use)::

    import bench_env; bench_env.setup()          # from the repo root
    # from scripts/: sys.path bootstrap first, then the same two lines
"""
import os
import sys

ROOT = os.path.dirname(os.path.abspath(__file__))


def setup():
    """Set the persistent compile cache + repo import path; returns jax."""
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache")
    )
    if ROOT not in sys.path:
        sys.path.insert(0, ROOT)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax
