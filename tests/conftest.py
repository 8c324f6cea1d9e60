"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; JAX's host-platform device
multiplexing is the idiomatic stand-in (SURVEY.md §4 "TPU-specific" tier).
Must run before jax is imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the remote TPU backend and
# overrides JAX_PLATFORMS; pin the config directly so tests run on the local
# 8-device virtual CPU mesh, not through the single-chip tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # high-precision references in tests

# Persistent compile cache: the suite's cost is dominated by CPU jit
# compiles of train-step variants; re-runs should pay only execution.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
