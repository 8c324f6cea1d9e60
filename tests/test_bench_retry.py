"""Unit tests for bench.py's transient-TPU-error retry classifier.

The driver runs ``bench.py`` unattended at round end; ``_run_with_retries``
decides whether a failure is a flaky-tunnel transient (retry) or a real
error (raise immediately).  Misclassification either zeroes the round's
benchmark on a recoverable blip or loops on a deterministic failure — so
the classification table is pinned here.
"""
import os
import sys

import pytest

# Import bench with its compile-cache env pre-pinned to the CPU suite's
# cache dir, so bench_env.setup() does not redirect the in-process jax
# compilation cache away from conftest's .jax_cache_cpu.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
    _ROOT, ".jax_cache_cpu"
)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
import bench  # noqa: E402


def _failing(times, exc_factory, then=42):
    """Return a fn that raises exc_factory() for the first `times` calls."""
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] <= times:
            raise exc_factory()
        return then

    fn.calls = calls
    return fn


def test_transient_runtime_error_is_retried():
    fn = _failing(2, lambda: RuntimeError("backend UNAVAILABLE: tunnel"))
    assert bench._run_with_retries(fn, attempts=3, backoff_s=0) == 42
    assert fn.calls["n"] == 3


@pytest.mark.parametrize("marker", [
    "FAILED_PRECONDITION", "DEADLINE_EXCEEDED", "INTERNAL"])
def test_each_transient_marker_is_retried(marker):
    fn = _failing(1, lambda: RuntimeError(f"status {marker} from chip"))
    assert bench._run_with_retries(fn, attempts=2, backoff_s=0) == 42
    assert fn.calls["n"] == 2


def test_non_transient_text_raises_immediately():
    # A compile / program error (INVALID_ARGUMENT) must NOT be retried:
    # it is deterministic, and looping on it burns the bench window.
    fn = _failing(5, lambda: RuntimeError("INVALID_ARGUMENT: bad program"))
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        bench._run_with_retries(fn, attempts=3, backoff_s=0)
    assert fn.calls["n"] == 1


def test_transient_marker_on_wrong_exception_type_raises():
    # The marker only rescues XlaRuntimeError/RuntimeError/OSError; a
    # ValueError mentioning UNAVAILABLE is a coding bug, not tunnel flake.
    fn = _failing(5, lambda: ValueError("UNAVAILABLE in message"))
    with pytest.raises(ValueError):
        bench._run_with_retries(fn, attempts=3, backoff_s=0)
    assert fn.calls["n"] == 1


def test_attempts_exhausted_reraises_last_error():
    fn = _failing(10, lambda: OSError("socket UNAVAILABLE"))
    with pytest.raises(OSError):
        bench._run_with_retries(fn, attempts=3, backoff_s=0)
    assert fn.calls["n"] == 3


def test_success_path_calls_once():
    fn = _failing(0, lambda: AssertionError("never"))
    assert bench._run_with_retries(fn, attempts=3, backoff_s=0) == 42
    assert fn.calls["n"] == 1
