"""prefetch_to_device: ordering, completeness, device placement, and the
fit-loop integration (deferred metrics must not change results)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_ode_metasolver_tpu.data import (
    batch_iterator,
    prefetch_to_device,
    synthetic_dataset,
)


def test_prefetch_preserves_order_and_content():
    items = [(np.full((2, 2), i, np.float32), np.array([i])) for i in range(7)]
    out = list(prefetch_to_device(iter(items), size=3))
    assert len(out) == 7
    for i, (x, y) in enumerate(out):
        assert isinstance(x, jax.Array) and isinstance(y, jax.Array)
        np.testing.assert_array_equal(np.asarray(x), items[i][0])
        np.testing.assert_array_equal(np.asarray(y), items[i][1])


def test_prefetch_empty_and_short_iterators():
    assert list(prefetch_to_device(iter([]), size=2)) == []
    one = [(np.zeros(1, np.float32),)]
    assert len(list(prefetch_to_device(iter(one), size=4))) == 1
    with pytest.raises(ValueError):
        next(prefetch_to_device(iter(one), size=0))


def test_prefetch_with_sharding():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("data",))
    sh = NamedSharding(mesh, P("data"))
    batches = [np.arange(8, dtype=np.float32) for _ in range(3)]
    out = list(prefetch_to_device(iter(batches), size=2, sharding=sh))
    assert len(out) == 3
    assert out[0].sharding == sh
    np.testing.assert_array_equal(np.asarray(out[1]), batches[1])


def test_prefetch_batches_feed_jitted_step():
    ds = synthetic_dataset(64, (8, 8, 1), template_seed=3)

    @jax.jit
    def norm(x, y):
        return jnp.sum(x) + jnp.sum(y)

    direct = [float(norm(jnp.asarray(x), jnp.asarray(y)))
              for x, y in batch_iterator(ds, 16, seed=0)]
    pre = [float(norm(x, y))
           for x, y in prefetch_to_device(batch_iterator(ds, 16, seed=0))]
    assert direct == pre


def test_threaded_prefetch_order_and_content():
    items = [(np.full((2, 2), i, np.float32), np.array([i])) for i in range(9)]
    out = list(prefetch_to_device(iter(items), size=3, thread=True))
    assert len(out) == 9
    for i, (x, y) in enumerate(out):
        assert isinstance(x, jax.Array)
        np.testing.assert_array_equal(np.asarray(x), items[i][0])


def test_threaded_prefetch_propagates_producer_error():
    def bad_iter():
        yield np.zeros(2, np.float32)
        raise RuntimeError("producer exploded")

    it = prefetch_to_device(bad_iter(), size=2, thread=True)
    next(it)
    import pytest
    with pytest.raises(RuntimeError, match="producer exploded"):
        next(it)


def test_threaded_prefetch_early_abandon_releases_producer():
    import itertools as _it
    import threading

    def infinite():
        i = 0
        while True:
            yield np.full(4, i, np.float32)
            i += 1

    it = prefetch_to_device(infinite(), size=2, thread=True)
    got = list(_it.islice(it, 3))
    assert len(got) == 3
    it.close()  # generator finally -> stop event
    import time as _t
    deadline = _t.time() + 5.0
    while _t.time() < deadline:
        alive = [t for t in threading.enumerate() if t.name == "prefetch"]
        if not any(t.is_alive() for t in alive):
            break
        _t.sleep(0.05)
    else:
        raise AssertionError("prefetch producer thread did not exit")


def test_threaded_prefetch_releases_producer_blocked_on_end_marker():
    """Consumer abandons after the iterator is exhausted but while the
    queue is full: the producer's _END put must honor the stop event."""
    import threading
    import time as _t

    items = [np.full(2, i, np.float32) for i in range(4)]
    it = prefetch_to_device(iter(items), size=1, thread=True)
    next(it)  # producer now blocked trying to enqueue _END behind item 2+
    it.close()
    deadline = _t.time() + 5.0
    while _t.time() < deadline:
        if not any(t.is_alive() for t in threading.enumerate()
                   if t.name == "prefetch"):
            break
        _t.sleep(0.05)
    else:
        raise AssertionError("producer stuck on _END put after abandon")


def test_threaded_iterator_passthrough_order_and_identity():
    """threaded_iterator yields items unchanged (no device_put) in order —
    the multi-host fit path depends on global arrays passing untouched."""
    from neural_ode_metasolver_tpu.data.prefetch import threaded_iterator

    items = [(np.full((2,), i, np.float32), i) for i in range(9)]
    out = list(threaded_iterator(iter(items), size=2))
    assert len(out) == 9
    for i, (x, tag) in enumerate(out):
        assert x is items[i][0]  # identity: never copied/uploaded
        assert tag == i
    with pytest.raises(ValueError):
        threaded_iterator(iter(items), size=0)


def test_multihost_batches_rejects_indivisible_batch():
    """A tail batch not divisible by process count must raise, not be
    silently truncated (single-process parity guarantee)."""
    from jax.sharding import Mesh

    from neural_ode_metasolver_tpu.runners.common import _multihost_batches

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    batches = [(np.zeros((4, 2), np.float32), np.zeros((4,), np.int32)),
               (np.zeros((3, 2), np.float32), np.zeros((3,), np.int32))]
    it = _multihost_batches(iter(batches), mesh, nproc=2, rank=0)
    next(it)  # 4 % 2 == 0: fine
    with pytest.raises(ValueError, match="not divisible"):
        next(it)
