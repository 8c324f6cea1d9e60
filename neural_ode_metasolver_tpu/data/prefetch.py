"""Device prefetching: overlap host->device batch upload with compute.

The reference's input pipeline blocks the train loop on every batch
transfer (torch DataLoader -> ``x.to(device)`` per iteration,
odenet_mnist/runner.py:160-161).  On TPU the transfer can instead be
dispatched ahead: ``jax.device_put`` is asynchronous, so keeping a small
queue of already-dispatched batches lets the DMA ride under the previous
step's compute.  This matters doubly on remote-attached chips, where
per-batch upload latency is milliseconds.

``prefetch_to_device`` is the standard JAX double-buffering pattern: pull
``size`` batches ahead of the consumer, device_put each immediately.
``size=2`` (one in compute, one in flight) is enough; larger sizes only
add HBM pressure.
"""
from __future__ import annotations

import collections
import itertools
import queue as queue_mod
import threading
from typing import Any, Iterable, Iterator, Optional

import jax

__all__ = ["prefetch_to_device", "threaded_iterator"]

_END = object()


def prefetch_to_device(
    iterator: Iterable[Any],
    size: int = 2,
    device: Optional[Any] = None,
    sharding: Optional[Any] = None,
    thread: bool = False,
) -> Iterator[Any]:
    """Yield items from ``iterator`` with their array leaves already on
    device, keeping ``size`` items dispatched ahead of the consumer.

    ``device``/``sharding``: optional placement target forwarded to
    ``jax.device_put`` (a ``Sharding`` distributes the batch over a mesh —
    use ``NamedSharding(mesh, P('data', ...))`` for dp training). A single
    ``Sharding`` applies to every leaf; a pytree of shardings matching the
    item structure places each leaf individually (e.g. ``(x_sh, y_sh)``
    when the input and label shardings differ, as under spatial
    partitioning).

    ``thread=True`` additionally runs the *producer* (the host-side
    iterator — e.g. numpy crop/flip augmentation — plus the device_put
    dispatch) on a background thread with a bounded queue, so host batch
    prep overlaps device compute instead of serializing with it. The
    dispatch-ahead deque alone cannot hide host work: it front-loads
    transfers but still runs the iterator on the consumer's thread.
    """
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    target = sharding if sharding is not None else device
    per_leaf = sharding is not None and not isinstance(
        sharding, jax.sharding.Sharding
    )

    def put(item):
        if per_leaf:
            return jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, s), item, target
            )
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, target), item
        )

    if thread:
        return _threaded_prefetch(iterator, size, put)

    it = iter(iterator)
    buf: collections.deque = collections.deque()

    def gen():
        def enqueue(n):
            for item in itertools.islice(it, n):
                buf.append(put(item))

        enqueue(size)
        while buf:
            item = buf.popleft()
            enqueue(1)
            yield item

    return gen()


def threaded_iterator(iterator: Iterable[Any], size: int = 2) -> Iterator[Any]:
    """Run ``iterator`` on a background thread with a ``size``-bounded
    queue, yielding its items unchanged.  For producers whose items are
    already device-resident (e.g. multi-host global arrays from
    ``make_array_from_process_local_data``, which ``jax.device_put``
    must NOT touch — its leaves span non-addressable devices): the
    host-side work (augmentation, slicing, assembly dispatch) overlaps
    the consumer's device compute, exactly like
    ``prefetch_to_device(thread=True)`` minus the transfer."""
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    return _threaded_prefetch(iterator, size, lambda item: item)


def _threaded_prefetch(iterator, size, put) -> Iterator[Any]:
    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    stop = threading.Event()

    def offer(item) -> bool:
        """Bounded put that gives up once the consumer abandoned."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def producer():
        try:
            for item in iterator:
                if not offer(put(item)):
                    return
            offer(_END)
        except BaseException as e:  # propagate to the consumer
            offer(e)

    t = threading.Thread(target=producer, daemon=True, name="prefetch")

    def gen():
        # start lazily on first next(): a constructed-but-never-iterated
        # generator must not leak the thread + `size` device-resident
        # batches (its finally-cleanup only runs once iteration starts)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # consumer abandoned early: release the producer
            stop.set()

    return gen()
