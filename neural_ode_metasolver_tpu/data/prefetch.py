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
from typing import Any, Iterable, Iterator, Optional

import jax

__all__ = ["prefetch_to_device"]


def prefetch_to_device(
    iterator: Iterable[Any],
    size: int = 2,
    device: Optional[Any] = None,
    sharding: Optional[Any] = None,
) -> Iterator[Any]:
    """Yield items from ``iterator`` with their array leaves already on
    device, keeping ``size`` items dispatched ahead of the consumer.

    ``device``/``sharding``: optional placement target forwarded to
    ``jax.device_put`` (a ``Sharding`` distributes the batch over a mesh —
    use ``NamedSharding(mesh, P('data', ...))`` for dp training).
    """
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    target = sharding if sharding is not None else device
    it = iter(iterator)
    queue: collections.deque = collections.deque()

    def put(item):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, target), item
        )

    def enqueue(n):
        for item in itertools.islice(it, n):
            queue.append(put(item))

    enqueue(size)
    while queue:
        item = queue.popleft()
        enqueue(1)
        yield item
