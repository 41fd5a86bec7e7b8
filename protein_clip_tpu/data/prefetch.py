"""Async host->device input pipeline.

The reference tokenizes and ships every sub-batch synchronously inside the
train loop (training_utils.py:120-121). On TPU the host work (tokenize, pad)
and the host->device transfer should overlap device compute: this module
runs tokenization in a background thread pool and keeps a bounded queue of
device-resident batches ahead of the consumer.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax


def prefetch_to_device(
    host_batches: Iterable,
    prepare: Callable,
    depth: int = 2,
) -> Iterator:
    """Yield device-resident batches, staying `depth` batches ahead.

    host_batches: iterable of raw items (e.g. (peps, recs) string tuples);
    prepare: item -> pytree of arrays (tokenize + pad); transfer via
    jax.device_put happens on the producer thread so compute on the consumer
    side overlaps it.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list[BaseException] = []

    def producer():
        try:
            for item in host_batches:
                batch = jax.device_put(prepare(item))
                q.put(batch)
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
