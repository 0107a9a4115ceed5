"""Background batch prefetching (reference analog: espnet's DataLoader
worker processes / ChainerDataLoader n_iter_processes).

A daemon thread runs the host-side pipeline (file IO, tokenization,
padding) ahead of the training loop so device steps overlap data
loading. Queue depth 2 keeps at most two padded batches in flight —
enough to hide IO without ballooning host memory. Exceptions propagate
to the consumer; epoch-seeded determinism is untouched (the thread just
drains the same iterator)."""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


class PrefetchIterator:
    def __init__(self, iterable: Iterable, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for item in iterable:
                    self._q.put(item)
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                self._q.put(_SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterable: Iterable, depth: int = 2) -> PrefetchIterator:
    return PrefetchIterator(iterable, depth)
