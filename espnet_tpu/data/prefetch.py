"""Background batch prefetching (reference analog: espnet's DataLoader
worker processes / ChainerDataLoader n_iter_processes).

A daemon thread runs the host-side pipeline (file IO, tokenization,
padding) ahead of the training loop so device steps overlap data
loading. Queue depth 2 keeps at most two padded batches in flight —
enough to hide IO without ballooning host memory. Exceptions propagate
to the consumer; epoch-seeded determinism is untouched (the thread just
drains the same iterator).

If the consumer abandons iteration early (break / exception mid-epoch),
call close() — or use the iterator as a context manager — to unblock the
worker; the worker also polls a stop flag around its queue.put so an
un-closed abandoned iterator leaks nothing past the flag check."""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


class PrefetchIterator:
    def __init__(self, iterable: Iterable, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer closed us
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in iterable:
                    if not _put(item):
                        return
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                _put(_SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the worker and drop buffered batches (idempotent)."""
        self._stop.set()
        try:  # drain so a blocked put wakes immediately
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self) -> "PrefetchIterator":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is _SENTINEL:
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterable: Iterable, depth: int = 2) -> PrefetchIterator:
    return PrefetchIterator(iterable, depth)
