"""Host-side streaming loader with background prefetch.

For datasets too big / too random-access to park in HBM (SR random
crops, unaligned translation pairs), a daemon thread produces the next
chunk of batches while the TPU trains on the current one — replacing the
reference's DataLoader worker *processes* (datasets/util.py:3-15) with a
double-buffered thread (PIL releases the GIL for image decode/resize).
Batches are uint8; normalization happens on device inside the step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable


class PrefetchLoader:
    """Wraps ``produce(n) -> batch_stack`` with one-chunk lookahead."""

    def __init__(self, produce: Callable[[int], object], depth: int = 2):
        self._produce = produce
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._requests: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            n = self._requests.get()
            if n is None:
                return
            self._queue.put(self._produce(n))

    def request(self, n: int):
        """Queue production of an n-batch chunk."""
        self._requests.put(n)

    def get(self):
        return self._queue.get()

    def close(self):
        self._requests.put(None)
