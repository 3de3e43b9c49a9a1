"""Prefetching input pipeline: overlap host work with device steps.

The reference hides its CPU voxelization cost behind ``num_workers``
DataLoader processes (base_trainer_ov.py:164-181). Here a background thread
assembles + device-puts the next batches while the TPU executes the current
step — the native C++ voxelizer releases the GIL, so one thread suffices on
this host. ``prefetch`` batches are kept in flight.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


class PrefetchLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool,
                 rng: Optional[np.random.Generator] = None,
                 put_fn=None, prefetch: int = 2, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = rng or np.random.default_rng(0)
        self.put_fn = put_fn or (lambda b: b)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        stop = n - self.batch_size + 1 if self.drop_last else n
        index_batches = [
            order[i : i + self.batch_size]
            for i in range(0, stop, self.batch_size)
        ]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error = []

        def worker():
            try:
                for idx in index_batches:
                    q.put(self.put_fn(self.dataset.get_batch(idx)))
            except BaseException as e:  # propagate into the consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if error:
            raise error[0]
