"""Prefetching input pipeline: overlap host work with device steps.

The reference hides its CPU voxelization cost behind ``num_workers``
DataLoader processes (base_trainer_ov.py:164-181). Here ``num_workers``
thread workers assemble + device-put upcoming batches while the TPU executes
the current step. Threads (not processes) are the right host model: the
native C++ voxelizer, PNG decode, and h5 chunk decompression all release the
GIL, and the batched windows-voxelizer additionally fans out across
``num_cpu_workers`` threads *inside* one native call. Batch order is
deterministic regardless of worker count (futures are yielded in submission
order), so shuffles remain reproducible.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


class PrefetchLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool,
                 rng: Optional[np.random.Generator] = None,
                 put_fn=None, prefetch: int = 2, drop_last: bool = True,
                 pad_last: bool = False, num_workers: int = 1):
        """``drop_last=False, pad_last=True`` is the TPU-shaped equivalent of
        the reference's validation ``drop_last=False`` (base_trainer_ov.py:
        180,272): the final partial batch is padded to ``batch_size`` by
        repeating its last sample — static shapes, no recompile — and every
        batch carries a per-sample bool ``valid`` mask for the consumer to
        exclude the padding from metrics."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = rng or np.random.default_rng(0)
        self.put_fn = put_fn or (lambda b: b)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_workers = max(1, int(num_workers))

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

        def assemble(idx):
            if self.pad_last:
                pad = self.batch_size - len(idx)
                valid = np.arange(self.batch_size) < len(idx)
                if pad:
                    idx = np.concatenate([idx, np.full(pad, idx[-1])])
                batch = self.dataset.get_batch(idx)
                batch["valid"] = valid
                return self.put_fn(batch)
            return self.put_fn(self.dataset.get_batch(idx))

        # in-flight window: num_workers batches being assembled plus
        # `prefetch` completed ones waiting for the consumer
        max_inflight = self.num_workers + self.prefetch
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            it = iter(index_batches)
            try:
                for idx in it:
                    pending.append(pool.submit(assemble, idx))
                    if len(pending) >= max_inflight:
                        yield pending.pop(0).result()
                while pending:
                    yield pending.pop(0).result()
            finally:
                for f in pending:
                    f.cancel()
