"""Resumable, prefetching epoch-batch iterator.

Capability parity with fairseq's EpochBatchIterator/CountingIterator/
BufferedIterator (custom_fairseq/fairseq/data/iterators.py:27-641) as used by
the OFA task's custom sequential sampler (tasks/ofa_task.py:120-165):
contiguous index batches, no shuffling (row sharding already happened at the
file layer), trailing short batch dropped to keep shapes static (the reference
instead pads a zero-weight dummy batch — unnecessary under a fixed-shape
contract where every rank owns the same row count per epoch cap), resumable at
batch granularity via ``state_dict``.

Prefetch runs in a background thread (the reference's BufferedIterator); the
augmentation work is numpy/cv2 which releases the GIL for the heavy ops.
"""

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class EpochBatchIterator:
    def __init__(
        self,
        num_rows: int,
        batch_size: int,
        make_example: Callable,  # (index, rng) -> example
        collate: Callable,  # [examples] -> batch
        seed: int = 1,
        epoch: int = 1,
        buffer_size: int = 2,
        drop_last: bool = True,
    ):
        self.num_rows = num_rows
        self.batch_size = batch_size
        self.make_example = make_example
        self.collate = collate
        self.seed = seed
        self.epoch = max(epoch, 1)
        self.buffer_size = buffer_size
        self.drop_last = drop_last
        self._cur: Optional["_PrefetchIterator"] = None
        self._next_offset = 0

    def __len__(self):
        if self.drop_last:
            return self.num_rows // self.batch_size
        return (self.num_rows + self.batch_size - 1) // self.batch_size

    @property
    def iterations_in_epoch(self) -> int:
        return self._cur.count if self._cur is not None else self._next_offset

    @property
    def end_of_epoch(self) -> bool:
        return self._cur is None or self._cur.exhausted

    def next_epoch_itr(self, shuffle: bool = False) -> Iterator:
        if self._cur is not None:
            if self._cur.exhausted:
                # roll to a fresh epoch
                self.epoch += 1
                self._next_offset = 0
            else:
                # resume the in-flight epoch at its current position
                self._next_offset = self._cur.count
        # else: _next_offset holds a restored mid-epoch position (or 0)
        self._cur = _PrefetchIterator(self, self.epoch, self._next_offset)
        return self._cur

    def state_dict(self):
        return {
            "epoch": self.epoch,
            "iterations_in_epoch": self.iterations_in_epoch,
            "seed": self.seed,
        }

    def load_state_dict(self, state) -> None:
        self.epoch = state.get("epoch", 1)
        self.seed = state.get("seed", self.seed)
        it = state.get("iterations_in_epoch", 0)
        if it >= len(self):
            self.epoch += 1
            it = 0
        self._next_offset = it
        self._cur = None


class _PrefetchIterator:
    def __init__(self, parent: EpochBatchIterator, epoch: int, start_batch: int):
        self.parent = parent
        self.epoch = epoch
        self.count = start_batch
        self.total = len(parent)
        self.exhausted = start_batch >= self.total
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(parent.buffer_size, 1))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, args=(start_batch,), daemon=True)
        self._thread.start()

    def _worker(self, start_batch: int):
        p = self.parent
        for b in range(start_batch, self.total):
            if self._stop.is_set():
                break
            lo = b * p.batch_size
            hi = min(lo + p.batch_size, p.num_rows)
            examples = []
            for i in range(lo, hi):
                # per-row rng: reproducible regardless of worker count/resume
                rng = np.random.default_rng((p.seed, self.epoch, i))
                examples.append(p.make_example(i, rng))
            self._queue.put(p.collate(examples))
        self._queue.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        if self.exhausted:
            raise StopIteration
        batch = self._queue.get()
        if batch is None:
            self.exhausted = True
            raise StopIteration
        self.count += 1
        return batch

    def close(self):
        self._stop.set()
