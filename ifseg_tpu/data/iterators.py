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
        num_workers: int = 0,  # >0: multi-process shared-memory feed
        row_offset: int = 0,  # global row index of local row 0 (multi-process)
    ):
        self.num_rows = num_rows
        self.batch_size = batch_size
        self.make_example = make_example
        self.collate = collate
        self.seed = seed
        self.row_offset = row_offset
        self.epoch = max(epoch, 1)
        self.buffer_size = buffer_size
        self.drop_last = drop_last
        self.num_workers = num_workers
        self._cur: Optional["_PrefetchIterator"] = None
        self._next_offset = 0

    def _make_batch(self, epoch: int, b: int):
        """Build batch ``b`` of ``epoch`` (shared by both feed backends)."""
        lo = b * self.batch_size
        hi = min(lo + self.batch_size, self.num_rows)
        examples = []
        for i in range(lo, hi):
            # per-row rng keyed by the GLOBAL row index: reproducible
            # regardless of worker count/resume, and distinct across
            # processes (each feeds a different file slice — seeding by the
            # local index would hand every process the same random grids,
            # ref analog: rank-sliced rows at file_dataset.py:40-45)
            rng = np.random.default_rng((self.seed, epoch, self.row_offset + i))
            examples.append(self.make_example(i, rng))
        return self.collate(examples)

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
            # stop the old producer before starting a new one: two threads
            # interleaving reads against the shared dataset would waste work
            # and leak a blocked thread per resume
            self._cur.close()
        # else: _next_offset holds a restored mid-epoch position (or 0)
        if self.num_workers > 0:
            self._cur = _ShmIterator(self, self.epoch, self._next_offset)
        else:
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


def _to_array_dict(batch):
    """Array-only view of a batch (dict or SegBatch-like dataclass) for the
    fixed-shape shared-memory feed."""
    if isinstance(batch, dict):
        items = batch.items()
    else:
        items = vars(batch).items()
    out = {}
    for k, v in items:
        if v is None or not hasattr(v, "shape"):
            continue
        arr = np.asarray(v)
        if not np.issubdtype(arr.dtype, np.number) and arr.dtype != bool:
            continue  # string ids etc. don't belong in device batches
        out[k] = arr
    return out


class _ShmIterator:
    """Multi-process feed backend (data/shm_feed.py); same interface as
    _PrefetchIterator but batches come back as plain dicts of arrays."""

    def __init__(self, parent: "EpochBatchIterator", epoch: int, start_batch: int):
        from ifseg_tpu.data.shm_feed import ShmBatchFeed

        self.parent = parent
        self.epoch = epoch
        self.count = start_batch
        self.total = len(parent)
        self.exhausted = start_batch >= self.total

        if self.exhausted:
            self._feed = None
            return
        template = _to_array_dict(parent._make_batch(epoch, start_batch))

        def make(i):
            b = start_batch + i
            if b >= self.total:
                return None
            return _to_array_dict(parent._make_batch(epoch, b))

        self._feed = ShmBatchFeed(
            make, template, num_workers=parent.num_workers,
            slots_per_worker=max(parent.buffer_size, 2),
        )

    def __iter__(self):
        return self

    def __next__(self):
        if self.exhausted:
            self.close()
            raise StopIteration
        try:
            batch = self._feed.get()
        except StopIteration:
            self.exhausted = True
            self.close()
            raise
        self.count += 1
        if self.count >= self.total:
            self.exhausted = True
        # copy out of the shared-memory slot: consumers may hand the batch to
        # an async device transfer that outlives the slot's recycling
        return {k: np.array(v) for k, v in batch.items()}

    def close(self):
        if self._feed is not None:
            self._feed.close()
            self._feed = None


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
            self._queue.put(p._make_batch(self.epoch, b))
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
        # drain so a producer blocked in queue.put() can observe _stop and
        # exit (put blocks when the buffer is full)
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
