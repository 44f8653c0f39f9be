"""Multi-process data feed over shared memory.

The reference's analog is the Arrow plasma store (data/plasma_utils.py,
opt-in ``--use-plasma-view``) plus num_workers dataloader processes: decouple
augmentation CPU work from the training process without pickling arrays
through pipes.  Here: N worker processes run the make_example/collate
pipeline and publish fixed-shape batches into per-worker rings of
``multiprocessing.shared_memory`` blocks; the trainer maps them zero-copy.

Worker w owns its own slot ring and produces batch indices w, w+N, w+2N, …;
the consumer reads batches in order, which visits workers round-robin, so a
worker's slots recycle deterministically and out-of-order production can
never exhaust another worker's ring (no ordering deadlock).

    feed = ShmBatchFeed(make_batch_fn, template_batch, num_workers=4)
    for step in range(n):
        batch = feed.get()   # dict of numpy views into shared memory
        ...
    feed.close()
"""

import logging
import multiprocessing as mp
from multiprocessing import shared_memory
from typing import Any, Callable, Dict, List

import numpy as np

logger = logging.getLogger(__name__)


def _batch_layout(template: Dict[str, np.ndarray]):
    layout = {}
    offset = 0
    for k in sorted(template):
        v = np.asarray(template[k])
        layout[k] = (offset, v.shape, v.dtype.str)
        offset += v.nbytes
    return layout, offset


def _worker(make_batch, layout, shm_names, free_q, ready_q, start, step):
    shms = [shared_memory.SharedMemory(name=n) for n in shm_names]
    idx = start
    try:
        while True:
            slot = free_q.get()
            if slot is None:
                break
            batch = make_batch(idx)
            if batch is None:
                ready_q.put(None)
                break
            buf = shms[slot].buf
            for k, (off, shape, dtype) in layout.items():
                arr = np.ndarray(shape, dtype, buffer=buf, offset=off)
                np.copyto(arr, np.asarray(batch[k]))
            ready_q.put((idx, slot))
            idx += step
    finally:
        for s in shms:
            s.close()


class ShmBatchFeed:
    def __init__(
        self,
        make_batch: Callable[[int], Dict[str, np.ndarray]],
        template: Dict[str, np.ndarray],
        num_workers: int = 2,
        slots_per_worker: int = 2,
        ctx: str = "fork",
    ):
        self.layout, self.nbytes = _batch_layout(template)
        self.num_workers = num_workers
        mpc = mp.get_context(ctx)
        self._ready: Any = mpc.Queue()
        self._shms: List[shared_memory.SharedMemory] = []
        self._frees: List[Any] = []
        self._procs: List[Any] = []
        self._slot_owner: Dict[int, int] = {}
        slot_id = 0
        for w in range(num_workers):
            names = []
            free_q = mpc.Queue()
            for _ in range(slots_per_worker):
                shm = shared_memory.SharedMemory(create=True, size=max(self.nbytes, 1))
                self._shms.append(shm)
                names.append(shm.name)
                free_q.put(slot_id)
                self._slot_owner[slot_id] = w
                slot_id += 1
            self._frees.append(free_q)
            # each worker addresses slots by GLOBAL id; give it all names so
            # indexing lines up
        all_names = [s.name for s in self._shms]
        for w in range(num_workers):
            p = mpc.Process(
                target=_worker,
                args=(make_batch, self.layout, all_names, self._frees[w],
                      self._ready, w, num_workers),
                daemon=True,
            )
            p.start()
            self._procs.append(p)
        self._pending: Dict[int, int] = {}
        self._next = 0
        self._inflight_slot = None
        self._done_workers = 0

    def get(self, timeout: float = 300.0):
        """Next batch IN ORDER as numpy views (valid until the next get())."""
        if self._inflight_slot is not None:
            owner = self._slot_owner[self._inflight_slot]
            self._frees[owner].put(self._inflight_slot)
            self._inflight_slot = None
        while self._next not in self._pending:
            item = self._ready.get(timeout=timeout)
            if item is None:
                self._done_workers += 1
                if (
                    self._done_workers >= self.num_workers
                    and self._next not in self._pending
                ):
                    raise StopIteration
                continue
            idx, slot = item
            self._pending[idx] = slot
        slot = self._pending.pop(self._next)
        self._next += 1
        self._inflight_slot = slot
        buf = self._shms[slot].buf
        return {
            k: np.ndarray(shape, dtype, buffer=buf, offset=off)
            for k, (off, shape, dtype) in self.layout.items()
        }

    def close(self):
        for q in self._frees:
            try:
                q.put(None)
            except Exception:
                pass
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        for s in self._shms:
            try:
                s.close()
                s.unlink()
            except Exception:
                pass
