"""Shared-memory multi-process batch feed."""

import numpy as np
import pytest

from ifseg_tpu.data.shm_feed import ShmBatchFeed

pytestmark = [pytest.mark.slow, pytest.mark.e2e]


def _make_batch(idx):
    if idx >= 10:
        return None
    rng = np.random.default_rng(idx)
    return {
        "x": np.full((4, 8), idx, np.float32),
        "y": rng.integers(0, 5, size=(4,)).astype(np.int32),
    }


def test_ordered_delivery_and_content():
    template = _make_batch(0)
    feed = ShmBatchFeed(_make_batch, template, num_workers=3, slots_per_worker=2)
    try:
        for i in range(10):
            b = feed.get()
            assert (b["x"] == i).all(), i
            want = np.random.default_rng(i).integers(0, 5, size=(4,)).astype(np.int32)
            np.testing.assert_array_equal(b["y"], want)
        with pytest.raises(StopIteration):
            feed.get()
    finally:
        feed.close()


def test_epoch_iterator_with_workers_matches_threaded():
    from ifseg_tpu.data.iterators import EpochBatchIterator

    def make_example(i, rng):
        return {"v": np.full((3,), i, np.float32) + rng.uniform()}

    def collate(xs):
        return {"v": np.stack([x["v"] for x in xs])}

    def run(num_workers):
        it = EpochBatchIterator(
            num_rows=8, batch_size=2, make_example=make_example,
            collate=collate, seed=9, num_workers=num_workers,
        )
        return [np.array(b["v"]) for b in it.next_epoch_itr()]

    threaded = run(0)
    multiproc = run(2)
    assert len(threaded) == len(multiproc) == 4
    for a, b in zip(threaded, multiproc):
        np.testing.assert_array_equal(a, b)
