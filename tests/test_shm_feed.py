"""Shared-memory multi-process batch feed."""

import numpy as np
import pytest

from ifseg_tpu.data.shm_feed import ShmBatchFeed


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
