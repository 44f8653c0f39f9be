"""Synthetic segmentation task for throughput benchmarking without data.

Parity with custom_fairseq/fairseq/benchmark/ (dummy_lm/dummy_mt/dummy_model):
generates deterministic random batches with the exact shapes the trainer
consumes, so train-step throughput can be measured with zero IO.

    task = DummySegTask(cfg)
    for batch in task.batches(n=100, batch_size=16):
        trainer.train_step(batch)
"""

from typing import Iterator

import numpy as np

from ifseg_tpu.config import Config


def dummy_seg_batch(cfg: Config, batch_size: int, seed: int = 0, src_len: int = 48):
    rng = np.random.default_rng(seed)
    s = cfg.model.patch_image_size
    hw16 = (s // 16) ** 2
    num_seg = cfg.model.num_seg_tokens
    return {
        "patch_images": rng.normal(size=(batch_size, s, s, 3)).astype(np.float32),
        "src_tokens": rng.integers(4, 1000, size=(batch_size, src_len)).astype(np.int32),
        "bos_tokens": np.zeros((batch_size, 1), np.int32),
        "target": rng.integers(0, num_seg, size=(batch_size, s, s)).astype(np.int32),
        "downsampled_target": rng.integers(
            0, num_seg, size=(batch_size, hw16)
        ).astype(np.int32),
        "aux_grid_ids": rng.integers(0, num_seg, size=(batch_size, hw16)).astype(
            np.int32
        ),
        "aux_target": rng.integers(0, num_seg, size=(batch_size, s, s)).astype(
            np.int32
        ),
    }


class DummySegTask:
    def __init__(self, cfg: Config, src_len: int = 48):
        self.cfg = cfg
        self.src_len = src_len
        num_seg = cfg.model.num_seg_tokens
        rng = np.random.default_rng(0)
        self.class_tokens = rng.integers(4, 1000, size=(num_seg + 1, 4)).astype(
            np.int32
        )
        self.class_lengths = rng.integers(1, 5, size=(num_seg + 1,)).astype(np.int32)

    def batches(self, n: int, batch_size: int) -> Iterator[dict]:
        for i in range(n):
            yield dummy_seg_batch(self.cfg, batch_size, seed=i, src_len=self.src_len)
