"""Image-free fast path: with monitoring off, real images are never decoded.

The unsupervised step consumes only the synthetic grid (seg_criterion.py
:179-183 — the reference still decodes + augments the real row every step,
segmentation_dataset.py:210-251, purely to feed its monitoring forward).
With ``decode_real_images=false`` the host pipeline skips the base64/PNG
decode and the mmseg aug chain entirely, and the trainer consumes batches
with no real-image fields.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from utils import make_seg_tsv

from ifseg_tpu.config import TaskConfig
from ifseg_tpu.data.file_dataset import FileDataset
from ifseg_tpu.data.iterators import _to_array_dict
from ifseg_tpu.data.segmentation_dataset import SegmentationDataset
from ifseg_tpu.tokenization.dictionary import build_seg_dictionary
from ifseg_tpu.tokenization.gpt2_bpe import GPT2BPE


def _dataset(tmp_path, split="train", decode_real_images=True):
    tsv = make_seg_tsv(str(tmp_path / "d.tsv"), rows=4, num_seg=3, size=(48, 40))
    cfg = TaskConfig(
        data=tsv, num_seg_tokens=3, category_list="a, b, c",
        patch_image_size=32, orig_patch_image_size=32,
        decode_real_images=decode_real_images,
    )
    return SegmentationDataset(
        split,
        FileDataset(tsv, "0,1,2", cached_index=False),
        GPT2BPE.from_dir("assets/BPE"),
        build_seg_dictionary("assets/BPE", num_seg_tokens=3),
        cfg,
    )


def test_fast_path_skips_decode(tmp_path, monkeypatch):
    ds = _dataset(tmp_path, decode_real_images=False)
    assert ds.skip_real_images

    def boom(self, index):
        raise AssertionError("fast path must not decode the real row")

    monkeypatch.setattr(SegmentationDataset, "_decode_row", boom)
    rng = np.random.default_rng(0)
    ex = ds.get_train_example(0, rng)
    assert set(ex) == {"id", "aux_grid_ids", "aux_target"}
    hw16 = 32 // 16
    assert ex["aux_grid_ids"].shape == (hw16 * hw16,)
    assert ex["aux_target"].shape == (32, 32)


def test_fast_path_collate_and_feed_view(tmp_path):
    ds = _dataset(tmp_path, decode_real_images=False)
    rng = np.random.default_rng(1)
    batch = ds.collate_train([ds.get_train_example(i, rng) for i in range(2)])
    assert batch.patch_images is None
    assert batch.target is None
    assert batch.downsampled_target is None
    assert batch.aux_grid_ids.shape[0] == 2
    assert batch.ntokens == 2 * (32 * 32 + 1)
    # the shm-feed array view drops the None fields
    arrays = _to_array_dict(batch)
    assert "patch_images" not in arrays and "aux_grid_ids" in arrays


def test_default_path_unchanged(tmp_path):
    ds = _dataset(tmp_path, decode_real_images=True)
    assert not ds.skip_real_images
    ex = ds.get_train_example(0, np.random.default_rng(0))
    assert "patch_image" in ex and "aux_grid_ids" in ex


def test_eval_split_always_decodes(tmp_path):
    ds = _dataset(tmp_path, split="valid", decode_real_images=False)
    s = ds.get_eval_sample(0)
    assert s.ori_semantic_seg.shape == (48, 40)


@pytest.mark.slow
@pytest.mark.mesh
def test_trainer_loss_identical_without_real_fields():
    """The jitted step with monitoring off never reads the real-image keys:
    the loss from a stripped batch is bit-equal to the full batch's."""
    from test_train_step import make_batch, make_class_table, tiny_config

    from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh
    from ifseg_tpu.train.trainer import Trainer

    cfg = tiny_config()
    cfg.criterion.monitor_real_batch = False
    tokens, lengths = make_class_table(cfg.model.num_seg_tokens)
    mesh = build_mesh(MeshConfig(data_parallel=-1))

    full = make_batch(cfg, b=8, seed=3)
    stripped = {
        k: v for k, v in full.items()
        if k not in ("patch_images", "target", "downsampled_target")
    }

    losses = []
    for batch in (full, stripped):
        tr = Trainer(cfg, mesh, tokens, lengths, total_num_updates=4)
        tr.init_state()
        losses.append(float(np.asarray(tr.train_step(batch)["loss"])))
    assert losses[0] == losses[1]
