"""Config flag parsing, dataset sharding/rotation, iterator resume."""

import numpy as np
import pytest

from ifseg_tpu.config import from_flags, model_config_for_arch
from ifseg_tpu.data.file_dataset import FileDataset
from ifseg_tpu.data.iterators import EpochBatchIterator


def test_from_flags_reference_style():
    cfg = from_flags(
        [
            "a.tsv,b.tsv",
            "--arch=segofa_base",
            "--num-seg-tokens=150",
            "--category-list=wall, sky, road",
            "--batch-size=16",
            "--lr=5.0e-5",
            "--weight-decay=0.1",
            "--adam-betas=(0.9,0.999)",
            "--patch-image-size=512",
            "--freeze-encoder-embedding=true",
            "--encoder-drop-path-rate=0.1",
            "--best-checkpoint-metric=mIoU",
            "--maximize-best-checkpoint-metric",
            "--unknown-flag-is-ignored=whatever",
        ]
    )
    assert cfg.task.data == "a.tsv,b.tsv"
    assert cfg.model.num_seg_tokens == 150  # propagated to model too
    assert cfg.task.num_seg_tokens == 150
    assert cfg.task.categories == ["wall", "sky", "road"]
    assert cfg.optimization.batch_size == 16
    assert cfg.optimization.lr == 5e-5
    assert cfg.optimization.adam_betas == (0.9, 0.999)
    assert cfg.model.patch_image_size == 512
    assert cfg.model.freeze_encoder_embedding is True
    assert cfg.checkpoint.maximize_best_checkpoint_metric is True


def test_arch_variants():
    huge = model_config_for_arch("segofa_huge")
    assert huge.encoder_layers == 24 and huge.encoder_embed_dim == 1280
    with pytest.raises(ValueError):
        model_config_for_arch("segofa_nonexistent")


@pytest.fixture
def tsv(tmp_path):
    p = tmp_path / "d.tsv"
    rows = [f"img{i}\tseg{i}\t{i}" for i in range(10)]
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_file_dataset_slicing(tsv):
    full = FileDataset(tsv, "0,1,2", cached_index=False, slice_id=0, slice_count=1)
    assert len(full) == 10
    assert full[3] == ["img3", "seg3", "3"]

    # 3-way slicing: 4 + 3 + 3 contiguous rows (ref file_dataset.py:97-103)
    parts = [
        FileDataset(tsv, "0,1,2", cached_index=False, slice_id=i, slice_count=3)
        for i in range(3)
    ]
    assert [len(p) for p in parts] == [4, 3, 3]
    seen = [p[i][2] for p in parts for i in range(len(p))]
    assert seen == [str(i) for i in range(10)]


def test_file_dataset_row_cap(tsv):
    ds = FileDataset(tsv, "0,1,2", cached_index=False)
    ds.set_total_row_count(6)
    assert len(ds) == 6
    assert ds[5][2] == "5"


def test_file_dataset_index_cache(tsv):
    import os

    ds = FileDataset(tsv, "0,1,2", cached_index=True)
    assert os.path.exists(tsv + ".index.json")
    ds2 = FileDataset(tsv, "0,1,2", cached_index=True)
    assert ds2[7] == ["img7", "seg7", "7"]


def test_file_dataset_stale_index_invalidated(tsv):
    import os
    import time

    FileDataset(tsv, "0,1,2", cached_index=True)
    assert os.path.exists(tsv + ".index.json")
    # regenerate the TSV with different row lengths: the cached offsets are
    # now garbage and must be rebuilt, not reused
    rows = [f"longerimg{i}\tlongerseg{i}\t{i}" for i in range(6)]
    time.sleep(0.01)  # ensure mtime moves even on coarse filesystems
    with open(tsv, "w") as fp:
        fp.write("\n".join(rows) + "\n")
    ds = FileDataset(tsv, "0,1,2", cached_index=True)
    assert len(ds) == 6
    assert ds[4] == ["longerimg4", "longerseg4", "4"]


def test_iterator_resume_mid_epoch():
    made = []

    def make(i, rng):
        made.append(i)
        return i

    it = EpochBatchIterator(
        num_rows=8, batch_size=2, make_example=make, collate=lambda xs: xs,
        seed=3, buffer_size=1,
    )
    epoch_iter = it.next_epoch_itr()
    consumed = [next(epoch_iter), next(epoch_iter)]  # 2 of 4 batches
    state = it.state_dict()
    assert state["iterations_in_epoch"] == 2

    # fresh iterator restored from state resumes at batch 2
    it2 = EpochBatchIterator(
        num_rows=8, batch_size=2, make_example=lambda i, rng: i,
        collate=lambda xs: xs, seed=3, buffer_size=1,
    )
    it2.load_state_dict(state)
    rest = list(it2.next_epoch_itr())
    assert rest == [[4, 5], [6, 7]]

    # epoch rolls over after exhaustion
    assert it2.state_dict()["epoch"] == 1
    nxt = list(it2.next_epoch_itr())
    assert it2.epoch == 2 and len(nxt) == 4


def test_iterator_per_row_rng_reproducible():
    outs = {}
    for attempt in range(2):
        it = EpochBatchIterator(
            num_rows=4, batch_size=2,
            make_example=lambda i, rng: rng.integers(0, 1 << 30),
            collate=lambda xs: xs, seed=5, buffer_size=1,
        )
        outs[attempt] = [x for b in it.next_epoch_itr() for x in b]
    assert outs[0] == outs[1]


def test_iterator_row_offset_matches_global_stream():
    """Two processes each feeding half the rows must reproduce the
    single-process per-row rng stream (seeded by GLOBAL row index via
    row_offset), not duplicate it — the file layer hands each process a
    contiguous slice (file_dataset.py start_pos), so local index i on
    process p is global row p*rows_per_proc + i."""
    draw = lambda i, rng: int(rng.integers(0, 1 << 30))
    single = EpochBatchIterator(
        num_rows=8, batch_size=2, make_example=draw,
        collate=lambda xs: xs, seed=5, buffer_size=1,
    )
    golden = [x for b in single.next_epoch_itr() for x in b]
    sharded = []
    for p in range(2):
        it = EpochBatchIterator(
            num_rows=4, batch_size=2, make_example=draw,
            collate=lambda xs: xs, seed=5, buffer_size=1, row_offset=4 * p,
        )
        sharded.extend(x for b in it.next_epoch_itr() for x in b)
    assert sharded == golden
    assert len(set(golden)) == len(golden), "rng streams must be distinct"


def test_config_file_expansion(tmp_path):
    import json

    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "data": "x.tsv,y.tsv",
        "num-seg-tokens": 7,
        "lr": 1e-4,
        "category-list": "a, b, c, d, e, f, g",
    }))
    cfg = from_flags([f"--config={p}", "--batch-size=4"])
    assert cfg.task.data == "x.tsv,y.tsv"
    assert cfg.model.num_seg_tokens == 7
    assert cfg.optimization.lr == 1e-4
    assert cfg.optimization.batch_size == 4


def test_dynamic_loss_scaler():
    from ifseg_tpu.train.optim import DynamicLossScaler

    s = DynamicLossScaler(init_scale=128.0, scale_window=4, scale_factor=2.0)
    assert s.update(overflow=True)  # skip + halve
    assert s.scale == 64.0
    for _ in range(3):
        assert not s.update(overflow=False)
    assert not s.update(overflow=False)  # 4th good step -> doubles
    assert s.scale == 128.0
    # floor
    for _ in range(60):
        s.update(overflow=True)
    assert s.scale >= 1e-4


def test_reference_runscript_flags_parse():
    """The exact flag set run_scripts/IFSeg/common.sh emits (mirroring the
    reference coco_unseen.sh) must parse into the expected config."""
    argv = [
        "./dataset/ade/validation.tsv,./dataset/ade/validation.tsv",
        "--selected-cols=0,1,2", "--bpe-dir=./assets/BPE",
        "--restore-file=ofa_base.pt", "--reset-optimizer", "--reset-dataloader",
        "--reset-meters", "--save-dir=./out", "--arch=segofa_base",
        "--num-seg-tokens=150", "--category-list=wall, building, sky",
        "--prompt-prefix=what is the segmentation map of the image? object:",
        "--artificial-image-type=rand_k-1-33",
        "--unsupervised-segmentation=true",
        "--batch-size=16", "--batch-size-valid=1", "--update-freq=1",
        "--criterion-update-freq=1", "--patch-image-size=512",
        "--orig-patch-image-size=512", "--label-smoothing=0.0",
        "--freeze-encoder-embedding=true", "--freeze-decoder-embedding=true",
        "--freeze-seg-embedding=true", "--freeze-entire-resnet=true",
        "--resnet-drop-path-rate=0.0", "--encoder-drop-path-rate=0.1",
        "--decoder-drop-path-rate=0.1", "--dropout=0.1",
        "--attention-dropout=0.0", "--weight-decay=0.1",
        "--adam-betas=(0.9,0.999)", "--adam-eps=1e-08", "--clip-norm=1.0",
        "--lr-scheduler=cosine", "--lr=5.0e-5", "--warmup-ratio=0.0",
        "--max-epoch=20", "--epoch-row-count=1600",
        "--fixed-validation-seed=7", "--seed=7", "--keep-best-checkpoints=1",
        "--keep-last-epochs=1", "--save-interval=1", "--validate-interval=1",
        "--best-checkpoint-metric=mIoU", "--maximize-best-checkpoint-metric",
        "--max-src-length=80", "--max-tgt-length=20",
        "--tie-seg-projection=true", "--init-seg-with-text=true",
        "--decoder-type=surrogate", "--decoder-input-type=encoder_output",
        "--full-context-alignment=false", "--resnet-topk=3",
        "--resnet-iters=25", "--log-format=simple", "--log-interval=10",
    ]
    cfg = from_flags(argv)
    assert cfg.model.encoder_layers == 6 and cfg.model.encoder_embed_dim == 768
    assert cfg.model.num_seg_tokens == 150 and cfg.task.num_seg_tokens == 150
    assert cfg.optimization.lr == 5e-5 and cfg.optimization.lr_scheduler == "cosine"
    assert cfg.task.epoch_row_count == 1600
    assert cfg.criterion.resnet_iters == 25
    assert cfg.checkpoint.best_checkpoint_metric == "mIoU"
    assert cfg.checkpoint.reset_optimizer and cfg.checkpoint.reset_meters
    assert cfg.task.prompt_prefix.startswith("what is the segmentation")
    assert cfg.task.artificial_image_type == "rand_k-1-33"
