"""End-to-end CLI test: synthetic TSV -> train -> native-res eval -> checkpoint.

The analog of the reference's tests/test_binaries.py integration tests:
the real CLI on a tiny synthetic corpus (SURVEY.md §4).
"""

import json
import os

import numpy as np
import pytest

from tests.utils import make_seg_tsv


@pytest.mark.slow
@pytest.mark.e2e
def test_cli_train_e2e(tmp_path):
    tsv = make_seg_tsv(str(tmp_path / "data.tsv"), rows=4, num_seg=3)
    save_dir = str(tmp_path / "ckpt")

    from ifseg_tpu.cli.train import cli_main

    cli_main(
        [
            f"{tsv},{tsv}",
            "--arch=segofa_tiny",
            "--encoder-embed-dim=32",
            "--encoder-ffn-embed-dim=64",
            "--encoder-layers=2",
            "--encoder-attention-heads=4",
            "--decoder-embed-dim=32",
            "--decoder-ffn-embed-dim=64",
            "--decoder-layers=2",
            "--decoder-attention-heads=4",
            "--resnet-type=resnet50",
            "--num-seg-tokens=3",
            "--category-list=cat, dog, grass",
            "--patch-image-size=32",
            "--orig-patch-image-size=32",
            "--batch-size=2",
            "--data-parallel=2",
            "--max-epoch=1",
            "--lr=1e-3",
            "--dropout=0.0",
            "--encoder-drop-path-rate=0.0",
            "--decoder-drop-path-rate=0.0",
            "--bpe-dir=assets/BPE",
            f"--save-dir={save_dir}",
            "--log-interval=1",
        ]
    )

    manifest = json.load(open(os.path.join(save_dir, "manifest.json")))
    assert manifest["last"] == "checkpoint_1"
    assert manifest["best_metric"] is not None
    assert os.path.isdir(os.path.join(save_dir, "checkpoint_1"))


def _tiny_args(tsv, save_dir, extra):
    return [
        f"{tsv},{tsv}",
        "--arch=segofa_tiny",
        "--encoder-embed-dim=32",
        "--encoder-ffn-embed-dim=64",
        "--encoder-layers=2",
        "--encoder-attention-heads=4",
        "--decoder-embed-dim=32",
        "--decoder-ffn-embed-dim=64",
        "--decoder-layers=2",
        "--decoder-attention-heads=4",
        "--resnet-type=resnet50",
        "--num-seg-tokens=3",
        "--category-list=cat, dog, grass",
        "--patch-image-size=32",
        "--orig-patch-image-size=32",
        "--batch-size=2",
        "--data-parallel=2",
        "--dropout=0.0",
        "--encoder-drop-path-rate=0.0",
        "--decoder-drop-path-rate=0.0",
        "--bpe-dir=assets/BPE",
        f"--save-dir={save_dir}",
        "--log-interval=1",
    ] + extra


@pytest.mark.slow
@pytest.mark.e2e
def test_cli_max_update_stops_mid_epoch(tmp_path):
    """--max-update ends training inside the epoch (ref train.py:344-353):
    4 rows at batch 2 = 2 updates/epoch; max-update=3 must stop during
    epoch 2 and still write its checkpoint."""
    tsv = make_seg_tsv(str(tmp_path / "data.tsv"), rows=4, num_seg=3)
    save_dir = str(tmp_path / "ckpt")

    from ifseg_tpu.cli.train import cli_main

    cli_main(_tiny_args(tsv, save_dir, [
        "--max-epoch=5", "--max-update=3", "--lr=1e-3",
    ]))
    manifest = json.load(open(os.path.join(save_dir, "manifest.json")))
    assert manifest["last"] == "checkpoint_2", manifest
    assert not os.path.isdir(os.path.join(save_dir, "checkpoint_3"))


@pytest.mark.slow
@pytest.mark.e2e
def test_cli_patience_early_stop(tmp_path):
    """--patience stops after N non-improving validations (ref train.py
    should_stop_early :207-233): with lr=0 the metric never improves past
    epoch 1's, so patience=1 ends training at epoch 2 of 5."""
    tsv = make_seg_tsv(str(tmp_path / "data.tsv"), rows=4, num_seg=3)
    save_dir = str(tmp_path / "ckpt")

    from ifseg_tpu.cli.train import cli_main

    cli_main(_tiny_args(tsv, save_dir, [
        "--max-epoch=5", "--patience=1", "--lr=0.0",
    ]))
    manifest = json.load(open(os.path.join(save_dir, "manifest.json")))
    assert manifest["last"] == "checkpoint_2", manifest
    assert not os.path.isdir(os.path.join(save_dir, "checkpoint_3"))
