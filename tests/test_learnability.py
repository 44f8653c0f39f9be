"""Learnability gate: the SUPERVISED branch through the real CLI must learn a
solid-color toy dataset to high val mIoU.

Everything else in the suite asserts mechanics (loss decreases for a few
steps, checkpoints round-trip); this asserts the whole loop — TSV -> cv2 augs
-> model -> upsampled CE (seg_criterion.py:188-192 supervised branch) ->
native-res eval metric -> best-checkpoint selection — actually LEARNS
(VERDICT r3 item 2a).  Color -> class is trivially separable, so anything
under ~0.9 mIoU means a real defect (labels misaligned with pixels, a
shifted upsample, a broken metric), not a hard task.
"""

import json
import os

import pytest

from tests.utils import make_solid_seg_tsv

pytestmark = [pytest.mark.slow, pytest.mark.e2e]


def test_supervised_cli_learns_solid_colors(tmp_path):
    train_tsv = make_solid_seg_tsv(str(tmp_path / "train.tsv"), rows_per_class=4)
    val_tsv = make_solid_seg_tsv(str(tmp_path / "val.tsv"), rows_per_class=1)
    save_dir = str(tmp_path / "ckpt")

    from ifseg_tpu.cli.train import cli_main

    cli_main(
        [
            f"{train_tsv},{val_tsv}",
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
            "--category-list=red, green, blue",
            "--unsupervised-segmentation=false",
            "--patch-image-size=32",
            "--orig-patch-image-size=32",
            "--batch-size=4",
            "--data-parallel=2",
            "--max-epoch=15",
            "--lr=3e-3",
            "--dropout=0.0",
            "--encoder-drop-path-rate=0.0",
            "--decoder-drop-path-rate=0.0",
            "--bpe-dir=assets/BPE",
            f"--save-dir={save_dir}",
            "--log-interval=1",
            "--keep-last-epochs=1",
            "--keep-best-checkpoints=1",
        ]
    )

    manifest = json.load(open(os.path.join(save_dir, "manifest.json")))
    best = manifest["best_metric"]
    assert best is not None
    assert best >= 0.9, (
        f"supervised run topped out at mIoU={best} — the train loop is not "
        "learning a trivially-separable dataset"
    )
