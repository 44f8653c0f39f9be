"""The reliability sanitizers are wired into the product train loop — not
just library functions (VERDICT round-1 item 6; ref trainer.py:1408-1445 runs
its grad-norm cross-rank check every step and aborts on mismatch)."""

import numpy as np
import pytest

from tests.utils import make_seg_tsv

TINY_FLAGS = [
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
    "--dropout=0.0",
    "--encoder-drop-path-rate=0.0",
    "--decoder-drop-path-rate=0.0",
    "--bpe-dir=assets/BPE",
    "--log-interval=1",
    "--no-save",
]


@pytest.mark.slow
@pytest.mark.mesh
def test_desynced_grad_norms_abort(tmp_path, monkeypatch):
    """A failing cross-host grad-norm check hard-stops the run."""
    import ifseg_tpu.cli.train as cli_train
    import ifseg_tpu.utils.reliability as reliability

    monkeypatch.setattr(reliability, "check_grad_norms", lambda *a, **k: False)

    tsv = make_seg_tsv(str(tmp_path / "d.tsv"), rows=4, num_seg=3)
    with pytest.raises(RuntimeError, match="desynced"):
        cli_train.cli_main([f"{tsv},{tsv}", "--lr=1e-3"] + TINY_FLAGS)


@pytest.mark.slow
@pytest.mark.mesh
def test_persistent_nonfinite_aborts(tmp_path):
    """A diverging run (NaN grads every step) escalates to FloatingPointError
    after max_consecutive_nonfinite updates instead of spinning forever."""
    import ifseg_tpu.cli.train as cli_train

    tsv = make_seg_tsv(str(tmp_path / "d.tsv"), rows=8, num_seg=3)
    with pytest.raises(FloatingPointError, match="non-finite"):
        # lr=NaN makes every update skip with n_nonfinite=1;
        # max-consecutive-nonfinite=2 trips on the second log interval
        cli_train.cli_main(
            [f"{tsv},{tsv}", "--lr=nan", "--max-consecutive-nonfinite=2"]
            + TINY_FLAGS
        )
