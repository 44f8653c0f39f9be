import os

import numpy as np
import pytest

from ifseg_tpu.tokenization import GPT2BPE, build_seg_dictionary


@pytest.fixture(scope="module")
def bpe(bpe_dir):
    return GPT2BPE.from_dir(bpe_dir)


def test_bpe_matches_transformers_gpt2(bpe, bpe_dir):
    """Golden test against the HF GPT-2 tokenizer built from the same vocab files."""
    from transformers import GPT2Tokenizer

    hf = GPT2Tokenizer(
        vocab_file=os.path.join(bpe_dir, "encoder.json"),
        merges_file=os.path.join(bpe_dir, "vocab.bpe"),
    )
    texts = [
        " what is the segmentation map of the image? object:",
        " frisbee",
        " concrete wall",
        "hello world",
        " clouds, playingfield",
        " a photo of 123 giraffes!",
        "  double space",
    ]
    for t in texts:
        assert bpe.encode_ids(t) == hf.encode(t), t
        assert bpe.decode_ids(bpe.encode_ids(t)) == t


def test_dictionary_layout():
    """Index layout must bit-match the reference construction
    (segmentation.py:109-136): base 50264, then mask/code/bin/seg."""
    bpe_dir = os.path.join(os.path.dirname(__file__), "..", "assets", "BPE")
    d = build_seg_dictionary(bpe_dir, num_seg_tokens=15)
    assert d.bos() == 0 and d.pad() == 1 and d.eos() == 2 and d.unk() == 3
    assert d.index("<mask>") == 50264
    assert d.index("<code_0>") == 50265
    assert d.index("<bin_0>") == 50265 + 8192
    assert d.index("<seg_0>") == 50265 + 8192 + 1000
    assert d.index("<seg_15>") == 50265 + 8192 + 1000 + 15
    assert len(d) == 50265 + 8192 + 1000 + 16


def test_encode_text_pipeline(bpe):
    """BPE string -> dictionary ids roundtrip used by the dataset
    (data/mm_data/segmentation_dataset.py:193-208)."""
    bpe_dir = os.path.join(os.path.dirname(__file__), "..", "assets", "BPE")
    d = build_seg_dictionary(bpe_dir, num_seg_tokens=15)
    line = bpe.encode(" tree")
    ids = d.encode_line(line)
    assert ids.dtype == np.int64 and len(ids) >= 1
    # ' tree' is GPT-2 token 5509; its fairseq index comes from dict.txt
    assert all(4 <= i < 50264 for i in ids)
    # seg symbols bypass BPE
    seg_ids = d.encode_line("<seg_0> <seg_3>")
    assert list(seg_ids) == [d.index("<seg_0>"), d.index("<seg_3>")]
