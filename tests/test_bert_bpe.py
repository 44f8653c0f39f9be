"""BertBPE (WordPiece) parity against HuggingFace BertTokenizer."""

import os
import tempfile

import pytest

from ifseg_tpu.tokenization.bert_bpe import BertBPE

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "cat", "sat", "mat", "on", "a",
    "##s", "##ting", "##ted", "sit",
    "un", "##aff", "##able", "##wanted",
    "hello", "wor", "##ld", "over",
    "你", "好", "世", "界",
    ",", "!", "?", ".", "'", "s", "n", "##t", "##'",
    "cafe", "resume", "don",
]

CASES = [
    "Hello world, the CATS sitting unaffable 你好!",
    "The cat sat on a mat.",
    "café résumé",                      # accents stripped when uncased
    "你好世界",                           # CJK chars split individually
    "over there\tthe   cat",        # unicode space, tabs, runs
    "don't overstay?",
    "zzzzz unknownword",                # full-word [UNK] fallback
    "a" * 200,                           # > max_chars_per_word -> [UNK]
    "!!,,??",
    "",
]


@pytest.fixture(scope="module")
def vocab_file():
    with tempfile.NamedTemporaryFile(
        "w", suffix=".txt", delete=False, encoding="utf-8"
    ) as f:
        f.write("\n".join(VOCAB))
        path = f.name
    yield path
    os.unlink(path)


def test_tokenize_matches_hf(vocab_file):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)
    ours = BertBPE(vocab_file, cased=False)
    for text in CASES:
        assert ours.tokenize(text) == hf.tokenize(text), text


def test_decode_matches_hf(vocab_file):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)
    ours = BertBPE(vocab_file, cased=False)
    for text in CASES:
        toks = ours.tokenize(text)
        if not toks:
            continue
        expect = hf.clean_up_tokenization(hf.convert_tokens_to_string(toks))
        assert ours.decode(ours.encode(text)) == expect, text


def test_cased_keeps_case_and_accents(vocab_file):
    ours = BertBPE(vocab_file, cased=True)
    # 'Hello' not in vocab cased -> [UNK]; lowercase 'hello' is kept
    assert ours.tokenize("hello Hello") == ["hello", "[UNK]"]


def test_reference_cn_vocab_roundtrip():
    """Spot-check against the reference's actual OFA-CN vocab when present."""
    path = "/root/reference/utils/BERT_CN_dict/vocab.txt"
    if not os.path.exists(path):
        pytest.skip("reference vocab not mounted")
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(path, do_lower_case=True)
    ours = BertBPE(path, cased=False)
    for text in [
        "一只猫坐在垫子上",
        "Image-free segmentation 模型, 2023!",
        "don't stop believing",
    ]:
        assert ours.tokenize(text) == hf.tokenize(text), text


def test_bpe_flag_reaches_task_config():
    from ifseg_tpu.config import from_flags

    cfg = from_flags(["--bpe=bert", "--bpe-dir=/tmp/x"])
    assert cfg.task.bpe == "bert"
    assert cfg.task.bpe_dir == "/tmp/x"
    assert from_flags([]).task.bpe == "gpt2"


def test_is_beginning_of_word():
    assert BertBPE.is_beginning_of_word("hello")
    assert not BertBPE.is_beginning_of_word("##ld")
