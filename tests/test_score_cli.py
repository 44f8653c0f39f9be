"""Scoring CLI (fairseq_cli/score.py parity + extra metrics)."""

import pytest

from ifseg_tpu.cli.score import cli_main


@pytest.fixture
def files(tmp_path):
    ref = tmp_path / "ref.txt"
    sysf = tmp_path / "sys.txt"
    ref.write_text("the cat sat on the mat\na quick brown fox\n")
    sysf.write_text("the cat sat on a mat\na quick brown fox\n")
    return str(sysf), str(ref)


def test_bleu_line(files, capsys):
    sysf, ref = files
    cli_main(["-s", sysf, "-r", ref])
    out = capsys.readouterr().out
    assert out.startswith("BLEU4 = 68.87, 90.0/75.0/66.7/50.0")
    assert "BP=1.000" in out and "syslen=10, reflen=10" in out


def test_perfect_match_is_100(files, capsys, tmp_path):
    _, ref = files
    cli_main(["-s", ref, "-r", ref])
    assert capsys.readouterr().out.startswith("BLEU4 = 100.00")


def test_other_metrics(files, capsys):
    sysf, ref = files
    cli_main(["-s", sysf, "-r", ref, "--metric", "wer"])
    assert capsys.readouterr().out.strip() == "WER = 10.00"
    cli_main(["-s", sysf, "-r", ref, "--metric", "rouge"])
    assert capsys.readouterr().out.startswith("ROUGE-L = 91.67")
    cli_main(["-s", sysf, "-r", ref, "--metric", "cider"])
    assert capsys.readouterr().out.startswith("CIDEr-D = ")


def test_sentence_bleu(files, capsys):
    sysf, ref = files
    cli_main(["-s", sysf, "-r", ref, "--sentence-bleu"])
    lines = capsys.readouterr().out.strip().split("\n")
    assert len(lines) == 2
    assert lines[1] == "1 BLEU4 = 100.00"


def test_errors(files):
    sysf, ref = files
    with pytest.raises(SystemExit, match="does not exist"):
        cli_main(["-s", sysf, "-r", "/nonexistent/ref.txt"])
