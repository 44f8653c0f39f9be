"""BLEU / edit distance / schedulers."""

import numpy as np
import pytest

import jax.numpy as jnp

from ifseg_tpu.ops.edit_distance import batched_edit_distance
from ifseg_tpu.train.optim import (
    build_schedule,
    fixed_schedule,
    inverse_sqrt_schedule,
    polynomial_decay_schedule,
)
from ifseg_tpu.utils.scoring import corpus_bleu, edit_distance, wer


def test_bleu_perfect_match():
    hyp = [[1, 2, 3, 4, 5]]
    out = corpus_bleu(hyp, hyp)
    assert abs(out["bleu"] - 100.0) < 1e-6


def test_bleu_partial():
    out = corpus_bleu([[1, 2, 3, 4]], [[1, 2, 5, 6]])
    assert 0 <= out["bleu"] < 50
    assert out["precisions"][0] == 0.5


def test_bleu_brevity_penalty():
    short = corpus_bleu([[1, 2]], [[1, 2, 3, 4]], smooth=True)
    assert short["brevity_penalty"] < 1.0


def test_edit_distance_host():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert wer([1, 2, 3], [1, 4, 3]) == pytest.approx(1 / 3)


def test_batched_edit_distance_matches_host():
    rng = np.random.default_rng(0)
    cases = []
    for _ in range(6):
        la, lb = rng.integers(1, 9, 2)
        cases.append((rng.integers(0, 4, la), rng.integers(0, 4, lb)))
    la_max = max(len(a) for a, _ in cases)
    lb_max = max(len(b) for _, b in cases)
    a = np.zeros((len(cases), la_max), np.int32)
    b = np.zeros((len(cases), lb_max), np.int32)
    a_len = np.zeros(len(cases), np.int32)
    b_len = np.zeros(len(cases), np.int32)
    for i, (x, y) in enumerate(cases):
        a[i, : len(x)] = x
        b[i, : len(y)] = y
        a_len[i], b_len[i] = len(x), len(y)
    got = np.asarray(
        batched_edit_distance(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(a_len), jnp.asarray(b_len)
        )
    )
    want = [edit_distance(list(x), list(y)) for x, y in cases]
    np.testing.assert_array_equal(got, want)


def test_schedulers():
    inv = inverse_sqrt_schedule(1.0, warmup_updates=100)
    assert float(inv(0)) < float(inv(99))
    assert float(inv(100)) > float(inv(400))  # decays as 1/sqrt
    assert float(inv(400)) == pytest.approx(1.0 * (100 / 400) ** 0.5, rel=1e-3)
    assert float(inv(0)) == pytest.approx(0.0)  # first update at warmup_init_lr

    poly = polynomial_decay_schedule(1.0, 100, warmup_updates=10)
    assert float(poly(5)) == pytest.approx(0.5)
    assert float(poly(55)) == pytest.approx(0.5, rel=1e-2)
    assert float(poly(100)) == pytest.approx(0.0, abs=1e-6)

    assert float(fixed_schedule(0.3)(123)) == pytest.approx(0.3)

    cos = build_schedule("cosine", 1.0, 100, None)
    assert float(cos(0)) == pytest.approx(1.0)
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-6)


def test_rouge_l():
    from ifseg_tpu.utils.scoring import rouge_l

    same = rouge_l([1, 2, 3, 4], [1, 2, 3, 4])
    assert same["f"] == pytest.approx(1.0)
    partial = rouge_l([1, 2, 9, 4], [1, 2, 3, 4])
    assert 0 < partial["f"] < 1
    assert rouge_l([], [1, 2])["f"] == 0.0


def test_cider_d():
    from ifseg_tpu.utils.scoring import cider_d

    hyps = [[1, 2, 3, 4, 5], [6, 7, 8, 9]]
    refs = [[[1, 2, 3, 4, 5]], [[6, 7, 8, 9]]]
    perfect = cider_d(hyps, refs)
    noisy = cider_d([[1, 9, 9, 9, 5], [6, 9, 9, 9]], refs)
    assert perfect > noisy >= 0.0
