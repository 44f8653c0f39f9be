"""Sequence generator + search strategies (fixture-model tests, the
reference's approach: custom_fairseq/tests/test_sequence_generator.py with
tests/utils.py sequence_generator_setup scripted probabilities)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ifseg_tpu.generate.search import (
    BeamSearch,
    DiverseBeamSearch,
    DiverseSiblingsSearch,
    Sampling,
)
from ifseg_tpu.generate.sequence_generator import SequenceGenerator
from ifseg_tpu.ops.ngram_block import ngram_repeat_mask

BOS, PAD, EOS, UNK = 0, 1, 2, 3


def scripted_step_fn(table):
    """table: (V_prev, V) row-stochastic transition probs; next-token dist
    depends only on the previous token — a Markov fixture."""
    logt = jnp.log(jnp.asarray(table, jnp.float32) + 1e-9)

    def step_fn(tokens, step, cache):
        prev = jnp.take_along_axis(
            tokens, jnp.full((tokens.shape[0], 1), step, jnp.int32), axis=1
        )[:, 0]
        return logt[prev], cache

    return step_fn


def test_greedy_path_found():
    # vocab: 0..5; from BOS, token 4 has prob .9; from 4, EOS has .9
    v = 6
    t = np.full((v, v), 0.01)
    t[BOS, 4] = 0.9
    t[4, EOS] = 0.9
    t[4, 5] = 0.05
    t = t / t.sum(1, keepdims=True)
    gen = SequenceGenerator(
        scripted_step_fn(t), v, beam_size=2, max_len=5, min_len=1
    )
    out = jax.jit(lambda: gen(bsz=2, cache=()))()
    best = np.asarray(out.tokens)[:, 0]
    # best hypothesis: BOS 4 EOS
    assert (best[:, 0] == BOS).all()
    assert (best[:, 1] == 4).all()
    assert (best[:, 2] == EOS).all()
    assert np.asarray(out.scores)[:, 0].max() <= 0.0


def test_min_len_blocks_early_eos():
    v = 6
    t = np.full((v, v), 0.01)
    t[BOS, EOS] = 0.95  # wants to stop immediately
    t[BOS, 4] = 0.02
    t[4, 5] = 0.9
    t[5, EOS] = 0.9
    t = t / t.sum(1, keepdims=True)
    gen = SequenceGenerator(
        scripted_step_fn(t), v, beam_size=2, max_len=6, min_len=3
    )
    out = gen(bsz=1, cache=())
    best = np.asarray(out.tokens)[0, 0]
    eos_pos = np.argmax(best == EOS)
    assert eos_pos >= 3, best  # bos + >= 3 tokens before eos


def test_max_len_forces_eos():
    v = 6
    t = np.full((v, v), 0.01)
    t[:, 4] = 0.95  # never wants to stop
    t = t / t.sum(1, keepdims=True)
    gen = SequenceGenerator(
        scripted_step_fn(t), v, beam_size=2, max_len=4, min_len=1
    )
    out = gen(bsz=1, cache=())
    best = np.asarray(out.tokens)[0, 0]
    assert EOS in best.tolist()
    assert np.argmax(best == EOS) <= 5


def test_pinned_length_seg_variant():
    """max_len == min_len pins hypothesis length (the seg generator's
    configuration, sequence_generator.py:227-229)."""
    v = 8
    rng = np.random.default_rng(0)
    t = rng.uniform(0.01, 1.0, size=(v, v))
    t[:, PAD] = 0
    t = t / t.sum(1, keepdims=True)
    gen = SequenceGenerator(
        scripted_step_fn(t), v, beam_size=3, max_len=4, min_len=4
    )
    out = gen(bsz=2, cache=())
    toks = np.asarray(out.tokens)
    for b in range(2):
        best = toks[b, 0]
        eos_pos = np.argmax(best == EOS)
        assert eos_pos == 5, best  # bos + exactly 4 tokens + eos


def test_ngram_repeat_mask():
    toks = jnp.asarray([[0, 5, 6, 5, 1, 1, 1]], jnp.int32)
    # step=3: prefix 0 5 6 5; last (n-1)=1 token is 5; bigram "5 6" exists
    m = ngram_repeat_mask(toks, step=3, ngram_size=2, vocab_size=8)
    assert bool(m[0, 6])  # 6 would recreate bigram (5, 6)
    assert not bool(m[0, 4])


def test_no_repeat_ngram_in_generator():
    v = 8
    t = np.full((v, v), 1e-4)
    # strongly prefers the cycle 4 -> 5 -> 4 -> 5 ...
    t[BOS, 4] = 0.9
    t[4, 5] = 0.9
    t[5, 4] = 0.9
    t[4, EOS] = 0.05
    t[5, EOS] = 0.05
    t[5, 6] = 0.03
    t[4, 6] = 0.03
    t[6, EOS] = 0.5
    t = t / t.sum(1, keepdims=True)
    gen = SequenceGenerator(
        scripted_step_fn(t), v, beam_size=2, max_len=6, min_len=1,
        no_repeat_ngram_size=2,
    )
    out = gen(bsz=1, cache=())
    best = np.asarray(out.tokens)[0, 0]
    # no bigram repeats before eos
    eos_pos = int(np.argmax(best == EOS))
    grams = set()
    for i in range(eos_pos - 1):
        g = (best[i], best[i + 1])
        assert g not in grams, best
        grams.add(g)


def test_sampling_topk_respects_support():
    v = 10
    lprobs = jnp.log(
        jnp.asarray(np.random.default_rng(0).dirichlet(np.ones(v), size=(2, 3)))
    )
    s = Sampling(sampling_topk=2)
    cs, ci, cb = s.step(1, lprobs, None, jax.random.PRNGKey(0))
    top2 = np.argsort(-np.asarray(lprobs), axis=-1)[:, :, :2]
    for b in range(2):
        for beam in range(3):
            assert np.asarray(ci)[b, beam] in top2[b, beam]


def test_diverse_beam_groups_differ():
    v = 12
    rng = np.random.default_rng(1)
    lp = jnp.log(jnp.asarray(rng.dirichlet(np.ones(v), size=(1, 4))))
    dbs = DiverseBeamSearch(num_groups=2, diversity_strength=10.0)
    cs, ci, cb = dbs.step(1, lp, jnp.zeros((1, 4)))
    # with huge diversity strength the second group avoids group 1's tokens
    g1 = set(np.asarray(ci)[0, :2].tolist())
    g2 = set(np.asarray(ci)[0, 2:4].tolist())
    assert g1.isdisjoint(g2), (g1, g2)


def test_diverse_siblings_balanced():
    v = 12
    rng = np.random.default_rng(2)
    lp = jnp.log(jnp.asarray(rng.dirichlet(np.ones(v), size=(2, 3))))
    ds = DiverseSiblingsSearch(diversity_rate=0.5)
    cs, ci, cb = ds.step(1, lp, jnp.zeros((2, 3)))
    assert cs.shape == (2, 6)
    assert (np.asarray(cb) < 3).all()
