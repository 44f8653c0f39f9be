"""Constraint-trie and constraint_range decoding (utils/trie.py +
models/sequence_generator.py:130-137, :855-888 semantics, on-device)."""

import numpy as np

import jax
import jax.numpy as jnp

from ifseg_tpu.generate.sequence_generator import SequenceGenerator
from ifseg_tpu.generate.trie import (
    ConstraintTrie,
    trie_advance,
    trie_token_mask,
)

BOS, PAD, EOS, UNK = 0, 1, 2, 3


def build_trie(seqs, eos=EOS):
    t = ConstraintTrie(eos)
    for s in seqs:
        t.insert([BOS] + list(s) + [eos])
    return t


def test_host_trie_reference_semantics():
    t = ConstraintTrie(EOS)
    t.insert([BOS, 5, 6, EOS])
    t.insert([BOS, 5, 7, EOS])
    assert sorted(t.get_next_layer([BOS, 5])) == [6, 7]
    assert t.get_next_layer([BOS, 5, 6]) == [EOS]
    # off-trie prefix -> [eos] fallback (reference trie.py get_next_layer)
    assert t.get_next_layer([BOS, 9]) == [EOS]


def test_packed_matches_host():
    seqs = [[5, 6], [5, 7, 8], [9]]
    t = build_trie(seqs)
    packed = t.pack()
    v = 12
    rng = np.random.default_rng(0)
    # walk every prefix of every sequence plus some dead prefixes
    prefixes = [[BOS]] + [
        [BOS] + list(s[:k]) for s in seqs for k in range(len(s) + 1)
    ] + [[BOS, 11], [BOS, 5, 5]]
    for prefix in prefixes:
        node = jnp.zeros((), jnp.int32)
        for tok in prefix:
            node = trie_advance(packed, node, jnp.asarray(tok))
        mask = np.asarray(trie_token_mask(packed, node, v))
        allowed = set(np.nonzero(mask)[0].tolist())
        assert allowed == set(t.get_next_layer(prefix)), prefix


def uniform_step_fn(v):
    def step_fn(tokens, step, cache):
        return jnp.zeros((tokens.shape[0], v), jnp.float32), cache

    return step_fn


def test_generator_trie_only_emits_trie_sequences():
    v = 12
    seqs = [[5, 6], [5, 7, 8], [9, 10, 4, 11]]
    packed = build_trie(seqs).pack()
    gen = SequenceGenerator(
        uniform_step_fn(v), v, beam_size=4, max_len=6, min_len=1,
        constraint_trie=packed,
    )
    out = jax.jit(lambda: gen(bsz=2, cache=()))()
    toks = np.asarray(out.tokens)  # (2, 4, L)
    scores = np.asarray(out.scores)
    valid = {tuple(s) for s in seqs}
    n_live = 0
    for b in range(toks.shape[0]):
        for k in range(toks.shape[1]):
            if scores[b, k] < -1e6:
                # over-provisioned beam: only 3 trie sequences exist; the 4th
                # slot is a dead beam carrying the ~-1e9 renormalized mask
                continue
            n_live += 1
            seq = toks[b, k].tolist()
            assert seq[0] == BOS
            body = []
            for x in seq[1:]:
                if x == EOS:
                    break
                body.append(x)
            assert tuple(body) in valid, seq
    assert n_live == 6  # all 3 trie sequences finished, per batch element


def test_generator_trie_beams_are_distinct_sequences():
    v = 12
    seqs = [[5, 6], [5, 7, 8], [9, 10, 4, 11]]
    packed = build_trie(seqs).pack()
    gen = SequenceGenerator(
        uniform_step_fn(v), v, beam_size=3, max_len=6, min_len=1,
        constraint_trie=packed,
    )
    out = jax.jit(lambda: gen(bsz=1, cache=()))()
    toks = np.asarray(out.tokens)[0]
    uniq = {tuple(t.tolist()) for t in toks}
    assert len(uniq) == 3  # all three trie sequences recovered


def test_constraint_range_masks_outside_ids():
    v = 16
    rng = np.random.default_rng(1)
    t = rng.random((v, v)) + 1e-3
    logt = jnp.log(jnp.asarray(t / t.sum(1, keepdims=True), jnp.float32))

    def step_fn(tokens, step, cache):
        prev = jnp.take_along_axis(
            tokens, jnp.full((tokens.shape[0], 1), step, jnp.int32), axis=1
        )[:, 0]
        return logt[prev], cache

    gen = SequenceGenerator(
        step_fn, v, beam_size=3, max_len=5, min_len=1,
        constraint_range="8,12",
    )
    out = jax.jit(lambda: gen(bsz=2, cache=()))()
    toks = np.asarray(out.tokens)
    allowed = set(range(4)) | set(range(8, 12)) | {PAD}
    assert set(toks.ravel().tolist()) <= allowed, np.unique(toks)


def test_zero_shot_masks_after_normalization():
    """zero_shot keeps raw (unrenormalized) log-probs on allowed ids: the
    allowed-token scores must match the unconstrained model's log-probs."""
    v = 8
    t = np.full((v, v), 0.01)
    t[BOS, 5] = 0.5
    t[BOS, 6] = 0.3
    t[5, EOS] = 0.9
    t[6, EOS] = 0.9
    t = t / t.sum(1, keepdims=True)
    logt = jnp.log(jnp.asarray(t, jnp.float32))

    def step_fn(tokens, step, cache):
        prev = jnp.take_along_axis(
            tokens, jnp.full((tokens.shape[0], 1), step, jnp.int32), axis=1
        )[:, 0]
        return logt[prev], cache

    packed = build_trie([[5]]).pack()
    gen = SequenceGenerator(
        step_fn, v, beam_size=1, max_len=3, min_len=1,
        constraint_trie=packed, zero_shot=True, normalize_scores=False,
    )
    out = jax.jit(lambda: gen(bsz=1, cache=()))()
    toks = np.asarray(out.tokens)[0, 0]
    assert toks[1] == 5 and toks[2] == EOS
    expect = float(np.log(t[BOS, 5]) + np.log(t[5, EOS]))
    np.testing.assert_allclose(float(out.scores[0, 0]), expect, rtol=1e-5)


def test_ensemble_step_fn_averages_probs():
    """Ensemble decode (EnsembleModel semantics): avg prob space, and a
    2-model ensemble of identical models == the single model."""
    from ifseg_tpu.generate.sequence_generator import ensemble_step_fn

    v = 8
    rng = np.random.default_rng(3)
    t1 = rng.random((v, v)) + 1e-3
    t2 = rng.random((v, v)) + 1e-3

    def mk(t):
        logt = jnp.log(jnp.asarray(t / t.sum(1, keepdims=True), jnp.float32))

        def step_fn(tokens, step, cache):
            prev = jnp.take_along_axis(
                tokens, jnp.full((tokens.shape[0], 1), step, jnp.int32), axis=1
            )[:, 0]
            return logt[prev], cache

        return step_fn

    ens = ensemble_step_fn([mk(t1), mk(t2)])
    toks = jnp.zeros((2, 4), jnp.int32)
    lp, _ = ens(toks, jnp.asarray(0), ((), ()))
    expect = np.log((t1 / t1.sum(1, keepdims=True) + t2 / t2.sum(1, keepdims=True))[0] / 2)
    np.testing.assert_allclose(np.asarray(lp[0]), expect, rtol=1e-5)

    # identical models -> identical generation to the single model
    g1 = SequenceGenerator(mk(t1), v, beam_size=2, max_len=4, min_len=1)
    o1 = jax.jit(lambda: g1(bsz=1, cache=()))()
    g2 = SequenceGenerator(
        ensemble_step_fn([mk(t1), mk(t1)]), v, beam_size=2, max_len=4, min_len=1
    )
    o2 = jax.jit(lambda: g2(bsz=1, cache=((), ())))()
    np.testing.assert_array_equal(np.asarray(o1.tokens), np.asarray(o2.tokens))
    np.testing.assert_allclose(
        np.asarray(o1.scores), np.asarray(o2.scores), rtol=1e-5
    )


def test_lexical_advance_state():
    from ifseg_tpu.generate.lexical import (
        lexical_advance, lexical_bank, lexical_init, pack_constraints,
    )

    cons = pack_constraints([[[5, 6], [9]]])  # 1 sentence, 2 phrases
    prog = lexical_init(cons, beam=1)  # (1,1,2)
    # bank = consumed constraint tokens (partial progress counts, DBA §3)
    for tok, expect_bank in [(4, 0), (5, 1), (6, 2), (5, 2), (9, 3)]:
        prog = lexical_advance(cons, prog, jnp.full((1, 1), tok, jnp.int32))
        assert int(lexical_bank(cons, prog)[0, 0]) == expect_bank, tok
    # mismatch mid-phrase resets to first-token check
    prog = lexical_init(cons, beam=1)
    prog = lexical_advance(cons, prog, jnp.full((1, 1), 5, jnp.int32))
    prog = lexical_advance(cons, prog, jnp.full((1, 1), 7, jnp.int32))
    assert int(prog[0, 0, 0]) == 0
    prog = lexical_advance(cons, prog, jnp.full((1, 1), 5, jnp.int32))
    assert int(prog[0, 0, 0]) == 1


def test_lexically_constrained_generation():
    """Every finished hypothesis contains all constraint phrases (DBA
    guarantee), on a fixture that prefers to avoid them."""
    from ifseg_tpu.generate.lexical import pack_constraints

    v = 12
    rng = np.random.default_rng(5)
    t = rng.random((v, v)) + 1e-3
    t[:, 5] *= 0.05  # the model dislikes constraint tokens
    t[:, 9] *= 0.05
    logt = jnp.log(jnp.asarray(t / t.sum(1, keepdims=True), jnp.float32))

    def step_fn(tokens, step, cache):
        prev = jnp.take_along_axis(
            tokens, jnp.full((tokens.shape[0], 1), step, jnp.int32), axis=1
        )[:, 0]
        return logt[prev], cache

    cons = pack_constraints([[[5, 6], [9]], [[9]]])
    gen = SequenceGenerator(
        step_fn, v, beam_size=4, max_len=8, min_len=1,
        lexical_constraints=cons,
    )
    out = jax.jit(lambda: gen(bsz=2, cache=()))()
    toks = np.asarray(out.tokens)
    scores = np.asarray(out.scores)

    def contains(seq, phrase):
        for i in range(len(seq) - len(phrase) + 1):
            if seq[i : i + len(phrase)] == phrase:
                return True
        return False

    best = toks[0, 0].tolist()
    assert np.isfinite(scores[0, 0])
    body = best[1 : best.index(EOS)] if EOS in best else best[1:]
    assert contains(body, [5, 6]) and contains(body, [9]), best
    best1 = toks[1, 0].tolist()
    body1 = best1[1 : best1.index(EOS)] if EOS in best1 else best1[1:]
    assert contains(body1, [9]), best1


def test_lexical_none_matches_plain_beam():
    v = 10
    rng = np.random.default_rng(6)
    t = rng.random((v, v)) + 1e-3
    logt = jnp.log(jnp.asarray(t / t.sum(1, keepdims=True), jnp.float32))

    def step_fn(tokens, step, cache):
        prev = jnp.take_along_axis(
            tokens, jnp.full((tokens.shape[0], 1), step, jnp.int32), axis=1
        )[:, 0]
        return logt[prev], cache

    g0 = SequenceGenerator(step_fn, v, beam_size=3, max_len=5, min_len=1)
    o0 = jax.jit(lambda: g0(bsz=2, cache=()))()
    g1 = SequenceGenerator(
        step_fn, v, beam_size=3, max_len=5, min_len=1,
        lexical_constraints=None,
    )
    o1 = jax.jit(lambda: g1(bsz=2, cache=()))()
    np.testing.assert_array_equal(np.asarray(o0.tokens), np.asarray(o1.tokens))
