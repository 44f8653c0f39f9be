"""Search strategies for sequence generation (mirrors models/search.py).

Each strategy implements ``step(step_idx, lprobs, scores, rng) ->
(cand_scores, cand_indices, cand_beams)`` over static shapes:

  lprobs: (bsz, beam, V) this step's token log-probs (cumulative-ready)
  scores: (bsz, beam, step_idx?) -> here (bsz, beam) cumulative scores
  returns 2*beam candidates per sentence (fairseq convention: twice the beam
  so that EOS-finished hypotheses never starve the search)

All are pure functions usable inside ``lax.scan``/``while_loop``; ``rng`` is
threaded explicitly (Sampling uses it, deterministic strategies ignore it).
Reference: custom_fairseq/fairseq/search.py (BeamSearch :91, Sampling :548,
DiverseBeamSearch :434, DiverseSiblingsSearch :618, LengthConstrained :382,
PrefixConstrained :491).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


class BeamSearch:
    def step(self, step_idx, lprobs, scores, rng=None):
        bsz, beam, v = lprobs.shape
        if scores is not None:
            lprobs = lprobs + scores[:, :, None]
        # step 0: only the first beam is valid (all beams identical)
        lprobs = jax.lax.cond(
            step_idx == 0,
            lambda lp: jnp.where(
                (jnp.arange(beam) == 0)[None, :, None], lp, -jnp.inf
            ),
            lambda lp: lp,
            lprobs,
        )
        flat = lprobs.reshape(bsz, beam * v)
        cand_scores, flat_idx = jax.lax.top_k(flat, 2 * beam)
        cand_beams = flat_idx // v
        cand_indices = flat_idx % v
        return cand_scores, cand_indices, cand_beams


class Sampling:
    """Top-k / top-p (nucleus) ancestral sampling (search.py:548-617)."""

    def __init__(self, sampling_topk: int = -1, sampling_topp: float = -1.0):
        self.topk = sampling_topk
        self.topp = sampling_topp

    def _filter(self, lprobs):
        if self.topk > 0:
            kth = jax.lax.top_k(lprobs, self.topk)[0][..., -1:]
            lprobs = jnp.where(lprobs < kth, -jnp.inf, lprobs)
        if self.topp > 0:
            sorted_lp = -jnp.sort(-lprobs, axis=-1)
            probs = jnp.exp(sorted_lp)
            cum = jnp.cumsum(probs, axis=-1)
            # keep tokens whose preceding cumulative mass < topp
            keep_mass = cum - probs < self.topp
            cutoff = jnp.max(jnp.where(keep_mass, sorted_lp, jnp.inf * -1), axis=-1, keepdims=True)
            lprobs = jnp.where(lprobs < cutoff, -jnp.inf, lprobs)
        return lprobs

    def step(self, step_idx, lprobs, scores, rng):
        bsz, beam, v = lprobs.shape
        filt = self._filter(lprobs)
        # sample one token per beam
        gumbel = -jnp.log(
            -jnp.log(jax.random.uniform(rng, filt.shape, minval=1e-20, maxval=1.0))
        )
        sampled = jnp.argmax(filt + gumbel, axis=-1)  # (bsz, beam)
        tok_lp = jnp.take_along_axis(lprobs, sampled[..., None], axis=-1)[..., 0]
        cum = tok_lp if scores is None else tok_lp + scores
        # candidates: each beam proposes its sample (duplicated to 2*beam)
        cand_scores = jnp.concatenate([cum, jnp.full_like(cum, -jnp.inf)], axis=1)
        cand_indices = jnp.concatenate([sampled, sampled], axis=1)
        cand_beams = jnp.concatenate(
            [jnp.tile(jnp.arange(beam)[None], (bsz, 1))] * 2, axis=1
        )
        return cand_scores, cand_indices, cand_beams


class DiverseBeamSearch:
    """Vijayakumar et al. 2016: beams split into G groups; each group's
    lprobs are penalized by counts of tokens already chosen by earlier groups
    this step (search.py:434-490, Hamming diversity)."""

    def __init__(self, num_groups: int, diversity_strength: float):
        self.groups = num_groups
        self.strength = diversity_strength
        self.inner = BeamSearch()

    def step(self, step_idx, lprobs, scores, rng=None):
        bsz, beam, v = lprobs.shape
        assert beam % self.groups == 0
        sub = beam // self.groups
        penalty = jnp.zeros((bsz, v), lprobs.dtype)
        outs = []
        for g in range(self.groups):
            lp = lprobs[:, g * sub : (g + 1) * sub]
            sc = None if scores is None else scores[:, g * sub : (g + 1) * sub]
            lp = lp - self.strength * penalty[:, None, :]
            cs, ci, cb = self.inner.step(step_idx, lp, sc)
            cs, ci, cb = cs[:, :sub], ci[:, :sub], cb[:, :sub]
            outs.append((cs, ci, cb + g * sub))
            onehot = jax.nn.one_hot(ci, v, dtype=penalty.dtype).sum(axis=1)
            penalty = penalty + onehot
        cand_scores = jnp.concatenate([o[0] for o in outs], axis=1)
        cand_indices = jnp.concatenate([o[1] for o in outs], axis=1)
        cand_beams = jnp.concatenate([o[2] for o in outs], axis=1)
        # duplicate to 2*beam (groups emit beam total)
        return (
            jnp.concatenate([cand_scores, jnp.full_like(cand_scores, -jnp.inf)], 1),
            jnp.concatenate([cand_indices, cand_indices], 1),
            jnp.concatenate([cand_beams, cand_beams], 1),
        )


class DiverseSiblingsSearch:
    """Li & Jurafsky 2016: rank-based penalty on each beam's k-best siblings
    (search.py:618-695)."""

    def __init__(self, diversity_rate: float):
        self.rate = diversity_rate

    def step(self, step_idx, lprobs, scores, rng=None):
        bsz, beam, v = lprobs.shape
        k = 2 * beam
        if scores is not None:
            lprobs = lprobs + scores[:, :, None]
        lprobs = jax.lax.cond(
            step_idx == 0,
            lambda lp: jnp.where(
                (jnp.arange(beam) == 0)[None, :, None], lp, -jnp.inf
            ),
            lambda lp: lp,
            lprobs,
        )
        top_lp, top_idx = jax.lax.top_k(lprobs, k)  # (bsz, beam, k)
        sibling_rank = jnp.arange(1, k + 1, dtype=lprobs.dtype)
        penalized = top_lp - self.rate * sibling_rank[None, None, :]
        flat = penalized.reshape(bsz, beam * k)
        cand_scores, flat_i = jax.lax.top_k(flat, k)
        cand_beams = flat_i // k
        sib = flat_i % k
        cand_indices = jnp.take_along_axis(
            top_idx.reshape(bsz, beam * k), flat_i, axis=1
        )
        # report unpenalized cumulative scores
        cand_scores = jnp.take_along_axis(
            top_lp.reshape(bsz, beam * k), flat_i, axis=1
        )
        return cand_scores, cand_indices, cand_beams


class LengthConstrainedBeamSearch:
    """Force EOS off until min_len, force EOS at max_len (search.py:382-433)."""

    def __init__(self, min_len, max_len, eos: int):
        self.min_len = min_len
        self.max_len = max_len
        self.eos = eos
        self.inner = BeamSearch()

    def step(self, step_idx, lprobs, scores, rng=None):
        v = lprobs.shape[-1]
        eos_col = jnp.arange(v) == self.eos
        lprobs = jnp.where(
            (step_idx < self.min_len) & eos_col[None, None, :], -jnp.inf, lprobs
        )
        lprobs = jnp.where(
            (step_idx >= self.max_len) & (~eos_col)[None, None, :], -jnp.inf, lprobs
        )
        return self.inner.step(step_idx, lprobs, scores)


class PrefixConstrainedBeamSearch:
    """Mask lprobs to tokens allowed by a per-sentence prefix function
    (search.py:491-547).  ``allowed_mask_fn(step_idx) -> (bsz, V) bool``."""

    def __init__(self, allowed_mask_fn):
        self.allowed_mask_fn = allowed_mask_fn
        self.inner = BeamSearch()

    def step(self, step_idx, lprobs, scores, rng=None):
        mask = self.allowed_mask_fn(step_idx)  # (bsz, V) bool
        lprobs = jnp.where(mask[:, None, :], lprobs, -jnp.inf)
        return self.inner.step(step_idx, lprobs, scores)
