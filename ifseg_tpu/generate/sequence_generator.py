"""Static-shape beam-search sequence generator.

Capability parity with models/sequence_generator.py (1051 LoC torch): beam
search with min/max length, length-penalty-normalized finalization, 2x-beam
candidate expansion so EOS never starves the beam, no-repeat-ngram blocking,
temperature, and unk penalty — restructured as a single ``lax.scan`` over a
``step_fn`` so the whole decode compiles once (the reference's Python loop
re-dispatches per step).

``step_fn(prev_tokens (N, Lmax), step_idx, cache) -> (logits (N, V), cache)``
where N = bsz * beam.  The model owns its KV cache inside ``cache``; the
generator is model-agnostic (tested with a scripted-probability fixture, the
reference's test strategy: tests/utils.py sequence_generator_setup).

The seg variant's pinned max_len==min_len (sequence_generator.py:227-229)
falls out of min_len/max_len settings.
"""

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ifseg_tpu.generate.lexical import (
    PackedConstraints,
    lexical_advance,
    lexical_bank,
    lexical_init,
    lexical_total,
)
from ifseg_tpu.generate.search import BeamSearch
from ifseg_tpu.generate.trie import PackedTrie, trie_advance, trie_token_mask
from ifseg_tpu.ops.ngram_block import ngram_repeat_mask

NEG_INF = -1e9


def _reorder_cache(cache, flat_sel, nrows: int):
    """Gather cache rows by selected beams.  ARCache is handled structurally
    (its precomputed bias tensors are batch-INDEPENDENT and must not be
    gathered even if their leading layers/heads axis coincidentally equals
    bsz*beam); other pytrees fall back to the batch-major shape heuristic."""
    from ifseg_tpu.models.ar_cache import ARCache

    take = lambda c: jnp.take(c, flat_sel, axis=0)
    if isinstance(cache, ARCache):
        return cache._replace(
            self_k=[take(k) for k in cache.self_k],
            self_v=[take(v) for v in cache.self_v],
            cross_k=[take(k) for k in cache.cross_k],
            cross_v=[take(v) for v in cache.cross_v],
            enc_out=take(cache.enc_out),
            enc_pad=take(cache.enc_pad),
        )
    if isinstance(cache, (tuple, list)) and any(
        isinstance(c, ARCache) for c in cache
    ):  # ensemble: one cache per model
        return type(cache)(_reorder_cache(c, flat_sel, nrows) for c in cache)
    return jax.tree_util.tree_map(
        lambda c: take(c)
        if hasattr(c, "shape") and c.ndim >= 1 and c.shape[0] == nrows
        else c,
        cache,
    )


def ensemble_step_fn(step_fns, temperature: float = 1.0):
    """Average an ensemble's next-token distributions in probability space
    (EnsembleModel, sequence_generator.py:899-900: logsumexp of per-model
    log-probs minus log(n)).  Each step_fn owns one slot of the cache tuple.

    The reference tempers each model BEFORE normalizing (:851), so pass
    ``temperature`` here and leave the generator's at 1.0; the generator's
    final log_softmax is then a no-op on the already-normalized average.
    """
    n = len(step_fns)
    if n == 1:
        return step_fns[0]

    def step_fn(tokens, step, caches):
        lps, new_caches = [], []
        for fn, cache in zip(step_fns, caches):
            logits, new_cache = fn(tokens, step, cache)
            lps.append(
                jax.nn.log_softmax(
                    logits.astype(jnp.float32) / temperature, axis=-1
                )
            )
            new_caches.append(new_cache)
        avg = jax.nn.logsumexp(jnp.stack(lps), axis=0) - jnp.log(float(n))
        return avg, tuple(new_caches)

    return step_fn


class GeneratorOutput(NamedTuple):
    tokens: jnp.ndarray  # (bsz, beam, Lmax) best-first, eos-terminated
    scores: jnp.ndarray  # (bsz, beam) length-normalized


class SequenceGenerator:
    def __init__(
        self,
        step_fn: Callable,
        vocab_size: int,
        beam_size: int = 5,
        max_len: int = 200,
        min_len: int = 1,
        bos: int = 0,
        pad: int = 1,
        eos: int = 2,
        unk: int = 3,
        normalize_scores: bool = True,
        len_penalty: float = 1.0,
        unk_penalty: float = 0.0,
        temperature: float = 1.0,
        no_repeat_ngram_size: int = 0,
        search=None,
        constraint_trie: Optional[PackedTrie] = None,
        constraint_range: Optional[str] = None,
        zero_shot: bool = False,
        lexical_constraints: Optional[PackedConstraints] = None,
    ):
        self.step_fn = step_fn
        self.vocab_size = vocab_size
        self.beam = beam_size
        self.max_len = max_len
        self.min_len = min_len
        self.bos, self.pad, self.eos, self.unk = bos, pad, eos, unk
        self.normalize_scores = normalize_scores
        self.len_penalty = len_penalty
        self.unk_penalty = unk_penalty
        self.temperature = temperature
        self.no_repeat_ngram_size = no_repeat_ngram_size
        self.search = search or BeamSearch()
        # constrained decoding (sequence_generator.py:130-137, :855-888):
        # constraint_range="start,end" keeps ids [0,4) U [start,end);
        # constraint_trie restricts each hypothesis to trie continuations.
        # zero_shot masks AFTER log_softmax (raw scores over the full vocab);
        # default masks BEFORE (probabilities renormalize over the allowed set).
        self.constraint_trie = constraint_trie
        self.zero_shot = zero_shot
        self.constraint_start = self.constraint_end = None
        if constraint_range is not None:
            start, end = constraint_range.split(",")
            self.constraint_start, self.constraint_end = int(start), int(end)
        # lexically-constrained decoding (fairseq LexicallyConstrainedBeam-
        # Search / DBA, redesigned static-shape — see generate/lexical.py):
        # EOS is masked until every constraint phrase has appeared, and half
        # the beam is selected by (bank, score) to drive phrase completion.
        self.lexical = lexical_constraints

    def _constraint_mask(self, nodes_flat) -> Optional[jnp.ndarray]:
        """(N, V) True = allowed, from range and/or trie constraints."""
        v = self.vocab_size
        mask = None
        if self.constraint_start is not None:
            ids = jnp.arange(v)
            mask = (ids < 4) | (
                (ids >= self.constraint_start) & (ids < self.constraint_end)
            )
            mask = jnp.broadcast_to(mask, (nodes_flat.shape[0], v))
        if self.constraint_trie is not None:
            tmask = trie_token_mask(self.constraint_trie, nodes_flat, v)
            mask = tmask if mask is None else (mask & tmask)
        return mask

    def __call__(self, bsz: int, cache: Any, rng=None) -> GeneratorOutput:
        beam, v = self.beam, self.vocab_size
        lmax = self.max_len + 2  # bos + tokens + eos
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        tokens0 = jnp.full((bsz, beam, lmax), self.pad, jnp.int32)
        tokens0 = tokens0.at[:, :, 0].set(self.bos)
        if self.constraint_trie is not None:
            # trie sequences are inserted as [bos] + tokens + [eos]
            # (sequence_generator.py:862 walks "[0] + generated suffix")
            nodes0 = trie_advance(
                self.constraint_trie,
                jnp.zeros((bsz, beam), jnp.int32),
                jnp.full((bsz, beam), self.bos, jnp.int32),
            )
        else:
            nodes0 = jnp.zeros((bsz, beam), jnp.int32)
        prog0 = (
            lexical_init(self.lexical, beam)
            if self.lexical is not None
            else jnp.zeros((bsz, beam, 1), jnp.int32)
        )
        alive_lp0 = jnp.zeros((bsz, beam), jnp.float32)
        fin_seq0 = jnp.full((bsz, beam, lmax), self.pad, jnp.int32)
        fin_scores0 = jnp.full((bsz, beam), -jnp.inf, jnp.float32)

        def body(carry, xs):
            step, rng_step = xs
            tokens, alive_lp, nodes, prog, fin_seq, fin_scores, cache = carry

            flat_tokens = tokens.reshape(bsz * beam, lmax)
            logits, new_cache = self.step_fn(flat_tokens, step, cache)
            logits = logits.astype(jnp.float32)
            cmask = self._constraint_mask(nodes.reshape(bsz * beam))
            if cmask is not None and not self.zero_shot:
                logits = jnp.where(cmask, logits, NEG_INF)
            lprobs = jax.nn.log_softmax(logits / self.temperature, axis=-1)
            if cmask is not None and self.zero_shot:
                lprobs = jnp.where(cmask, lprobs, -jnp.inf)
            lprobs = lprobs.at[:, self.pad].set(-jnp.inf)
            if self.unk_penalty != 0.0:
                lprobs = lprobs.at[:, self.unk].add(-self.unk_penalty)
            if self.no_repeat_ngram_size > 0:
                banned = ngram_repeat_mask(
                    flat_tokens, step, self.no_repeat_ngram_size, v
                )
                lprobs = jnp.where(banned, -jnp.inf, lprobs)
            lprobs = lprobs.reshape(bsz, beam, v)
            # min/max length via EOS gating (LengthConstrained semantics)
            # fairseq step semantics: at scan step s the token at position
            # s+1 is chosen; EOS at step s ends a hypothesis with s tokens
            eos_col = (jnp.arange(v) == self.eos)[None, None, :]
            if self.lexical is not None:
                # cannot finish until every constraint phrase has appeared
                unmet = lexical_bank(self.lexical, prog) < lexical_total(
                    self.lexical
                )[:, None]
                lprobs = jnp.where(unmet[..., None] & eos_col, -jnp.inf, lprobs)
            lprobs = jnp.where((step < self.min_len) & eos_col, -jnp.inf, lprobs)
            lprobs = jnp.where(
                (step >= self.max_len) & (~eos_col), NEG_INF, lprobs
            )

            cand_scores, cand_indices, cand_beams = self.search.step(
                step, lprobs, alive_lp, rng_step
            )  # each (bsz, 2*beam)

            if self.lexical is not None:
                # force each beam's expected-next constraint tokens and its
                # EOS into the candidate pool — low-probability constraint
                # tokens never survive the global top-2B cut on their own
                # (fairseq's DBA likewise always considers constraint tokens)
                ctoks, clens = self.lexical.tokens, self.lexical.lengths
                C, L = ctoks.shape[1], ctoks.shape[2]
                exp_pos = jnp.minimum(prog, L - 1)  # (bsz,beam,C)
                exp_tok = jnp.take_along_axis(
                    jnp.broadcast_to(ctoks[:, None], (bsz, beam, C, L)),
                    exp_pos[..., None],
                    axis=-1,
                )[..., 0]
                inactive = (prog >= clens[:, None, :]) | (clens[:, None, :] == 0)
                lp_exp = jnp.take_along_axis(
                    lprobs, exp_tok.clip(0, v - 1), axis=-1
                )
                sc_exp = jnp.where(
                    inactive, -jnp.inf, alive_lp[..., None] + lp_exp
                ).reshape(bsz, beam * C)
                beams_exp = jnp.broadcast_to(
                    jnp.arange(beam)[None, :, None], (bsz, beam, C)
                ).reshape(bsz, beam * C)
                sc_eos = alive_lp + lprobs[..., self.eos]  # (bsz,beam)
                cand_scores = jnp.concatenate(
                    [cand_scores, sc_exp, sc_eos], axis=1
                )
                cand_indices = jnp.concatenate(
                    [
                        cand_indices,
                        exp_tok.clip(0, v - 1).reshape(bsz, beam * C),
                        jnp.full((bsz, beam), self.eos, jnp.int32),
                    ],
                    axis=1,
                )
                cand_beams = jnp.concatenate(
                    [cand_beams, beams_exp, jnp.broadcast_to(
                        jnp.arange(beam)[None, :], (bsz, beam)
                    )],
                    axis=1,
                )

            is_eos = cand_indices == self.eos
            length = jnp.asarray(step + 1, jnp.float32)  # tokens incl. eos slot
            norm = length**self.len_penalty if self.normalize_scores else 1.0
            eos_norm_scores = jnp.where(
                is_eos, cand_scores / norm, -jnp.inf
            )  # (bsz, 2B)

            # ---- finalize: merge EOS candidates into the finished pool
            gather_b = lambda arr, ib: jnp.take_along_axis(arr, ib, axis=1)
            cand_seq = gather_b(
                tokens.reshape(bsz, beam, lmax),
                cand_beams[:, :, None].clip(0, beam - 1),
            )
            cand_seq = cand_seq.at[:, :, step + 1].set(
                jnp.where(is_eos, self.eos, cand_indices)
            )
            all_fin_scores = jnp.concatenate([fin_scores, eos_norm_scores], axis=1)
            all_fin_seq = jnp.concatenate([fin_seq, cand_seq], axis=1)
            top_fin, top_fin_idx = jax.lax.top_k(all_fin_scores, beam)
            new_fin_seq = jnp.take_along_axis(
                all_fin_seq, top_fin_idx[:, :, None], axis=1
            )

            # ---- continue: best non-EOS candidates
            alive_cand = jnp.where(is_eos, -jnp.inf, cand_scores)
            if self.lexical is not None:
                # DBA-style split: half the beam by score, half by
                # (bank, score) so constraint completion keeps slots
                prog_cand = jnp.take_along_axis(
                    prog, cand_beams[:, :, None].clip(0, beam - 1), axis=1
                )
                cand_bank = lexical_bank(
                    self.lexical,
                    lexical_advance(self.lexical, prog_cand, cand_indices),
                ).astype(jnp.float32)
                k2 = beam // 2
                k1 = beam - k2
                _, i1 = jax.lax.top_k(alive_cand, k1)
                masked = alive_cand.at[
                    jnp.arange(bsz)[:, None], i1
                ].set(-jnp.inf)
                _, i2 = jax.lax.top_k(masked + cand_bank * 1e4, k2)
                alive_idx = jnp.concatenate([i1, i2], axis=1)
                new_alive_lp = jnp.take_along_axis(alive_cand, alive_idx, axis=1)
            else:
                new_alive_lp, alive_idx = jax.lax.top_k(alive_cand, beam)
            new_tokens = jnp.take_along_axis(
                cand_seq, alive_idx[:, :, None], axis=1
            )
            # re-order the cache by selected beams
            sel_beams = jnp.take_along_axis(cand_beams, alive_idx, axis=1)  # (bsz,B)
            flat_sel = (
                jnp.arange(bsz)[:, None] * beam + sel_beams
            ).reshape(-1)
            new_cache = _reorder_cache(new_cache, flat_sel, bsz * beam)
            if self.constraint_trie is not None:
                prev_nodes = jnp.take_along_axis(nodes, sel_beams, axis=1)
                chosen = new_tokens[:, :, step + 1]
                new_nodes = trie_advance(self.constraint_trie, prev_nodes, chosen)
            else:
                new_nodes = nodes
            if self.lexical is not None:
                prev_prog = jnp.take_along_axis(
                    prog, sel_beams[:, :, None], axis=1
                )
                new_prog = lexical_advance(
                    self.lexical, prev_prog, new_tokens[:, :, step + 1]
                )
            else:
                new_prog = prog
            return (
                new_tokens,
                new_alive_lp,
                new_nodes,
                new_prog,
                new_fin_seq,
                top_fin,
                new_cache,
            ), None

        steps = jnp.arange(self.max_len + 1)
        rngs = jax.random.split(rng, self.max_len + 1)
        carry, _ = jax.lax.scan(
            body,
            (tokens0, alive_lp0, nodes0, prog0, fin_seq0, fin_scores0, cache),
            (steps, rngs),
        )
        tokens, alive_lp, _, prog_f, fin_seq, fin_scores, _ = carry

        if self.lexical is not None:
            # never-finished beams only count if their constraints are met
            done = lexical_bank(self.lexical, prog_f) >= lexical_total(
                self.lexical
            )[:, None]
            alive_lp = jnp.where(done, alive_lp, -jnp.inf)

        # any never-finished beams: treat alive as finished at max length
        length = jnp.asarray(self.max_len + 1, jnp.float32)
        norm = length**self.len_penalty if self.normalize_scores else 1.0
        alive_norm = alive_lp / norm
        all_scores = jnp.concatenate([fin_scores, alive_norm], axis=1)
        all_seq = jnp.concatenate([fin_seq, tokens], axis=1)
        top, idx = jax.lax.top_k(all_scores, self.beam)
        seq = jnp.take_along_axis(all_seq, idx[:, :, None], axis=1)
        return GeneratorOutput(tokens=seq, scores=top)
