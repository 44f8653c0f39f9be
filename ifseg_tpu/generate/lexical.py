"""Lexically-constrained decoding state (static-shape DBA variant).

The reference vendors fairseq's LexicallyConstrainedBeamSearch
(custom_fairseq/fairseq/search.py, Post & Vilar 2018 dynamic beam
allocation): every finished hypothesis must contain all of its sentence's
constraint phrases, tracked by a per-hypothesis Python state object and
re-allocated beam slots per "bank" (#constraints met).  Python state objects
cannot live inside a compiled decode loop, so here the state is three int
arrays advanced with pure ops inside the generator's ``lax.scan``:

- constraints packed as (bsz, C, L) token table + (bsz, C) lengths
- per-hypothesis progress (bsz, beam, C): matched prefix length per phrase
- bank = number of completed phrases; EOS stays masked until bank == C

Beam allocation is simplified: half the beam is selected purely by score,
the other half by (bank, score) — enough pressure to complete constraints
without fairseq's full per-bank quota bookkeeping.  Phrase matching resets
to "does this token start the phrase?" on mismatch (no KMP fallback), the
same approximation fairseq's UnorderedConstraintState makes for repeated
prefixes.
"""

from typing import List, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class PackedConstraints(NamedTuple):
    tokens: jnp.ndarray  # (bsz, C, L) int32, -1 padded
    lengths: jnp.ndarray  # (bsz, C) int32, 0 = unused slot


def pack_constraints(batch_phrases: Sequence[Sequence[Sequence[int]]]) -> PackedConstraints:
    """Pack per-sentence constraint phrase lists into static arrays."""
    bsz = len(batch_phrases)
    c = max(1, max(len(p) for p in batch_phrases))
    l = max(1, max((len(ph) for p in batch_phrases for ph in p), default=1))
    tokens = np.full((bsz, c, l), -1, np.int32)
    lengths = np.zeros((bsz, c), np.int32)
    for b, phrases in enumerate(batch_phrases):
        for i, ph in enumerate(phrases):
            tokens[b, i, : len(ph)] = ph
            lengths[b, i] = len(ph)
    return PackedConstraints(jnp.asarray(tokens), jnp.asarray(lengths))


def lexical_init(cons: PackedConstraints, beam: int) -> jnp.ndarray:
    """Initial progress state (bsz, beam, C), all zeros."""
    bsz, c, _ = cons.tokens.shape
    return jnp.zeros((bsz, beam, c), jnp.int32)


def lexical_advance(
    cons: PackedConstraints, prog: jnp.ndarray, token: jnp.ndarray
) -> jnp.ndarray:
    """Advance progress after emitting ``token``.

    prog: (bsz, K, C); token: (bsz, K).  Completed phrases stay completed.
    """
    tokens, lengths = cons.tokens, cons.lengths  # (bsz,C,L), (bsz,C)
    met = prog >= lengths[:, None, :]  # (bsz,K,C) incl. length-0 slots
    pos = jnp.minimum(prog, tokens.shape[-1] - 1)
    expected = jnp.take_along_axis(
        jnp.broadcast_to(tokens[:, None], prog.shape + (tokens.shape[-1],)),
        pos[..., None],
        axis=-1,
    )[..., 0]  # (bsz,K,C)
    hit = expected == token[..., None]
    restart = (tokens[:, None, :, 0] == token[..., None]).astype(jnp.int32)
    new_prog = jnp.where(hit, prog + 1, restart)
    return jnp.where(met, prog, new_prog)


def lexical_bank(cons: PackedConstraints, prog: jnp.ndarray) -> jnp.ndarray:
    """Consumed constraint tokens per hypothesis (the DBA "bank": partial
    phrase progress counts, so a hypothesis mid-way through a multi-token
    phrase outranks one that hasn't started it — Post & Vilar 2018 §3)."""
    return jnp.sum(jnp.minimum(prog, cons.lengths[:, None, :]), axis=-1)


def lexical_total(cons: PackedConstraints) -> jnp.ndarray:
    """(bsz,) total constraint tokens per sentence; bank == total iff every
    phrase is complete."""
    return jnp.sum(cons.lengths, axis=-1)
