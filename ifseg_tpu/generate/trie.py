"""Constraint trie for constrained decoding, packed for on-device lookup.

The reference's utils/trie.py is a dict-of-dicts trie whose
``get_next_layer(prefix)`` returns the allowed next tokens (``[eos]`` once
the prefix falls off the trie); models/sequence_generator.py:855-888 walks
it on the HOST every step with ``tokens.tolist()`` — one Python trie walk
per hypothesis per step.  That pattern is poison under XLA (a device→host
sync inside the decode loop), so here the trie is packed once into static
``(num_nodes, max_branch)`` child tables and both the mask lookup and the
state advance run on device inside the generator's ``lax.scan``:

    node state (int32 per hypothesis)
      trie_token_mask(packed, node)   -> (vocab,) bool   allowed next tokens
      trie_advance(packed, node, tok) -> int32           next node (-1 = dead)

Dead/off-trie states allow only EOS, matching the reference fallback.
"""

from typing import List, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class ConstraintTrie:
    """Host-side trie with reference-parity API (utils/trie.py)."""

    def __init__(self, eos: int):
        self.eos = eos
        # node 0 is the root; each node is a dict token -> child node id
        self._children: List[dict] = [{}]

    def insert(self, word: Sequence[int]) -> None:
        cur = 0
        for tok in word:
            tok = int(tok)
            nxt = self._children[cur].get(tok)
            if nxt is None:
                nxt = len(self._children)
                self._children.append({})
                self._children[cur][tok] = nxt
            cur = nxt

    def get_next_layer(self, word: Sequence[int]) -> List[int]:
        cur = 0
        for tok in word:
            cur = self._children[cur].get(int(tok))
            if cur is None:
                return [self.eos]
        return list(self._children[cur].keys())

    def pack(self) -> "PackedTrie":
        max_branch = max(1, max(len(c) for c in self._children))
        n = len(self._children)
        tokens = np.full((n, max_branch), -1, np.int32)
        ids = np.full((n, max_branch), -1, np.int32)
        for i, children in enumerate(self._children):
            for j, (tok, child) in enumerate(sorted(children.items())):
                tokens[i, j] = tok
                ids[i, j] = child
        return PackedTrie(
            children_tokens=jnp.asarray(tokens),
            children_ids=jnp.asarray(ids),
            eos=self.eos,
        )


class PackedTrie(NamedTuple):
    children_tokens: jnp.ndarray  # (N, B) int32, -1 padded
    children_ids: jnp.ndarray  # (N, B) int32, -1 padded
    eos: int


def trie_token_mask(trie: PackedTrie, node: jnp.ndarray, vocab: int) -> jnp.ndarray:
    """Allowed-next-token mask, vectorized over leading dims of ``node``.

    Off-trie (node < 0) and leaf nodes allow only EOS (reference behavior:
    get_next_layer returns [eos] for dead prefixes; leaves are normally
    EOS-terminated so the fallback only matters for malformed inserts).
    """
    safe = jnp.maximum(node, 0)
    toks = trie.children_tokens[safe]  # (..., B)
    valid = toks >= 0
    mask = jnp.zeros(node.shape + (vocab,), bool)
    onehot = jnp.arange(vocab) == jnp.where(valid, toks, 0)[..., None]
    mask = jnp.any(onehot & valid[..., None], axis=-2)
    dead = (node < 0) | ~jnp.any(valid, axis=-1)
    eos_only = jnp.arange(vocab) == trie.eos
    return jnp.where(dead[..., None], eos_only, mask)


def trie_advance(trie: PackedTrie, node: jnp.ndarray, token: jnp.ndarray) -> jnp.ndarray:
    """Next node after emitting ``token``; -1 once off the trie (absorbing)."""
    safe = jnp.maximum(node, 0)
    toks = trie.children_tokens[safe]  # (..., B)
    ids = trie.children_ids[safe]
    hit = (toks == token[..., None]) & (toks >= 0)
    child = jnp.max(jnp.where(hit, ids, -1), axis=-1)
    return jnp.where(node < 0, -1, child)
