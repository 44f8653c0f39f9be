"""GPT-2 byte-level BPE, self-contained.

Replicates the tokenization used by the reference via fairseq's GPT2BPE wrapper
(reference: custom_fairseq/fairseq/data/encoders/gpt2_bpe.py and
custom_fairseq/fairseq/data/encoders/gpt2_bpe_utils.py behavior): text is split
with the GPT-2 regex, bytes are mapped to unicode surrogates, merges applied
greedily by rank, and `encode` returns the GPT-2 token ids joined as a
space-separated string (which the fairseq Dictionary then maps to its indices).
"""

import json
import os
from functools import lru_cache

import regex as re

_GPT2_PATTERN = (
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


@lru_cache()
def bytes_to_unicode():
    """Map every byte to a printable unicode char (GPT-2 convention)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class GPT2BPE:
    def __init__(self, encoder_json: str, vocab_bpe: str):
        with open(encoder_json, "r", encoding="utf-8") as f:
            self.encoder = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(vocab_bpe, "r", encoding="utf-8") as f:
            bpe_data = f.read()
        merges = [tuple(line.split()) for line in bpe_data.split("\n")[1:-1]]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.pat = re.compile(_GPT2_PATTERN)
        self._cache = {}

    @classmethod
    def from_dir(cls, bpe_dir: str) -> "GPT2BPE":
        return cls(
            os.path.join(bpe_dir, "encoder.json"), os.path.join(bpe_dir, "vocab.bpe")
        )

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token)
        pairs = _get_pairs(word)
        if not pairs:
            return token
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode_ids(self, text: str):
        """Text -> list of GPT-2 token ids."""
        ids = []
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def encode(self, text: str) -> str:
        """Text -> space-joined GPT-2 ids (fairseq GPT2BPE.encode convention)."""
        return " ".join(str(i) for i in self.encode_ids(text))

    def decode_ids(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        return bytearray(self.byte_decoder[c] for c in text).decode(
            "utf-8", errors="replace"
        )

    def decode(self, s: str) -> str:
        """Space-joined GPT-2 ids -> text (inverse of `encode`)."""
        return self.decode_ids(int(t) for t in s.split())
