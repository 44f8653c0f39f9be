"""Sequence scoring: corpus BLEU and character/word error rates.

Capability parity with fairseq/scoring/ (+ clib/libbleu's fast corpus BLEU):
pure-numpy implementations — BLEU at seg scale is not a hot path, and the
Levenshtein DP has a vectorized jnp twin in ops/edit_distance.py for on-device
use.
"""

import math
from collections import Counter
from typing import Iterable, List, Sequence, Tuple


def _ngrams(tokens: Sequence, n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def corpus_bleu(
    hypotheses: Iterable[Sequence],
    references: Iterable[Sequence],
    max_order: int = 4,
    smooth: bool = False,
) -> dict:
    """Corpus-level BLEU (clib/libbleu semantics: clipped n-gram precision
    products with brevity penalty)."""
    matches = [0] * max_order
    totals = [0] * max_order
    hyp_len = 0
    ref_len = 0
    for hyp, ref in zip(hypotheses, references):
        hyp = list(hyp)
        ref = list(ref)
        hyp_len += len(hyp)
        ref_len += len(ref)
        for n in range(1, max_order + 1):
            h = _ngrams(hyp, n)
            r = _ngrams(ref, n)
            overlap = sum((h & r).values())
            matches[n - 1] += overlap
            totals[n - 1] += max(len(hyp) - n + 1, 0)

    precisions = []
    for m, t in zip(matches, totals):
        if smooth:
            precisions.append((m + 1.0) / (t + 1.0))
        else:
            precisions.append(m / t if t > 0 else 0.0)
    if min(precisions) > 0:
        log_p = sum(math.log(p) for p in precisions) / max_order
        geo = math.exp(log_p)
    else:
        geo = 0.0
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    return {
        "bleu": 100.0 * geo * bp,
        "precisions": precisions,
        "brevity_penalty": bp,
        "hyp_len": hyp_len,
        "ref_len": ref_len,
    }


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance (clib/libnat edit_dist equivalent, host-side)."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def wer(hypothesis: Sequence, reference: Sequence) -> float:
    """Word error rate = edit_distance / len(reference)."""
    if len(reference) == 0:
        return 0.0 if len(hypothesis) == 0 else 1.0
    return edit_distance(hypothesis, reference) / len(reference)
