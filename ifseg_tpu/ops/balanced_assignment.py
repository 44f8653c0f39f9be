"""Balanced token->expert assignment for expert parallelism.

Two interchangeable backends behind one API (scores (N, E) -> (N,) expert id,
each expert receiving exactly N/E tokens):

  - ``balanced_assignment_auction``: exact auction algorithm in C++
    (csrc/balanced_assignment.cpp; the reference's clib/libbase primitive,
    fairseq/modules/base_layer.py:14-135).  Host-side; reachable from jitted
    code via ``jax.pure_callback``.
  - ``balanced_assignment_sinkhorn``: on-device differentiable relaxation —
    Sinkhorn normalization of exp(scores) to a doubly-"balanced" transport
    plan followed by greedy capacity-constrained rounding.  TPU-friendly (no
    host round trip), the idiomatic choice inside a training step.


PERF NOTE: the greedy rounding after Sinkhorn is a sequential
lax.scan over tokens (O(N) device loop); fine for the tested shard sizes
but a vectorized per-expert top-capacity selection would be preferable for
large token counts — tracked as future work (the C++ auction 
implementation in csrc/ is the host-side alternative).
"""

import ctypes
import logging
import os
import subprocess
import threading

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_LOCK = threading.Lock()
_LIB = None
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_DIR = os.path.join(os.path.dirname(__file__), "_lib")
_LIB_PATH = os.path.join(_LIB_DIR, "libbalanced.so")


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            src = os.path.join(_CSRC, "balanced_assignment.cpp")
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(src) > os.path.getmtime(_LIB_PATH):
                os.makedirs(_LIB_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                     "-o", _LIB_PATH],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.balanced_assignment.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_int),
            ]
            lib.balanced_assignment.restype = None
            _LIB = lib
    return _LIB


def _auction_host(scores: np.ndarray, eps: float = 1e-4) -> np.ndarray:
    scores = np.ascontiguousarray(scores, np.float32)
    n, e = scores.shape
    assert n % e == 0, f"tokens {n} not divisible by experts {e}"
    out = np.empty((n,), np.int32)
    _lib().balanced_assignment(
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, e, eps, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out


def balanced_assignment_auction(scores, eps: float = 1e-4):
    """Exact auction assignment; usable under jit via pure_callback."""
    n = scores.shape[0]
    return jax.pure_callback(
        lambda s: _auction_host(np.asarray(s), eps),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        scores,
        vmap_method="sequential",
    )


def balanced_assignment_sinkhorn(scores, n_iters: int = 8, temperature: float = 1.0):
    """On-device balanced assignment: Sinkhorn-normalized soft plan + greedy
    capacity rounding.  Returns (N,) expert ids with exact N/E balance."""
    n, e = scores.shape
    cap = n // e
    logp = scores.astype(jnp.float32) / temperature

    def body(lp, _):
        lp = lp - jax.nn.logsumexp(lp, axis=1, keepdims=True)  # rows
        lp = lp - jax.nn.logsumexp(lp, axis=0, keepdims=True)  # cols
        return lp, None

    lp, _ = jax.lax.scan(body, logp, None, length=n_iters)

    # Vectorized capacity rounding, at most E+1 rounds (each round either
    # fills an oversubscribed expert or assigns every remaining token):
    #   1. every unassigned token picks its best OPEN expert
    #   2. each expert keeps its top remaining-capacity candidates by score
    # This replaces an O(N)-step sequential scan (one device step per token,
    # ~17k steps at OFA-Base shapes) with E+1 sorts over (E, N).
    def round_body(carry, _):
        counts, out = carry
        unassigned = out < 0
        open_e = counts < cap  # (E,)
        pref = jnp.where(open_e[None, :], lp, -jnp.inf)
        choice = jnp.argmax(pref, axis=1)  # (N,)
        # candidate score matrix: M[e, t] = lp[t, e] iff t unassigned and
        # chose e
        cand = (
            (jnp.arange(e)[:, None] == choice[None, :])
            & unassigned[None, :]
        )
        m = jnp.where(cand, lp.T, -jnp.inf)  # (E, N)
        rank = jnp.argsort(jnp.argsort(-m, axis=1), axis=1)  # dense ranks
        remaining = (cap - counts)[:, None]
        accept = cand & (rank < remaining) & jnp.isfinite(m)
        tok_expert = jnp.argmax(accept, axis=0)  # (N,) expert accepting t
        accepted_t = jnp.any(accept, axis=0)
        out = jnp.where(accepted_t, tok_expert.astype(jnp.int32), out)
        counts = counts + jnp.sum(accept, axis=1).astype(counts.dtype)
        return (counts, out), None

    # derive inits from lp so their axis-varying type matches inside
    # shard_map (zeros literals are replicated; the carry must not be)
    init = (
        jnp.zeros((e,), jnp.int32) + (0 * lp[0]).astype(jnp.int32),
        jnp.full((n,), -1, jnp.int32) + (0 * lp[:, 0]).astype(jnp.int32),
    )
    (counts, out), _ = jax.lax.scan(round_body, init, None, length=e + 1)
    return out
