"""Batched Levenshtein distance on device (lax.scan over the DP grid).

TPU-native equivalent of the reference's native edit-distance kernels
(clib/libnat/edit_dist.cpp, clib/libnat_cuda): the DP recurrence runs one
scan step per row of the grid with the whole batch vectorized, so cost is
O(La) sequential steps of O(B * Lb) vector work.
"""

import jax
import jax.numpy as jnp


def batched_edit_distance(a, b, a_len=None, b_len=None):
    """a: (B, La), b: (B, Lb) int token ids; *_len: (B,) valid lengths
    (defaults to the full width).  Returns (B,) int32 distances."""
    bsz, la = a.shape
    lb = b.shape[1]
    a_len = a_len if a_len is not None else jnp.full((bsz,), la, jnp.int32)
    b_len = b_len if b_len is not None else jnp.full((bsz,), lb, jnp.int32)

    # row 0: distances 0..lb, clipped at b_len (positions beyond stay at b_len)
    j = jnp.arange(lb + 1)
    row0 = jnp.minimum(j[None, :], b_len[:, None]).astype(jnp.int32)

    def step(carry, i):
        prev = carry  # (B, lb+1)
        ai = a[:, i]  # (B,)
        valid_i = (i < a_len).astype(jnp.int32)

        sub_cost = (ai[:, None] != b).astype(jnp.int32)  # (B, lb)
        diag = prev[:, :-1] + sub_cost
        up = prev[:, 1:] + 1

        # left dependency is sequential in j: fold with an associative scan
        # d[j] = min(diag[j-1], up[j-1], d[j-1] + 1)  ->  prefix-min form:
        base = jnp.minimum(diag, up)  # (B, lb), candidate without 'left'
        first = prev[:, :1] + 1  # d[0] of the new row = i+1 (clipped later)
        # running min: d[j] = min over k<=j of base[k] + (j - k); compute via
        # min-plus prefix scan: m[j] = min(base[j], m[j-1] + 1)
        def leftfold(m_prev, x):
            m = jnp.minimum(x, m_prev + 1)
            return m, m

        init = jnp.minimum(base[:, 0], first[:, 0])
        _, ms = jax.lax.scan(
            leftfold, init, jnp.moveaxis(base[:, 1:], 1, 0)
        )
        new_tail = jnp.concatenate(
            [init[:, None], jnp.moveaxis(ms, 0, 1)], axis=1
        )  # (B, lb)
        new_row = jnp.concatenate(
            [jnp.minimum(prev[:, :1] + 1, b_len[:, None] + i + 1), new_tail],
            axis=1,
        )
        # rows beyond a_len don't advance
        new_row = jnp.where(valid_i[:, None] > 0, new_row, prev)
        return new_row, None

    last, _ = jax.lax.scan(step, row0, jnp.arange(la))
    return jnp.take_along_axis(last, b_len[:, None], axis=1)[:, 0]
