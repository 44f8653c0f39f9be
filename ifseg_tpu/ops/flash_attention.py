"""Fused attention with additive position bias (Pallas TPU kernel).

OFA attention needs per-layer additive biases (abs q·k bias + token/image
relative biases, SURVEY.md "hard parts"), which rules out stock flash kernels.
At IFSeg sequence lengths (~1.1k-4.2k tokens) whole-K/V blocks fit VMEM, so
the kernel streams q-blocks against resident K/V and never materializes the
(B, H, Lq, Lk) logits in HBM — the reference materializes them per layer
(unify_multihead_attention.py:464-489), which is the main HBM-bandwidth cost
of the torch model.

Layout: q (B, H, Lq, D), k/v (B, H, Lk, D), bias (H, Lq, Lk) fp32 shared
across the batch (all OFA biases are batch-independent), optional key padding
mask (B, Lk).  fp32 accumulation on the MXU, output in the input dtype.

No operand is ever padded: the q-block size adapts to Lq (zero or near-zero
remainder), K/V/bias blocks span the full key length, and the last q block is
handled by Pallas's masked block semantics (out-of-bounds rows read garbage
and are dropped on write; the backward kernels zero those rows before any
cross-row reduction).  This matters: padding Lq 1056 -> 1280 (the old
fixed-256 block) wasted 21% of the attention FLOPs and re-materialized padded
copies of q/k/v/bias in HBM every call.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is unavailable on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

NEG_INF = -1e9

# VMEM budget for one program's resident blocks (logits + bias double-buffer
# + K/V); the chip has ~16 MB of VMEM per core
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_bq(lq: int, lk: int) -> int:
    """Largest q-block <= 512 that (a) minimizes the non-divisible remainder
    and (b) keeps the program's VMEM footprint under budget.

    The dominant VMEM terms scale with bq * lk (fp32 logits + two buffered
    fp32 bias blocks) — cap bq accordingly, then scan block counts for the
    best fit (lq=1056 -> bq=352 exact; lq=1025 -> bq=344, 7 masked rows)."""
    cap = max(_VMEM_BUDGET // (lk * 4 * 3), 128)
    cap = min(512, cap)
    best = None
    for nb in range(max(1, -(-lq // cap)), -(-lq // 8) + 1):
        bq = -(-(-(-lq // nb)) // 8) * 8
        if bq > cap:
            continue
        waste = nb * bq - lq
        key = (waste, nb)
        if best is None or key < best[:2]:
            best = (waste, nb, bq)
        if waste == 0:
            break
    return best[2]


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, causal, lq, lk, bq):
    # rest = (mask_ref, out_ref) when a batch mask is passed, else (out_ref,)
    mask_ref = rest[:-1]
    out_ref = rest[-1]
    i = pl.program_id(1)
    # keep matmul inputs in their native (bf16) dtype: the MXU runs bf16 at
    # 4x the fp32 rate; accumulation stays fp32 via preferred_element_type
    q = q_ref[0, 0]  # (bq, D)
    k = k_ref[0, 0]  # (Lk, D)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, Lk) fp32
    logits += bias_ref[0].astype(jnp.float32)
    if mask_ref:  # batch-dependent key padding: fp32 additive (1, Lk) row.
        # A bool/int mask + where() costs 2.2x kernel time on the VPU
        # (compare + select + 1-D relayout); a broadcast row add is free and
        # bit-identical after the max-subtracted exp (measured on v5e).
        logits += mask_ref[0][0]
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + i * bq
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(cols > rows + (lk - lq), NEG_INF, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    v = v_ref[0, 0]
    # normalize AFTER the PV matmul: divides (bq, D) instead of (bq, Lk)
    acc = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = (acc / s).astype(out_ref.dtype)


def _mask_to_additive(key_padding_mask):
    """(B, Lk) bool -> (B, 1, Lk) fp32 additive penalty row for the kernels."""
    return (key_padding_mask.astype(jnp.float32) * NEG_INF)[:, None, :]


def _attention_xla(q, k, v, bias, key_padding_mask, causal):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias[None].astype(jnp.float32)
    if causal:
        lq, lk = logits.shape[-2:]
        cm = jnp.tril(jnp.ones((lq, lk), bool), k=lk - lq)
        logits = jnp.where(cm[None, None], logits, NEG_INF)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attention_bias(q, k, v, bias, key_padding_mask, causal=False):
    """Fused attention forward; streaming Pallas backward (or exact XLA
    recompute, see BACKWARD_IMPL).

    q (B,H,Lq,D); k,v (B,H,Lk,D); bias (H,Lq,Lk) fp32 or None;
    key_padding_mask (B,Lk) bool (True = pad) or None.
    """
    return _flash_forward(q, k, v, bias, key_padding_mask, causal)


# None = auto (interpret when not on TPU hardware); tests may force True
INTERPRET = None


def _interpret_mode() -> bool:
    if INTERPRET is not None:
        return INTERPRET
    return jax.default_backend() not in ("tpu", "axon")


def _flash_forward(q, k, v, bias, key_padding_mask, causal):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bq = _pick_bq(lq, lk)
    nb = pl.cdiv(lq, bq)

    if bias is None:
        bias = jnp.zeros((h, lq, lk), jnp.float32)

    inputs = [q, k, v, bias]
    # grid order (h, i, b): batch varies fastest, so the (h, i)-indexed bias
    # block is unchanged across consecutive programs and Pallas skips its
    # DMA — without this the fp32 bias is re-fetched per batch element and
    # dominates the kernel's HBM traffic
    grid = (h, nb, b)
    in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda h_, i, b_: (b_, h_, i, 0)),
        pl.BlockSpec((1, 1, lk, d), lambda h_, i, b_: (b_, h_, 0, 0)),
        pl.BlockSpec((1, 1, lk, d), lambda h_, i, b_: (b_, h_, 0, 0)),
        pl.BlockSpec((1, bq, lk), lambda h_, i, b_: (h_, i, 0)),
    ]
    if key_padding_mask is not None:
        inputs.append(_mask_to_additive(key_padding_mask))
        in_specs.append(pl.BlockSpec((1, 1, lk), lambda h_, i, b_: (b_, 0, 0)))

    kernel = functools.partial(
        _attn_kernel, causal=causal, lq=lq, lk=lk, bq=bq
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda h_, i, b_: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
        interpret=_interpret_mode(),
    )(*inputs)


# --------------------------------------------------------------- backward

def _recompute_p(q_blk, k_all, bias_blk, mask_ref, causal, i, bq, lq, lk):
    """Shared logits -> probabilities recompute for the backward kernels.
    Rows past Lq (the masked tail of the last q block) are zeroed so they
    cannot contribute to the dbias/dk/dv reductions."""
    logits = jax.lax.dot_general(
        q_blk, k_all, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits += bias_blk.astype(jnp.float32)
    if mask_ref:  # fp32 additive (1, Lk) row (see _attn_kernel)
        logits += mask_ref[0][0]
    rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + i * bq
    if causal:
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(cols > rows + (lk - lq), NEG_INF, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = e / s
    if lq % bq != 0:
        p = jnp.where(rows < lq, p, 0.0)
    return p  # fp32 (bq, Lk)


def _bwd_dq_dbias_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, *rest,
                         causal, lq, lk, bq, nb):
    mask_ref = rest[:-2]
    dq_ref, dbias_ref = rest[-2], rest[-1]
    i = pl.program_id(1)
    b_idx = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    p = _recompute_p(q, k, bias_ref[0], mask_ref, causal, i, bq, lq, lk)
    do = do_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    dp = jax.lax.dot_general(
        do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, Lk)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    di = jnp.sum(do * o, axis=-1, keepdims=True)
    dlogits = p * (dp - di)  # fp32 (bq, Lk); zero rows past Lq (p is zeroed)
    dq = jax.lax.dot_general(
        dlogits.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    # dbias accumulates over the (innermost) batch dimension
    @pl.when(b_idx == 0)
    def _():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    dbias_ref[0] += dlogits


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, *rest,
                    causal, lq, lk, bq, nb):
    mask_ref = rest[:-2]
    dk_ref, dv_ref = rest[-2], rest[-1]
    i = pl.program_id(2)  # q-block index is innermost here
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    p = _recompute_p(q, k, bias_ref[0], mask_ref, causal, i, bq, lq, lk)
    do = do_ref[0, 0].astype(jnp.float32)
    if lq % bq != 0:
        # garbage rows of the last q block may read NaN/Inf; zeroing p alone
        # is not enough (0 * NaN = NaN inside the cross-row matmul sums), so
        # the cotangent rows must be zeroed too
        rows = jax.lax.broadcasted_iota(jnp.int32, do.shape, 0) + i * bq
        do = jnp.where(rows < lq, do, 0.0)
    dp = jax.lax.dot_general(
        do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    di = jnp.sum(do * o, axis=-1, keepdims=True)
    dlogits = p * (dp - di)
    if lq % bq != 0:
        rows_l = jax.lax.broadcasted_iota(jnp.int32, dlogits.shape, 0) + i * bq
        dlogits = jnp.where(rows_l < lq, dlogits, 0.0)
    dv_c = jax.lax.dot_general(  # (Lk, D) = p^T @ do
        p.astype(do_ref.dtype), do.astype(do_ref.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dk_c = jax.lax.dot_general(  # (Lk, D) = dlogits^T @ q
        dlogits.astype(q.dtype), q,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += dk_c.astype(dk_ref.dtype)
    dv_ref[0, 0] += dv_c.astype(dv_ref.dtype)


def _flash_backward(q, k, v, bias, key_padding_mask, causal, g):
    """Pallas backward: streams q-blocks like the forward, recomputing the
    probabilities — no (B, H, Lq, Lk) tensor ever reaches HBM (the XLA
    autodiff fallback materializes it in fp32, the dominant training cost)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bq = _pick_bq(lq, lk)
    nb = pl.cdiv(lq, bq)

    had_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((h, lq, lk), jnp.float32)

    base_inputs = [q, k, v, bias, g]
    mask_input = []
    if key_padding_mask is not None:
        mask_input = [_mask_to_additive(key_padding_mask)]

    qspec = lambda perm: pl.BlockSpec((1, 1, bq, d), perm)
    kspec = lambda perm: pl.BlockSpec((1, 1, lk, d), perm)

    # kernel A: dq (write-once) + dbias (accumulate over innermost b)
    grid_a = (h, nb, b)
    in_specs_a = [
        qspec(lambda h_, i, b_: (b_, h_, i, 0)),
        kspec(lambda h_, i, b_: (b_, h_, 0, 0)),
        kspec(lambda h_, i, b_: (b_, h_, 0, 0)),
        pl.BlockSpec((1, bq, lk), lambda h_, i, b_: (h_, i, 0)),
        qspec(lambda h_, i, b_: (b_, h_, i, 0)),
    ] + ([pl.BlockSpec((1, 1, lk), lambda h_, i, b_: (b_, 0, 0))] if mask_input else [])
    dq, dbias = pl.pallas_call(
        functools.partial(_bwd_dq_dbias_kernel, causal=causal, lq=lq, lk=lk, bq=bq, nb=nb),
        grid=grid_a,
        in_specs=in_specs_a,
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda h_, i, b_: (b_, h_, i, 0)),
            pl.BlockSpec((1, bq, lk), lambda h_, i, b_: (h_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((h, lq, lk), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(*base_inputs, *mask_input)

    # kernel B: dk/dv accumulate over innermost q-block index
    grid_b = (h, b, nb)
    in_specs_b = [
        qspec(lambda h_, b_, i: (b_, h_, i, 0)),
        kspec(lambda h_, b_, i: (b_, h_, 0, 0)),
        kspec(lambda h_, b_, i: (b_, h_, 0, 0)),
        pl.BlockSpec((1, bq, lk), lambda h_, b_, i: (h_, i, 0)),
        qspec(lambda h_, b_, i: (b_, h_, i, 0)),
    ] + ([pl.BlockSpec((1, 1, lk), lambda h_, b_, i: (b_, 0, 0))] if mask_input else [])
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, causal=causal, lq=lq, lk=lk, bq=bq, nb=nb),
        grid=grid_b,
        in_specs=in_specs_b,
        out_specs=[
            kspec(lambda h_, b_, i: (b_, h_, 0, 0)),
            kspec(lambda h_, b_, i: (b_, h_, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lk, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, lk, d), q.dtype),
        ],
        interpret=_interpret_mode(),
    )(*base_inputs, *mask_input)

    db = dbias if had_bias else None
    return dq, dk, dv, db


def _fwd(q, k, v, bias, key_padding_mask, causal):
    return _flash_forward(q, k, v, bias, key_padding_mask, causal), (
        q, k, v, bias, key_padding_mask,
    )


# Backward implementation, A/B-measured on v5e at the reference train config
# (OFA-Base, 512px, batch 16, one-hot CE, uploads overlapped; README table):
#   remat + pallas   0.61 s/step   <- default (streaming kernels, no
#                                     (B,H,Lq,Lk) HBM logits tensor)
#   remat + xla      0.70 s/step   (einsum recompute; materializes fp32
#                                     logits under remat)
import os as _os

BACKWARD_IMPL = _os.environ.get("IFSEG_FLASH_BACKWARD", "pallas")


def _bwd(causal, res, g):
    q, k, v, bias, key_padding_mask = res
    if BACKWARD_IMPL == "pallas":
        dq, dk, dv, db = _flash_backward(q, k, v, bias, key_padding_mask, causal, g)
        return dq, dk, dv, db, None
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _attention_xla(q_, k_, v_, b_, key_padding_mask, causal),
        q, k, v, bias if bias is not None else jnp.zeros(
            (q.shape[1], q.shape[2], k.shape[2]), jnp.float32
        ),
    )
    dq, dk, dv, db = vjp(g)
    return dq, dk, dv, (db if bias is not None else None), None


flash_attention_bias.defvjp(_fwd, _bwd)


def flash_available() -> bool:
    backend = jax.default_backend()
    return _HAS_PLTPU and backend in ("tpu", "axon")
