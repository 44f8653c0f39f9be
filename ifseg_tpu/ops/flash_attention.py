"""Fused attention with additive position bias (Pallas TPU kernel).

OFA attention needs per-layer additive biases (abs q·k bias + token/image
relative biases, SURVEY.md "hard parts"), which rules out stock flash kernels.
At IFSeg sequence lengths (~1.1k-4.2k tokens) whole-K/V blocks fit VMEM, so
the kernel streams q-blocks against resident K/V and never materializes the
(B, H, Lq, Lk) logits in HBM — the reference materializes them per layer
(unify_multihead_attention.py:464-489), which is the main HBM-bandwidth cost
of the torch model.

Two operand layouts:
  - packed (default model path): q (B, Lq, H*D), k/v (B, Lk, H*D) — exactly
    the projection outputs — and output (B, Lq, H*D), ready for out_proj.
    NO (B,H,L,D) transpose ever reaches HBM; at OFA-Base 512px batch-32
    serving the four layout copies per attention site (q/k/v in + out back)
    were ~10 ms/step of pure HBM traffic (measured v5e).  Mosaic requires
    lane-axis blocks to be multiples of 128 (or the full axis), so a block
    carries HB consecutive heads with HB*D % 128 == 0 (OFA-Base: D=64 ->
    HB=2) and the kernel slices per-head inside VMEM — a vector relayout
    that is O(L*D) per program vs the O(bq*L*D) matmuls.
  - legacy: q (B, H, Lq, D), k/v (B, H, Lk, D) — kept for the ring-attention
    CP path and existing tests.

Bias is (H, Lq, Lk) fp32 or bf16 shared across the batch (all OFA biases are
batch-independent; the bf16 train-path pack halves the dominant bias HBM
traffic and matches the reference's fp16 bias precision); optional key
padding mask (B, Lk).  Logits/softmax always accumulate fp32 on the MXU,
dbias accumulates over batch in fp32 scratch, output in the input dtype.

The q-block size adapts to Lq (zero or near-zero remainder) and K/V/bias
blocks span the full key length.  A ragged last q block is handled
differently per direction: the forward relies on Pallas's masked block
semantics (out-of-bounds rows read garbage and are dropped on write — rows
are independent there), while the backward zero-pads q/do/bias to an exact
block multiple in the wrapper (see _flash_backward) because its cross-row
reductions would otherwise need per-program row masking, which measurably
knocks Mosaic off its fast path.  Either way the block search matters:
padding Lq 1056 -> 1280 (the old fixed-256 block) wasted 21% of the
attention FLOPs; adaptive blocks pad 1025 -> 1032 (0.7%).
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


def _heads_per_block(h: int, d: int) -> int:
    """Packed layout: heads per lane-axis block.  Mosaic requires the last
    block dim to be a multiple of 128 or the full axis; group the smallest
    head count whose combined width satisfies that (OFA-Base D=64 -> 2;
    tiny D=8,H=4 -> 4 == all heads == full E, also legal)."""
    for hb in range(1, h):
        if h % hb == 0 and (hb * d) % 128 == 0:
            return hb
    return h


def _pick_bq(lq: int, lk: int, hb: int = 1, bufs: Optional[int] = None,
             prefer_large: bool = False,
             bytes_per_cell: Optional[int] = None) -> int:
    """q-block size <= 512 whose program VMEM footprint stays under budget.

    The dominant VMEM terms scale with bq * lk: ``bytes_per_cell`` is the
    number of live bytes per (bq, lk) cell in one program (``bufs`` is the
    legacy fp32-buffer count, = bytes/4).  Forward: one fp32 logits
    temporary + two pipeline-buffered bias blocks of hb heads.  Backward
    dq/dbias kernel: ~4 fp32 recompute temporaries + double-buffered bias in
    + dbias out (bias dtype!) + the fp32 batch-accumulation scratch.  A
    byte-exact model matters: charging the now-bf16 bias at fp32 width
    halved bq (152 vs 280 at Lq=Lk=1025), doubling the program count and
    K/V re-reads per step.

    Two selection modes, per how the caller handles a ragged last block:
      - waste-minimizing (forward): scan block counts for the best fit
        (lq=1056 -> bq=352 exact; lq=1025 -> bq=344, 7 masked rows).  The
        forward drops out-of-bounds rows on write, so waste = dead FLOPs.
      - prefer_large (backward): just the largest 8-multiple under the cap.
        The backward wrapper zero-pads q to nb*bq, so waste costs only the
        pad rows' FLOPs (~3%) — while waste-minimizing at lq=1025 picked
        bq=24 (43 programs!), measured 19.4 ms per dq+dkv pair vs 4.8 ms
        at bq=176 on v5e."""
    if bytes_per_cell is None:
        bytes_per_cell = 4 * (bufs if bufs is not None else 2 * hb + 1)
    cap = max(_VMEM_BUDGET // (lk * bytes_per_cell), 128)
    cap = min(512, cap)
    if prefer_large:
        return min(cap // 8 * 8, -(-lq // 8) * 8)
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


def _head_views(ref, packed, hb, d):
    """Per-head 2-D (rows, d) views of one program's q/k/v/do block."""
    if not packed:
        return [ref[0, 0]]
    blk = ref[0]  # (rows, hb*d)
    if hb == 1:
        return [blk]
    return [blk[:, g * d:(g + 1) * d] for g in range(hb)]


def _softmax_rows(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e, jnp.sum(e, axis=-1, keepdims=True)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, causal, lq, lk, bq,
                 packed, hb, d, with_stats=False):
    # rest = (mask_ref?, out_ref[, lse_ref]); lse_ref (1, 1, bq, hb) when the
    # vjp forward also saves the row logsumexp for the backward kernels
    lse_ref = None
    if with_stats:
        lse_ref = rest[-1]
        rest = rest[:-1]
    mask_ref = rest[:-1]
    out_ref = rest[-1]
    i = pl.program_id(1)
    # keep matmul inputs in their native (bf16) dtype: the MXU runs bf16 at
    # 4x the fp32 rate; accumulation stays fp32 via preferred_element_type
    qs = _head_views(q_ref, packed, hb, d)
    ks = _head_views(k_ref, packed, hb, d)
    vs = _head_views(v_ref, packed, hb, d)
    outs = []
    for g in range(len(qs)):
        logits = jax.lax.dot_general(
            qs[g], ks[g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, Lk) fp32
        logits += bias_ref[g].astype(jnp.float32)
        if mask_ref:  # batch-dependent key padding: fp32 additive (1, Lk)
            # row.  A bool/int mask + where() costs 2.2x kernel time on the
            # VPU (compare + select + 1-D relayout); a broadcast row add is
            # free and bit-identical after the max-subtracted exp.
            logits += mask_ref[0][0]
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + i * bq
            cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(cols > rows + (lk - lq), NEG_INF, logits)
        e, s = _softmax_rows(logits)
        # normalize AFTER the PV matmul: divides (bq, D) instead of (bq, Lk)
        acc = jax.lax.dot_general(
            e.astype(vs[g].dtype), vs[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((acc / s).astype(out_ref.dtype))
        if lse_ref is not None:
            m = jnp.max(logits, axis=-1, keepdims=True)
            lse_ref[0, 0, :, g] = (m + jnp.log(s))[:, 0]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    if packed:
        out_ref[0] = out
    else:
        out_ref[0, 0] = out


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


# ------------------------------------------------------------ spec builders

def _shapes(q, k, num_heads):
    """-> (b, h, lq, lk, d, packed, hb)."""
    if num_heads is not None:  # packed (B, L, H*D)
        b, lq, e = q.shape
        d = e // num_heads
        return b, num_heads, lq, k.shape[1], d, True, _heads_per_block(num_heads, d)
    b, h, lq, d = q.shape
    return b, h, lq, k.shape[2], d, False, 1


def _qspec(bq, d, hb, packed, perm4, perm3):
    return (
        pl.BlockSpec((1, bq, hb * d), perm3) if packed
        else pl.BlockSpec((1, 1, bq, d), perm4)
    )


def _flash_forward(q, k, v, bias, key_padding_mask, causal, num_heads=None,
                   with_stats=False):
    b, h, lq, lk, d, packed, hb = _shapes(q, k, num_heads)
    # byte-accurate footprint (see _pick_bq): one fp32 logits temporary +
    # double-buffered bias blocks at the bias dtype
    bias_bytes = 4 if bias is None else bias.dtype.itemsize
    bq = _pick_bq(lq, lk, hb, bytes_per_cell=4 + 2 * hb * bias_bytes)
    nb = pl.cdiv(lq, bq)

    if bias is None:
        bias = jnp.zeros((h, lq, lk), jnp.float32)

    inputs = [q, k, v, bias]
    # grid order (h, i, b): batch varies fastest, so the (h, i)-indexed bias
    # block is unchanged across consecutive programs and Pallas skips its
    # DMA — without this the fp32 bias is re-fetched per batch element and
    # dominates the kernel's HBM traffic
    grid = (h // hb, nb, b)
    in_specs = [
        _qspec(bq, d, hb, packed,
               lambda h_, i, b_: (b_, h_, i, 0), lambda h_, i, b_: (b_, i, h_)),
        _qspec(lk, d, hb, packed,
               lambda h_, i, b_: (b_, h_, 0, 0), lambda h_, i, b_: (b_, 0, h_)),
        _qspec(lk, d, hb, packed,
               lambda h_, i, b_: (b_, h_, 0, 0), lambda h_, i, b_: (b_, 0, h_)),
        pl.BlockSpec((hb, bq, lk), lambda h_, i, b_: (h_, i, 0)),
    ]
    if key_padding_mask is not None:
        inputs.append(_mask_to_additive(key_padding_mask))
        in_specs.append(pl.BlockSpec((1, 1, lk), lambda h_, i, b_: (b_, 0, 0)))

    kernel = functools.partial(
        _attn_kernel, causal=causal, lq=lq, lk=lk, bq=bq, packed=packed,
        hb=hb, d=d, with_stats=with_stats,
    )
    out_shape = (b, lq, h * d) if packed else (b, h, lq, d)
    out_specs = _qspec(bq, d, hb, packed,
                       lambda h_, i, b_: (b_, h_, i, 0),
                       lambda h_, i, b_: (b_, i, h_))
    out_shapes = jax.ShapeDtypeStruct(out_shape, q.dtype)
    if with_stats:
        # row logsumexp in the (B, H/hb, Lq, hb) layout the backward kernels
        # read: the trailing (bq, hb) block dims satisfy Mosaic's tiling
        # rules (hb = full axis) and each head group's rows are addressed by
        # a STATIC lane index inside the kernel
        out_specs = [out_specs,
                     pl.BlockSpec((1, 1, bq, hb), lambda h_, i, b_: (b_, h_, i, 0))]
        out_shapes = [out_shapes,
                      jax.ShapeDtypeStruct((b, h // hb, lq, hb), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret_mode(),
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attention_bias_stats(q, k, v, bias, key_padding_mask, causal=False):
    """Fused attention returning ``(out, lse)`` — the row logsumexp rides
    along as a primal OUTPUT so that under ``jax.checkpoint`` a remat policy
    saving 'attn_lse' substitutes the stored value and the backward never
    re-runs the forward kernel (an lse-as-residual-only design measured one
    extra forward kernel per site per step).  Legacy layout:

    q (B,H,Lq,D); k,v (B,H,Lk,D); bias (H,Lq,Lk) fp32/bf16 or None;
    key_padding_mask (B,Lk) bool (True = pad) or None.
    lse is (B, H/hb, Lq, hb) fp32 (the backward kernels' block layout).
    """
    return _flash_forward(q, k, v, bias, key_padding_mask, causal,
                          with_stats=True)


def flash_attention_bias(q, k, v, bias, key_padding_mask, causal=False):
    """Fused attention forward (legacy layout), output only."""
    return flash_attention_bias_stats(q, k, v, bias, key_padding_mask, causal)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_bias_packed_stats(q, k, v, bias, key_padding_mask, causal,
                                      num_heads):
    """Packed-layout fused attention returning ``(out, lse)``: q (B,Lq,H*D),
    k/v (B,Lk,H*D) — the raw projection outputs — and out (B,Lq,H*D).  No
    head transpose touches HBM in either direction (blocks carry head
    groups; see module doc)."""
    return _flash_forward(
        q, k, v, bias, key_padding_mask, causal, num_heads=num_heads,
        with_stats=True,
    )


def flash_attention_bias_packed(q, k, v, bias, key_padding_mask, causal,
                                num_heads):
    """Packed-layout fused attention, output only."""
    return flash_attention_bias_packed_stats(
        q, k, v, bias, key_padding_mask, causal, num_heads
    )[0]


def flash_attention_bias_packed_infer(q, k, v, bias, key_padding_mask,
                                      causal, num_heads):
    """Inference-only packed forward: no lse output, no custom vjp —
    differentiating through this raises (use the *_stats variant in paths
    that train)."""
    return _flash_forward(
        q, k, v, bias, key_padding_mask, causal, num_heads=num_heads
    )


# None = auto (interpret when not on TPU hardware); tests may force True
INTERPRET = None


def _interpret_mode() -> bool:
    if INTERPRET is not None:
        return INTERPRET
    return jax.default_backend() not in ("tpu", "axon")


# --------------------------------------------------------------- backward

def _recompute_p(q_blk, k_all, bias_blk, mask_ref, causal, i, bq, lq, lk,
                 lse_rows):
    """Shared logits -> probabilities recompute for the backward kernels:
    ``p = exp(logits - lse)`` with the row logsumexp SAVED by the vjp
    forward — no max/sum/divide passes, and the kernels need no p@v matmul
    to rebuild the forward output (``di`` comes in precomputed from the
    saved output, the standard flash-backward structure).

    The wrapper (_flash_backward) pads q/do/bias to an exact block multiple
    before launching, so there is NO in-kernel tail handling: measured on
    v5e, per-program row-masking for a ragged Lq (the 1025-token decoder)
    knocked Mosaic off its fast path and made these kernels 3-5x slower
    than the aligned encoder case (14.8/24 ms vs 4.8 ms per dq+dkv pair).
    Padded q rows are all-zero with lse padded to +40: p = exp(bias - 40)
    underflows to ~0, and the zero ``do`` rows kill every padded
    contribution to dk/dv/dbias exactly."""
    logits = jax.lax.dot_general(
        q_blk, k_all, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits += bias_blk.astype(jnp.float32)
    if mask_ref:  # fp32 additive (1, Lk) row (see _attn_kernel)
        logits += mask_ref[0][0]
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + i * bq
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(cols > rows + (lk - lq), NEG_INF, logits)
    return jnp.exp(logits - lse_rows[:, None])  # fp32 (bq, Lk)


def _bwd_dq_dbias_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                         di_ref, *rest, causal, lq, lk, bq, nb, packed, hb, d):
    mask_ref = rest[:-3]
    dq_ref, dbias_ref, dbias_acc = rest[-3], rest[-2], rest[-1]
    i = pl.program_id(1)
    b_idx = pl.program_id(2)
    qs = _head_views(q_ref, packed, hb, d)
    ks = _head_views(k_ref, packed, hb, d)
    vs = _head_views(v_ref, packed, hb, d)
    dos = _head_views(do_ref, packed, hb, d)

    # dbias accumulates over the (innermost) batch dimension in an fp32
    # scratch (the bias — and therefore its cotangent — may be bf16; a bf16
    # output ref would accumulate the batch sum at 8 mantissa bits)
    @pl.when(b_idx == 0)
    def _():
        dbias_acc[...] = jnp.zeros(dbias_acc.shape, dbias_acc.dtype)

    dqs = []
    for g in range(len(qs)):
        q, k, v = qs[g], ks[g], vs[g]
        p = _recompute_p(q, k, bias_ref[g], mask_ref, causal, i, bq, lq, lk,
                         lse_ref[0, 0, :, g])
        do = dos[g].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, Lk)
        di = di_ref[0, 0, :, g][:, None]  # rowsum(do*out), saved-out form
        dlogits = p * (dp - di)  # fp32; exact zeros on padded rows (do = 0)
        dq = jax.lax.dot_general(
            dlogits.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqs.append(dq.astype(dq_ref.dtype))
        dbias_acc[g] += dlogits
    dq = dqs[0] if len(dqs) == 1 else jnp.concatenate(dqs, axis=-1)
    if packed:
        dq_ref[0] = dq
    else:
        dq_ref[0, 0] = dq

    @pl.when(b_idx == pl.num_programs(2) - 1)
    def _():
        dbias_ref[...] = dbias_acc[...].astype(dbias_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, di_ref,
                    *rest, causal, lq, lk, bq, nb, packed, hb, d):
    mask_ref = rest[:-2]
    dk_ref, dv_ref = rest[-2], rest[-1]
    i = pl.program_id(2)  # q-block index is innermost here
    qs = _head_views(q_ref, packed, hb, d)
    ks = _head_views(k_ref, packed, hb, d)
    vs = _head_views(v_ref, packed, hb, d)
    dos = _head_views(do_ref, packed, hb, d)
    g_dtype = do_ref.dtype

    dks, dvs = [], []
    for g in range(len(qs)):
        q, k, v = qs[g], ks[g], vs[g]
        p = _recompute_p(q, k, bias_ref[g], mask_ref, causal, i, bq, lq, lk,
                         lse_ref[0, 0, :, g])
        do = dos[g].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        di = di_ref[0, 0, :, g][:, None]
        dlogits = p * (dp - di)
        dv_c = jax.lax.dot_general(  # (Lk, D) = p^T @ do
            p.astype(g_dtype), do.astype(g_dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dk_c = jax.lax.dot_general(  # (Lk, D) = dlogits^T @ q
            dlogits.astype(q.dtype), q,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dks.append(dk_c.astype(dk_ref.dtype))
        dvs.append(dv_c.astype(dv_ref.dtype))
    dk = dks[0] if len(dks) == 1 else jnp.concatenate(dks, axis=-1)
    dv = dvs[0] if len(dvs) == 1 else jnp.concatenate(dvs, axis=-1)

    @pl.when(i == 0)
    def _():
        if packed:
            dk_ref[0] = jnp.zeros_like(dk_ref[0])
            dv_ref[0] = jnp.zeros_like(dv_ref[0])
        else:
            dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
            dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    if packed:
        dk_ref[0] += dk
        dv_ref[0] += dv
    else:
        dk_ref[0, 0] += dk
        dv_ref[0, 0] += dv


def _flash_backward(q, k, v, bias, key_padding_mask, causal, g, out, lse,
                    num_heads=None):
    """Pallas backward: streams q-blocks like the forward, rebuilding the
    probabilities from the SAVED row logsumexp (p = exp(logits - lse)) — no
    (B, H, Lq, Lk) tensor ever reaches HBM, no per-block max/sum/divide,
    and no p@v matmul to rebuild the output: di = rowsum(do*out) comes in
    precomputed from the saved forward output (two matmuls fewer per site
    than the stats-free recompute this replaces)."""
    b, h, lq, lk, d, packed, hb = _shapes(q, k, num_heads)

    # di in the same (B, H/hb, Lq, hb) layout as lse (see _flash_forward)
    if packed:
        prod = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
            b, lq, h, d
        )
        di = jnp.sum(prod, axis=-1).transpose(0, 2, 1)  # (B, H, Lq)
    else:
        di = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    di = di.reshape(b, h // hb, hb, lq).transpose(0, 1, 3, 2)
    # kernel A's (larger) footprint: 4 fp32 recompute temporaries + bias in
    # (double-buffered) + dbias out at the bias dtype + fp32 scratch
    bias_bytes = 4 if bias is None else bias.dtype.itemsize
    bq = _pick_bq(
        lq, lk, hb, prefer_large=True,
        bytes_per_cell=4 * 4 + 3 * hb * bias_bytes + 4 * hb,
    )
    nb = pl.cdiv(lq, bq)

    had_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((h, lq, lk), jnp.float32)

    # Pad the q-axis to an exact block multiple: ragged tails are handled by
    # zero rows, never by in-kernel masking (see _recompute_p docstring).
    # Pad cost is ~150 MB of HBM copies (q/do/bias in, dq/dbias slices out)
    # at OFA-Base shapes -- ~0.4 ms against the ~10 ms/kernel the in-kernel
    # tail path cost.  The causal offset keeps the ORIGINAL lq.
    lq_p = nb * bq
    pad_q = lq_p - lq
    if pad_q:
        qpad = [(0, 0)] * q.ndim
        qpad[2 if not packed else 1] = (0, pad_q)
        q = jnp.pad(q, qpad)
        g = jnp.pad(g, qpad)
        bias = jnp.pad(bias, [(0, 0), (0, pad_q), (0, 0)])
        # lse pad +40: padded rows' p = exp(bias - 40) underflows to ~0 (and
        # their do rows are zero anyway); di pad 0
        lse = jnp.pad(lse, [(0, 0), (0, 0), (0, pad_q), (0, 0)],
                      constant_values=40.0)
        di = jnp.pad(di, [(0, 0), (0, 0), (0, pad_q), (0, 0)])

    base_inputs = [q, k, v, bias, g, lse, di]
    mask_input = []
    if key_padding_mask is not None:
        mask_input = [_mask_to_additive(key_padding_mask)]

    qspec = lambda perm4, perm3: _qspec(bq, d, hb, packed, perm4, perm3)
    kspec = lambda perm4, perm3: _qspec(lk, d, hb, packed, perm4, perm3)
    q_shape = (b, lq_p, h * d) if packed else (b, h, lq_p, d)
    k_shape = (b, lk, h * d) if packed else (b, h, lk, d)
    kw = dict(causal=causal, lq=lq, lk=lk, bq=bq, nb=nb, packed=packed,
              hb=hb, d=d)

    # kernel A: dq (write-once) + dbias (accumulate over innermost b)
    grid_a = (h // hb, nb, b)
    in_specs_a = [
        qspec(lambda h_, i, b_: (b_, h_, i, 0), lambda h_, i, b_: (b_, i, h_)),
        kspec(lambda h_, i, b_: (b_, h_, 0, 0), lambda h_, i, b_: (b_, 0, h_)),
        kspec(lambda h_, i, b_: (b_, h_, 0, 0), lambda h_, i, b_: (b_, 0, h_)),
        pl.BlockSpec((hb, bq, lk), lambda h_, i, b_: (h_, i, 0)),
        qspec(lambda h_, i, b_: (b_, h_, i, 0), lambda h_, i, b_: (b_, i, h_)),
        pl.BlockSpec((1, 1, bq, hb), lambda h_, i, b_: (b_, h_, i, 0)),
        pl.BlockSpec((1, 1, bq, hb), lambda h_, i, b_: (b_, h_, i, 0)),
    ] + ([pl.BlockSpec((1, 1, lk), lambda h_, i, b_: (b_, 0, 0))] if mask_input else [])
    dq, dbias = pl.pallas_call(
        functools.partial(_bwd_dq_dbias_kernel, **kw),
        grid=grid_a,
        in_specs=in_specs_a,
        out_specs=[
            qspec(lambda h_, i, b_: (b_, h_, i, 0),
                  lambda h_, i, b_: (b_, i, h_)),
            pl.BlockSpec((hb, bq, lk), lambda h_, i, b_: (h_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q_shape, q.dtype),
            jax.ShapeDtypeStruct((h, lq_p, lk), bias.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((hb, bq, lk), jnp.float32)],
        interpret=_interpret_mode(),
    )(*base_inputs, *mask_input)
    if pad_q:
        dq = dq[:, :lq] if packed else dq[:, :, :lq]
        dbias = dbias[:, :lq]

    # kernel B: dk/dv accumulate over innermost q-block index
    grid_b = (h // hb, b, nb)
    in_specs_b = [
        qspec(lambda h_, b_, i: (b_, h_, i, 0), lambda h_, b_, i: (b_, i, h_)),
        kspec(lambda h_, b_, i: (b_, h_, 0, 0), lambda h_, b_, i: (b_, 0, h_)),
        kspec(lambda h_, b_, i: (b_, h_, 0, 0), lambda h_, b_, i: (b_, 0, h_)),
        pl.BlockSpec((hb, bq, lk), lambda h_, b_, i: (h_, i, 0)),
        qspec(lambda h_, b_, i: (b_, h_, i, 0), lambda h_, b_, i: (b_, i, h_)),
        pl.BlockSpec((1, 1, bq, hb), lambda h_, b_, i: (b_, h_, i, 0)),
        pl.BlockSpec((1, 1, bq, hb), lambda h_, b_, i: (b_, h_, i, 0)),
    ] + ([pl.BlockSpec((1, 1, lk), lambda h_, b_, i: (b_, 0, 0))] if mask_input else [])
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kw),
        grid=grid_b,
        in_specs=in_specs_b,
        out_specs=[
            kspec(lambda h_, b_, i: (b_, h_, 0, 0),
                  lambda h_, b_, i: (b_, 0, h_)),
            kspec(lambda h_, b_, i: (b_, h_, 0, 0),
                  lambda h_, b_, i: (b_, 0, h_)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k_shape, q.dtype),
            jax.ShapeDtypeStruct(k_shape, q.dtype),
        ],
        interpret=_interpret_mode(),
    )(*base_inputs, *mask_input)

    db = dbias if had_bias else None
    return dq, dk, dv, db


def _fwd(q, k, v, bias, key_padding_mask, causal):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _flash_forward(
        q, k, v, bias, key_padding_mask, causal, with_stats=True
    )
    # names on the RESIDUAL path: under nn.remat with the save-attn policy
    # these are stored, so the backward substitutes them and the forward
    # kernel is never re-run to regenerate residuals
    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return (out, lse), (q, k, v, bias, key_padding_mask, out, lse)


def _fwd_packed(q, k, v, bias, key_padding_mask, causal, num_heads):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _flash_forward(
        q, k, v, bias, key_padding_mask, causal, num_heads=num_heads,
        with_stats=True,
    )
    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return (out, lse), (q, k, v, bias, key_padding_mask, out, lse)


# Backward implementation, A/B-measured on v5e at the reference train config
# (OFA-Base, 512px, batch 16, one-hot CE, uploads overlapped; README table):
#   remat + pallas      streaming kernels, no (B,H,Lq,Lk) HBM logits tensor;
#                       7 block-matmuls per site (each of the dq and dkv
#                       kernels re-derives p and dp)
#   remat + xla_stats   5 plain einsums from the SAVED (out, lse): p/dlogits
#                       are materialized bf16 (~27 MB/site) once and the big
#                       dq/dk/dv contractions run as stock XLA matmuls
#   remat + xla         full einsum softmax recompute (no saved stats);
#                       measured 0.70 vs 0.61 s/step in round 2 — kept only
#                       as the no-stats fallback
import os as _os

BACKWARD_IMPL = _os.environ.get("IFSEG_FLASH_BACKWARD", "pallas")


def _xla_stats_backward(q, k, v, bias, key_padding_mask, causal, g, out, lse,
                        num_heads=None):
    """Attention backward as five stock XLA einsums from the saved stats.

    Exactly the kernels' math: p = exp(q@k^T + bias + mask - lse) with the
    SAVED row logsumexp, di = rowsum(g*out) from the SAVED output, then
      dp = g @ v^T,   dlogits = p * (dp - di)
      dq = dlogits @ k,   dk = dlogits^T @ q,   dv = p^T @ g
      dbias = sum_b dlogits   (fp32 accumulation)
    FLOP-optimal (5 matmuls vs the two streaming kernels' 7 — both re-derive
    p and dp) at the cost of materializing p/dlogits in HBM at the compute
    dtype.  At OFA-Base train shapes that is ~27 MB per (B,H,Lq,Lk) tensor
    per site (~0.2 ms of HBM traffic) against two saved 27 GFLOP matmuls.
    """
    b, h, lq, lk, d, packed, hb = _shapes(q, k, num_heads)
    if packed:
        to4 = lambda t, ln: t.reshape(b, ln, h, d).transpose(0, 2, 1, 3)
        q4, k4, v4 = to4(q, lq), to4(k, lk), to4(v, lk)
        g4, o4 = to4(g, lq), to4(out, lq)
    else:
        q4, k4, v4, g4, o4 = q, k, v, g, out
    # lse (B, H/hb, Lq, hb) -> (B, H, Lq); head order within a group is the
    # lane order the forward kernel wrote (head = h_grp*hb + j)
    lse_h = lse.transpose(0, 1, 3, 2).reshape(b, h, lq)
    cdt = q4.dtype

    logits = jnp.einsum("bhqd,bhkd->bhqk", q4, k4,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits += bias[None].astype(jnp.float32)
    if key_padding_mask is not None:
        logits += _mask_to_additive(key_padding_mask)[:, None]  # (B,1,1,Lk)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        logits = jnp.where((cols > rows + (lk - lq))[None, None], NEG_INF,
                           logits)
    p32 = jnp.exp(logits - lse_h[..., None])
    di = jnp.sum(g4.astype(jnp.float32) * o4.astype(jnp.float32), axis=-1)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g4, v4,
                    preferred_element_type=jnp.float32)
    dl32 = p32 * (dp - di[..., None])
    p, dl = p32.astype(cdt), dl32.astype(cdt)
    dq4 = jnp.einsum("bhqk,bhkd->bhqd", dl, k4,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    dk4 = jnp.einsum("bhqk,bhqd->bhkd", dl, q4,
                     preferred_element_type=jnp.float32).astype(k.dtype)
    dv4 = jnp.einsum("bhqk,bhqd->bhkd", p, g4,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    db = None
    if bias is not None:
        db = jnp.sum(dl32, axis=0).astype(bias.dtype)
    if packed:
        to3 = lambda t, ln: t.transpose(0, 2, 1, 3).reshape(b, ln, h * d)
        return to3(dq4, lq), to3(dk4, lk), to3(dv4, lk), db
    return dq4, dk4, dv4, db


def _bwd(causal, res, g):
    q, k, v, bias, key_padding_mask, out, lse = res
    g, _ = g  # (d_out, d_lse); lse is stats-only, its cotangent is dropped
    if BACKWARD_IMPL == "pallas":
        dq, dk, dv, db = _flash_backward(
            q, k, v, bias, key_padding_mask, causal, g, out, lse
        )
        return dq, dk, dv, db, None
    if BACKWARD_IMPL == "xla_stats":
        dq, dk, dv, db = _xla_stats_backward(
            q, k, v, bias, key_padding_mask, causal, g, out, lse
        )
        return dq, dk, dv, db, None
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _attention_xla(q_, k_, v_, b_, key_padding_mask, causal),
        q, k, v, bias if bias is not None else jnp.zeros(
            (q.shape[1], q.shape[2], k.shape[2]), jnp.float32
        ),
    )
    dq, dk, dv, db = vjp(g)
    return dq, dk, dv, (db if bias is not None else None), None


def _bwd_packed(causal, num_heads, res, g):
    q, k, v, bias, key_padding_mask, out, lse = res
    g, _ = g  # (d_out, d_lse); lse is stats-only, its cotangent is dropped
    if BACKWARD_IMPL == "pallas":
        dq, dk, dv, db = _flash_backward(
            q, k, v, bias, key_padding_mask, causal, g, out, lse,
            num_heads=num_heads,
        )
        return dq, dk, dv, db, None
    if BACKWARD_IMPL == "xla_stats":
        dq, dk, dv, db = _xla_stats_backward(
            q, k, v, bias, key_padding_mask, causal, g, out, lse,
            num_heads=num_heads,
        )
        return dq, dk, dv, db, None
    # XLA recompute fallback: reshape to the legacy layout
    b, lq, e = q.shape
    lk = k.shape[1]
    d = e // num_heads
    to4 = lambda t, ln: t.reshape(b, ln, num_heads, d).transpose(0, 2, 1, 3)
    to3 = lambda t, ln: t.transpose(0, 2, 1, 3).reshape(b, ln, e)
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _attention_xla(q_, k_, v_, b_, key_padding_mask, causal),
        to4(q, lq), to4(k, lk), to4(v, lk),
        bias if bias is not None else jnp.zeros((num_heads, lq, lk), jnp.float32),
    )
    dq, dk, dv, db = vjp(to4(g, lq))
    return (to3(dq, lq), to3(dk, lk), to3(dv, lk),
            (db if bias is not None else None), None)


flash_attention_bias_stats.defvjp(_fwd, _bwd)
flash_attention_bias_packed_stats.defvjp(_fwd_packed, _bwd_packed)


def flash_available() -> bool:
    backend = jax.default_backend()
    return _HAS_PLTPU and backend in ("tpu", "axon")
