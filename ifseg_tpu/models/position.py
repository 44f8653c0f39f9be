"""OFA positional machinery: bucket tables and bias assembly.

Three interacting bias systems (parity-critical; see SURVEY.md "hard parts"):
  1. absolute position bias: LN(pos_embed) -> pos_q/pos_k linear -> q·kᵀ per head
     (encoder_module.py:611-621, decoder_module.py:335-404)
  2. token relative bias: log-bucket relative positions
     (encoder_module.py:71-84 make_token_bucket_position)
  3. 2-D image/seg relative bias: 2-D relative coords + special CLS buckets
     (encoder_module.py:87-104 make_image_bucket_position), bilinearly
     interpolated on each grid pair when the runtime grid differs from the
     bucket grid (encoder_module.py:799-808, decoder_module.py:601-627)

All bucket tables are static numpy (computed once per shape and cached); only
the per-layer embedding lookups and the interpolation matmuls run on device.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ifseg_tpu.ops.resize import bilinear_matrix


@lru_cache(maxsize=None)
def make_token_bucket_position(bucket_size: int, max_position: int = 1024) -> np.ndarray:
    """Log-bucketed relative positions, exactly matching the reference quirks
    (encoder_module.py:71-84): |rel| <= mid keeps the signed offset; larger
    offsets are log-spaced into mid-1 buckets."""
    context = np.arange(max_position, dtype=np.int64)[:, None]
    memory = np.arange(max_position, dtype=np.int64)[None, :]
    rel = context - memory
    sign = np.sign(rel)
    mid = bucket_size // 2
    abs_pos = np.where((rel < mid) & (rel > -mid), mid - 1, np.abs(rel))
    with np.errstate(divide="ignore"):
        log_pos = (
            np.ceil(
                np.log(abs_pos / mid) / np.log((max_position - 1) / mid) * (mid - 1)
            )
            + mid
        )
    log_pos = log_pos.astype(np.int32)
    bucket = np.where(abs_pos <= mid, rel, (log_pos * sign).astype(np.int64))
    return (bucket + bucket_size - 1).astype(np.int32)


@lru_cache(maxsize=None)
def make_image_bucket_position(bucket_size: int, num_relative_distance: int) -> np.ndarray:
    """2-D relative-position index over a (bucket_size² + 1) token grid with a
    leading CLS slot (encoder_module.py:87-104)."""
    coords = np.stack(
        np.meshgrid(np.arange(bucket_size), np.arange(bucket_size), indexing="ij")
    )  # (2, H, W)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, HW, HW)
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += bucket_size - 1
    rel[:, :, 1] += bucket_size - 1
    rel[:, :, 0] *= 2 * bucket_size - 1
    index = np.zeros((bucket_size**2 + 1,) * 2, dtype=np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_relative_distance - 3
    index[0:, 0] = num_relative_distance - 2
    index[0, 0] = num_relative_distance - 1
    return index.astype(np.int32)


def image_num_rel_dis(image_bucket_size: int) -> int:
    return (2 * image_bucket_size - 1) * (2 * image_bucket_size - 1) + 3


@lru_cache(maxsize=None)
def image_grid_position_ids(h: int, w: int, image_bucket_size: int) -> np.ndarray:
    """Flattened grid position ids: row*bucket + col + 1 (encoder_module.py:339-341)."""
    ids = (
        np.arange(w, dtype=np.int64)[None, :]
        + np.arange(h, dtype=np.int64)[:, None] * image_bucket_size
        + 1
    )
    return ids.reshape(-1).astype(np.int32)


@lru_cache(maxsize=None)
def image_rp_bucket_for_grid(h: int, w: int, image_bucket_size: int) -> np.ndarray:
    """(h*w, h*w) bucket indices for a grid, via pairwise gather of the full
    bucket table (encoder_module.py:321-331)."""
    table = make_image_bucket_position(
        image_bucket_size, image_num_rel_dis(image_bucket_size)
    )
    pos = image_grid_position_ids(h, w, image_bucket_size)
    return table[np.ix_(pos, pos)].astype(np.int32)


@lru_cache(maxsize=None)
def image_rel_bucket_direct(h: int, w: int, bucket_size: int) -> np.ndarray:
    """(h*w, h*w) bucket indices computed directly from grid coordinates
    (equivalent to table[pos, pos] for grids within the bucket, but safe for
    padded grids wider than ``bucket_size``: out-of-range deltas clip).

    idx = (dr + B - 1) * (2B - 1) + (dc + B - 1).
    """
    r = np.arange(h * w) // w
    c = np.arange(h * w) % w
    dr = np.clip(r[:, None] - r[None, :], -(bucket_size - 1), bucket_size - 1)
    dc = np.clip(c[:, None] - c[None, :], -(bucket_size - 1), bucket_size - 1)
    idx = (dr + bucket_size - 1) * (2 * bucket_size - 1) + (dc + bucket_size - 1)
    return idx.astype(np.int32)


def gather_rel_bias(table_weight, rp_bucket) -> jnp.ndarray:
    """Per-layer bias lookup: (num_rel_dis, heads) table x (L, L) int buckets
    -> (heads, L, L) fp32."""
    values = jnp.take(table_weight, jnp.asarray(rp_bucket), axis=0)  # (L, L, H)
    return values.transpose(2, 0, 1).astype(jnp.float32)


def gather_rel_bias_all_layers(table, rp_bucket) -> jnp.ndarray:
    """All-layer bias lookup in ONE gather: (layers, num_rel, H) x (L, L) ->
    (layers, H, L, L) fp32.

    A single fused gather is ~4x faster on TPU than per-layer gathers (the
    per-gather fixed cost and index re-reads dominate); this is the hot-path
    formulation used by the encoder/decoder stacks."""
    layers, num_rel, h = table.shape
    cat = jnp.transpose(table, (1, 0, 2)).reshape(num_rel, layers * h)
    l1, l2 = rp_bucket.shape
    v = jnp.take(cat, jnp.asarray(rp_bucket), axis=0)  # (L1, L2, layers*H)
    return v.reshape(l1, l2, layers, h).transpose(2, 3, 0, 1).astype(jnp.float32)


# --------------------------------------------------------------------------
# Grid-bucket gather with a structure-aware backward.
#
# The autodiff transpose of the (L, L) bucket gather is a scatter-add of an
# (L², layers·H) cotangent into the bucket table, which XLA:TPU lowers to a
# sort-based segmented reduction — ~45 ms/step of sorts and dynamic-update
# -slices over 75M elements at the reference config (6 layers x 12 heads x
# 1025² decoder seg bias + 1024² encoder image bias).  But every grid bucket
# matrix is a pure function of (Δrow, Δcol): summing the cotangent over
# delta classes first is two small one-hot MXU contractions (~10 GF), after
# which the delta->bucket scatter is a (2h-1)(2w-1)-row matmul.  The
# structure (and BOS specials) is verified numerically at trace time; any
# bucket matrix that isn't a delta function falls back to the plain gather.
# --------------------------------------------------------------------------

_GRID_GATHER_CACHE = {}


def _build_grid_gather(rp: np.ndarray, h: int, w: int, bos: bool,
                       dtype=jnp.float32):
    """Returns a custom-vjp fn table -> (layers, H, L, L) in ``dtype``, or
    None if the bucket matrix has no (Δr, Δc) structure.

    ``dtype=bfloat16`` emits the expanded bias directly in compute precision:
    the forward expansion is exact in any dtype (every output element is a
    single one-hot product of a table value), the consumer converts to bf16
    anyway, and the fp32 intermediates otherwise cost ~300 MB of HBM traffic
    per expansion at 512px.  The backward keeps fp32 accumulation and returns
    an fp32 table gradient regardless of ``dtype``."""
    import jax

    off = 1 if bos else 0
    l1 = rp.shape[0]
    if l1 != off + h * w or rp.shape[1] != l1:
        return None
    g = rp[off:, off:].reshape(h, w, h, w)
    dr = np.arange(-(h - 1), h)
    dc = np.arange(-(w - 1), w)
    r1, r2 = np.maximum(dr, 0), np.maximum(dr, 0) - dr
    c1, c2 = np.maximum(dc, 0), np.maximum(dc, 0) - dc
    m = g[r1[:, None], c1[None, :], r2[:, None], c2[None, :]]  # (2h-1, 2w-1)
    idr = np.arange(h)[:, None, None, None] - np.arange(h)[None, None, :, None]
    idc = np.arange(w)[None, :, None, None] - np.arange(w)[None, None, None, :]
    if not np.array_equal(g, m[idr + h - 1, idc + w - 1]):
        return None
    if bos:
        b_row, b_col, b_corner = int(rp[0, off]), int(rp[off, 0]), int(rp[0, 0])
        if not (np.all(rp[0, off:] == b_row) and np.all(rp[off:, 0] == b_col)):
            return None

    eh = np.zeros((h, h, 2 * h - 1), np.float32)
    eh[np.arange(h)[:, None], np.arange(h)[None, :],
       np.arange(h)[:, None] - np.arange(h)[None, :] + h - 1] = 1.0
    ew = np.zeros((w, w, 2 * w - 1), np.float32)
    ew[np.arange(w)[:, None], np.arange(w)[None, :],
       np.arange(w)[:, None] - np.arange(w)[None, :] + w - 1] = 1.0
    bmaps = {}  # num_rel -> ((2h-1)(2w-1), num_rel) one-hot

    def _expand(table):
        """Forward by delta expansion: gather the tiny (F, 2h-1, 2w-1) delta
        table, then expand to (F, L, L) with the one-hot matmuls.  Exact
        (products with 1.0, sums over one nonzero term), and ~3x faster than
        the (L, L, F) gather whose (F, L, L) relayout XLA lowers to a
        72-iteration slice loop (~6 ms/step at 512px); the matmul output
        also fuses into the downstream pack add."""
        layers, num_rel, heads = table.shape
        f = layers * heads
        cat_t = jnp.transpose(table, (0, 2, 1)).reshape(f, num_rel)
        cat_t = cat_t.astype(dtype)
        tm = jnp.take(cat_t, jnp.asarray(m.ravel()), axis=1).reshape(
            f, 2 * h - 1, 2 * w - 1
        )
        t1 = jnp.einsum(
            "fkm,cdm->fkcd", tm, jnp.asarray(ew, dtype),
            preferred_element_type=dtype,
        )
        grid = jnp.einsum(
            "fkcd,rsk->frscd", t1, jnp.asarray(eh, dtype),
            preferred_element_type=dtype,
        )  # (F, r1, r2, c1, c2)
        grid = grid.transpose(0, 1, 3, 2, 4).reshape(f, h * w, h * w)
        if bos:
            top = jnp.concatenate(
                [
                    jnp.broadcast_to(cat_t[:, b_corner, None, None], (f, 1, 1)),
                    jnp.broadcast_to(cat_t[:, b_row, None, None], (f, 1, h * w)),
                ],
                axis=2,
            )
            rest = jnp.concatenate(
                [
                    jnp.broadcast_to(cat_t[:, b_col, None, None], (f, h * w, 1)),
                    grid,
                ],
                axis=2,
            )
            grid = jnp.concatenate([top, rest], axis=1)
        return grid.reshape(layers, heads, l1, l1)

    @jax.custom_vjp
    def fn(table):
        return _expand(table)

    def fwd(table):
        return _expand(table), table.shape

    def bwd(shape, dv):
        # fp32 accumulation from the (possibly bf16) cotangent: the first
        # contraction reads the big (F, L, L) tensor in its native dtype
        # (halving HBM traffic under bf16) while every sum accumulates fp32
        layers, num_rel, heads = shape
        f = layers * heads
        dfl = dv.reshape(f, l1, l1)
        if bos:
            d00 = dfl[:, 0, 0].astype(jnp.float32)
            drow = jnp.sum(dfl[:, 0, 1:], axis=-1, dtype=jnp.float32)
            dcol = jnp.sum(dfl[:, 1:, 0], axis=-1, dtype=jnp.float32)
            dfl = dfl[:, 1:, 1:]
        dg = dfl.reshape(f, h, w, h, w)
        s1 = jnp.einsum(
            "frcsd,rsk->fkcd", dg, jnp.asarray(eh, dfl.dtype),
            preferred_element_type=jnp.float32,
        )  # (F, 2h-1, w, w) fp32
        s2 = jnp.einsum(
            "fkcd,cdm->fkm", s1, jnp.asarray(ew),
            preferred_element_type=jnp.float32,
        )  # (F, 2h-1, 2w-1)
        if num_rel not in bmaps:
            b_np = np.zeros((m.size, num_rel), np.float32)
            b_np[np.arange(m.size), m.ravel()] = 1.0
            bmaps[num_rel] = b_np
        dcat = jnp.einsum(
            "fn,nb->bf", s2.reshape(f, m.size), jnp.asarray(bmaps[num_rel]),
            preferred_element_type=jnp.float32,
        )  # (num_rel, F)
        if bos:
            dcat = dcat.at[b_row].add(drow)
            dcat = dcat.at[b_col].add(dcol)
            dcat = dcat.at[b_corner].add(d00)
        dtable = dcat.reshape(num_rel, layers, heads).transpose(1, 0, 2)
        return (dtable,)

    fn.defvjp(fwd, bwd)
    return fn


def gather_grid_bias_all_layers(table, rp_bucket, grid_hw, bos=False,
                                dtype=jnp.float32):
    """gather_rel_bias_all_layers for 2-D grid buckets (optionally with a
    leading BOS/CLS slot), with the structure-aware backward above.  The
    expanded bias is emitted in ``dtype`` (exact — see _build_grid_gather);
    the table gradient stays fp32."""
    import hashlib

    rp = np.asarray(rp_bucket)
    h, w = grid_hw
    dtype = jnp.dtype(dtype)
    key = (h, w, bool(bos), dtype.name,
           hashlib.sha1(np.ascontiguousarray(rp).tobytes()).hexdigest())
    if key not in _GRID_GATHER_CACHE:
        _GRID_GATHER_CACHE[key] = _build_grid_gather(rp, h, w, bos, dtype)
    fn = _GRID_GATHER_CACHE[key]
    if fn is None:  # no delta structure: plain gather (scatter-add backward)
        return gather_rel_bias_all_layers(table, rp).astype(dtype)
    return fn(table)


def interp_grid_bias(bias, src_hw, dst_hw) -> jnp.ndarray:
    """Double-bilinear interpolation of a grid-pair bias.

    ``bias``: (heads, src_h*src_w, src_h*src_w) -> (heads, dh*dw, dh*dw),
    matching the reference's two F.interpolate passes over query-grid axes then
    key-grid axes (encoder_module.py:799-808).
    """
    sh, sw = src_hw
    dh, dw = dst_hw
    if (sh, sw) == (dh, dw):
        return bias
    ah = jnp.asarray(bilinear_matrix(sh, dh))
    aw = jnp.asarray(bilinear_matrix(sw, dw))
    return interp_grid_bias_mats(bias, ah, aw, src_hw)


def interp_grid_bias_mats(bias, ah, aw, src_hw) -> jnp.ndarray:
    """Matrix-parameterized grid-pair bias interpolation; ``ah`` (dh, sh) and
    ``aw`` (dw, sw) may be runtime (dynamic-valid) matrices from
    ops.resize.bilinear_matrix_dyn for the padded native-resolution eval path."""
    sh, sw = src_hw
    heads = bias.shape[0]
    b = bias.reshape(heads, sh, sw, sh, sw).astype(jnp.float32)
    b = jnp.einsum("Hi,hiwjv->hHwjv", ah, b)
    b = jnp.einsum("Wi,hHijv->hHWjv", aw, b)
    b = jnp.einsum("Ji,hHWiv->hHWJv", ah, b)
    b = jnp.einsum("Vi,hHWJi->hHWJV", aw, b)
    dh, dw = ah.shape[0], aw.shape[0]
    return b.reshape(heads, dh * dw, dh * dw)


def interp_seg_bias_with_bos(bias, src_hw, dst_hw) -> jnp.ndarray:
    """Seg-grid bias interpolation with the BOS slot handled as in the
    reference (decoder_module.py:601-627): the leading row/column pass through
    unresized along their own axis while the grid block is interpolated on both
    grid pairs.

    ``bias``: (heads, 1 + sh*sw, 1 + sh*sw) -> (heads, 1 + dh*dw, 1 + dh*dw).
    """
    sh, sw = src_hw
    dh, dw = dst_hw
    if (sh, sw) == (dh, dw):
        return bias
    ah = jnp.asarray(bilinear_matrix(sh, dh))
    aw = jnp.asarray(bilinear_matrix(sw, dw))
    return interp_seg_bias_with_bos_mats(bias, ah, aw, src_hw)


def interp_seg_bias_with_bos_mats(bias, ah, aw, src_hw) -> jnp.ndarray:
    """Matrix-parameterized variant of the seg-bias interpolation (runtime
    matrices allowed, see interp_grid_bias_mats)."""
    sh, sw = src_hw
    dh, dw = ah.shape[0], aw.shape[0]
    heads = bias.shape[0]

    def interp_flat(x, axis_shape):  # x: (heads, N, sh*sw) -> (heads, N, dh*dw)
        n = x.shape[1]
        x = x.reshape(heads, n, sh, sw).astype(jnp.float32)
        x = jnp.einsum("Hi,bniw->bnHw", ah, x)
        x = jnp.einsum("Wi,bnhi->bnhW", aw, x)
        return x.reshape(heads, n, dh * dw)

    bias = bias.astype(jnp.float32)
    bos_row = bias[:, :1, :]  # (H, 1, 1+shsw)
    grid_rows = bias[:, 1:, :]
    # interpolate along the *query* grid first: treat rows as the flattened grid
    grid_rows = jnp.swapaxes(
        interp_flat(jnp.swapaxes(grid_rows, 1, 2), (sh, sw)), 1, 2
    )  # (H, 1+shsw cols intact? no: rows now dh*dw)
    bias = jnp.concatenate([bos_row, grid_rows], axis=1)  # (H, 1+dhdw, 1+shsw)
    # then along the *key* grid
    bos_col = bias[:, :, :1]
    grid_cols = interp_flat(bias[:, :, 1:], (sh, sw))
    return jnp.concatenate([bos_col, grid_cols], axis=2)


def abs_pos_bias(pos_embed, q_kernel, q_bias, k_kernel, k_bias, num_heads, scaling):
    """q·kᵀ absolute-position bias.

    ``pos_embed``: (L, D) (batch-independent — position ids are identical across
    the batch in both encoder and surrogate decoder, so unlike the reference we
    compute one (heads, L, L) tensor and broadcast).
    Returns (heads, L_q, L_k) fp32.
    """
    return cross_abs_pos_bias(
        pos_embed, pos_embed, q_kernel, q_bias, k_kernel, k_bias, num_heads, scaling
    )


def cross_abs_pos_bias(
    tgt_pos_embed, src_pos_embed, q_kernel, q_bias, k_kernel, k_bias, num_heads, scaling
):
    """(heads, L_q, L_k) bias from separate query/key position embeddings."""
    lq, d = tgt_pos_embed.shape
    lk = src_pos_embed.shape[0]
    q = (tgt_pos_embed.astype(jnp.float32) @ q_kernel + q_bias) * scaling
    k = src_pos_embed.astype(jnp.float32) @ k_kernel + k_bias
    q = q.reshape(lq, num_heads, -1)
    k = k.reshape(lk, num_heads, -1)
    return jnp.einsum("qhd,khd->hqk", q, k)
