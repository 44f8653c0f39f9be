"""The IFSeg criterion as pure JAX functions (mirrors criterions/seg_criterion.py).

Semantics map (reference -> here):
  - ``upsample_logits`` (ref :237-244): logits grid (drop trailing eos slot)
    bilinearly upsampled 32x32 -> HxW.  Implemented as two MXU matmuls with the
    exact torch `align_corners=False` interpolation matrices, chunked over
    output rows so the (B, H, W, C) tensor never materializes (the reference
    materializes ~630MB for C=150; we stream it).
  - ``compute_imfree_loss`` (ref :246-267): CE over non-pad / non-unknown
    cells of the upsampled artificial-grid logits vs the nearest-upsampled
    category grid.  Targets here are raw class ids in [0, num_seg], so the
    reference's seg_id_offset shifting is gone.
  - ``compute_loss`` eval branch (ref :269-347): upsample to the target
    resolution, mask unknown, per-class confusion areas (ref :349-362).
  - label smoothing matches torch F.cross_entropy(label_smoothing=eps):
    loss = (1-eps) * nll + eps * mean_c(-log p_c).
  - ``init_seg_embeddings`` (ref :373-407): the lazy EmbeddingBag init as a
    pure params -> params function applied once after checkpoint restore.

All math in fp32 (reference casts logits .float() before the loss, :248/:275).
"""

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ifseg_tpu.ops.histogram import confusion_areas
from ifseg_tpu.ops.resize import bilinear_matrix


class LossOut(NamedTuple):
    loss_sum: jnp.ndarray  # scalar fp32
    count: jnp.ndarray  # scalar fp32 (valid cells)


def _ce_from_logits(logits, target, valid, label_smoothing: float) -> LossOut:
    """Summed CE over valid cells. logits (..., C) fp32, target int, valid bool.

    nll = logsumexp(z) - z[t], with z[t] read via a one-hot contraction: a
    ``take_along_axis`` gather over the minor (lane) axis lowers to a slow
    per-element path on TPU and dominated the whole training step (8x on the
    512px CE); the one-hot sum is a VPU-friendly fused multiply-reduce.
    Label smoothing uses the closed form mean_c(-log p_c) = lse - mean_c(z),
    so the full log-probability tensor is never materialized."""
    logits = logits.astype(jnp.float32)
    c = logits.shape[-1]
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.clip(target, 0, c - 1)
    zt = jnp.sum(logits * jax.nn.one_hot(tgt, c, dtype=jnp.float32), axis=-1)
    nll = lse - zt
    if label_smoothing > 0.0:
        smooth = lse - jnp.mean(logits, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    w = valid.astype(jnp.float32)
    return LossOut(jnp.sum(nll * w), jnp.sum(w))


def _grid_from_logits(logits, hw: Tuple[int, int]):
    """(B, 1+hw, C) decoder output -> (B, h, w, C) grid, eos slot dropped
    (ref upsample_logits takes logits[:, :-1], :238)."""
    h, w = hw
    grid = logits[:, : h * w, :]
    return grid.reshape(grid.shape[0], h, w, grid.shape[-1])


def _row_chunk_scan(grid, out_hw, row_chunks: int, body, chunk_dtype=None):
    """Shared driver: W-upsample once, scan chunks of output rows through
    ``body(chunk_logits, row_slice) -> carry update``.

    grid: (B, h, w, C).  Returns list of per-chunk outputs stacked by scan.
    ``chunk_dtype=bfloat16`` emits each chunk in bf16 (the convert fuses
    into the upsample matmul's epilogue, halving the chunk's HBM footprint;
    the CE reduces then read bf16 with fp32 accumulation — the reference
    feeds fp16 logits to F.cross_entropy, same precision class).
    """
    b, h, w, c = grid.shape
    H, W = out_hw
    aw = jnp.asarray(bilinear_matrix(w, W))  # (W, w)
    ah = jnp.asarray(bilinear_matrix(h, H))  # (H, h)
    assert H % row_chunks == 0, (H, row_chunks)
    rows = H // row_chunks
    ah_chunks = ah.reshape(row_chunks, rows, h)
    if chunk_dtype is not None:
        # bf16 operands for the upsample dots (fp32 accumulation): the K=32
        # contraction underuses the MXU, so the 4x bf16 rate is the lever —
        # and the reference upsamples fp16 logits (F.interpolate on half)
        grid = grid.astype(chunk_dtype)
        ah_chunks = ah_chunks.astype(chunk_dtype)
        aw = aw.astype(chunk_dtype)
    else:
        grid = grid.astype(jnp.float32)

    # rows-first per chunk: each chunk upsamples straight from the tiny
    # (B, h, w, C) grid — first the chunk's output rows (B, rows, w, C),
    # then the full width.  An earlier width-first layout hoisted a shared
    # (B, h, W, C) intermediate out of the scan (~630 MB fp32 at the
    # reference config); every chunk and every backward recompute re-read it
    # from HBM, ~40 ms/step of pure bandwidth for the same FLOPs.
    # remat: without it the scan's backward saves every chunk's (B, rows, W,
    # C) logits (~2.5GB at reference scale); recomputing each chunk from the
    # small grid keeps backward memory O(one chunk)
    @jax.checkpoint
    def chunk_step(carry, ah_c, i):
        t = jnp.einsum(
            "rk,bkjc->brjc", ah_c, grid, preferred_element_type=jnp.float32
        )  # (B, rows, w, C)
        chunk = jnp.einsum(
            "Wj,brjc->brWc", aw, t, preferred_element_type=jnp.float32
        )  # (B, rows, W, C)
        if chunk_dtype is not None:
            chunk = chunk.astype(chunk_dtype)
        return body(carry, chunk, i, rows)

    def scan_body(carry, xs):
        i, ah_c = xs
        return chunk_step(carry, ah_c, i), None

    init = body(None, None, None, rows)
    carry, _ = jax.lax.scan(
        scan_body, init, (jnp.arange(row_chunks), ah_chunks)
    )
    return carry


def upsampled_ce(
    grid_logits,  # (B, h, w, C) fp32
    target,  # (B, H, W) int32 class ids
    valid,  # (B, H, W) bool
    label_smoothing: float = 0.0,
    row_chunks: int = 8,
) -> LossOut:
    """CE against the bilinear upsample of ``grid_logits``, streamed by rows."""
    H, W = target.shape[1], target.shape[2]

    def body(carry, chunk, i, rows):
        if carry is None:  # init call
            return LossOut(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        sl = jax.lax.dynamic_slice_in_dim(target, i * rows, rows, axis=1)
        vl = jax.lax.dynamic_slice_in_dim(valid, i * rows, rows, axis=1)
        out = _ce_from_logits(chunk, sl, vl, label_smoothing)
        return LossOut(carry.loss_sum + out.loss_sum, carry.count + out.count)

    return _row_chunk_scan(
        grid_logits, (H, W), row_chunks, body, chunk_dtype=jnp.bfloat16
    )


def upsampled_areas(
    grid_logits,  # (B, h, w, C)
    target,  # (B, H, W)
    valid,  # (B, H, W) bool
    num_classes: int,
    row_chunks: int = 8,
):
    """Per-class confusion areas of argmax(upsampled logits) vs target."""
    H, W = target.shape[1], target.shape[2]
    zeros = lambda: jnp.zeros((num_classes,), jnp.float32)

    def body(carry, chunk, i, rows):
        if carry is None:
            return (zeros(), zeros(), zeros(), zeros())
        sl = jax.lax.dynamic_slice_in_dim(target, i * rows, rows, axis=1)
        vl = jax.lax.dynamic_slice_in_dim(valid, i * rows, rows, axis=1)
        pred = jnp.argmax(chunk, axis=-1)
        a = confusion_areas(pred, sl, num_classes, valid=vl)
        return tuple(c + x for c, x in zip(carry, a))

    return _row_chunk_scan(grid_logits, (H, W), row_chunks, body)


def compute_imfree_loss(
    aux_logits,  # (B, 1+hw, C) decoder output on the artificial image
    aux_target,  # (B, S, S) int32 class ids
    num_seg: int,
    patch_hw: Tuple[int, int],
    label_smoothing: float = 0.0,
    row_chunks: int = 8,
):
    """Image-free training loss (ref :246-267). Mean CE over non-unknown cells."""
    grid = _grid_from_logits(aux_logits, patch_hw)
    valid = aux_target != num_seg
    out = upsampled_ce(grid, aux_target, valid, label_smoothing, row_chunks)
    return out.loss_sum / jnp.maximum(out.count, 1.0)


def compute_monitor_outputs(
    logits,  # (B, 1+hw, C) decoder output on the real image
    target,  # (B, S, S) int32 (augmented gt class ids)
    downsampled_target,  # (B, hw) int32
    num_seg: int,
    patch_hw: Tuple[int, int],
    label_smoothing: float = 0.0,
    row_chunks: int = 8,
) -> Dict[str, jnp.ndarray]:
    """Train-split monitoring pass (ref compute_loss, :269-347): display loss
    + full-res and lowres confusion areas.  Caller wraps in stop_gradient."""
    grid = _grid_from_logits(logits, patch_hw)
    valid = target != num_seg
    out = upsampled_ce(grid, target, valid, label_smoothing, row_chunks)
    nll = out.loss_sum / jnp.maximum(out.count, 1.0)
    ai, ap, al, au = upsampled_areas(grid, target, valid, num_seg, row_chunks)

    h, w = patch_hw
    low_logits = grid.reshape(grid.shape[0], h * w, num_seg)
    low_pred = jnp.argmax(low_logits, axis=-1)
    low_valid = downsampled_target != num_seg
    lai, lap, lal, lau = confusion_areas(
        low_pred, downsampled_target, num_seg, valid=low_valid
    )
    return {
        "nll_loss": nll,
        "area_intersect": ai,
        "area_pred_label": ap,
        "area_label": al,
        "area_union": au,
        "area_intersect_lowres": lai,
        "area_pred_label_lowres": lap,
        "area_label_lowres": lal,
        "area_union_lowres": lau,
    }


def resnet_label_propagation(
    probs,  # (B, hw, C) softmax probabilities on the token grid
    resnet_feats,  # (B, hw, 1024) pre-projection ResNet features
    topk: int,
    iters: int,
):
    """ResNet-feature top-k cosine label propagation (ref :197-213): each cell's
    probability becomes the mean over its top-k most-cosine-similar cells,
    iterated; one matmul + gather per pass."""
    f = resnet_feats.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum("bld,bmd->blm", f, f, preferred_element_type=jnp.float32)
    _, topk_ind = jax.lax.top_k(sim, topk)  # (B, hw, k)

    def body(p, _):
        gathered = jnp.take_along_axis(
            p[:, None, :, :],
            topk_ind[:, :, :, None],
            axis=2,
        )  # (B, hw, k, C)
        return jnp.mean(gathered, axis=2), None

    probs, _ = jax.lax.scan(body, probs.astype(jnp.float32), None, length=iters)
    return probs


def class_mean_embeddings_np(embed_table, class_tokens, class_lengths):
    """Numpy twin of models/encoder.class_mean_embeddings for host-side init."""
    import numpy as np

    emb = np.take(np.asarray(embed_table), np.asarray(class_tokens), axis=0)
    t = class_tokens.shape[1]
    mask = (np.arange(t)[None, :] < np.asarray(class_lengths)[:, None]).astype(
        emb.dtype
    )
    summed = (emb * mask[:, :, None]).sum(axis=1)
    return summed / np.asarray(class_lengths)[:, None].astype(emb.dtype)


def init_seg_embeddings(params, class_tokens, class_lengths, num_seg: int):
    """Lazy seg-embedding initialization (ref _lazy_initialization :373-407):
    seg_embed_tokens <- per-class mean of category-word token embeddings.
    Pure function; apply once after checkpoint restore, before step 0.
    Only the first ``num_seg`` classes are used (no 'unknown' row, ref :160).
    """
    from ifseg_tpu.models.encoder import class_mean_embeddings

    table = params["embed_tokens"]["embedding"]
    avg = class_mean_embeddings(
        table, jnp.asarray(class_tokens[:num_seg]), jnp.asarray(class_lengths[:num_seg])
    ).astype(table.dtype)
    new = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    new["decoder"] = dict(new["decoder"])
    new["decoder"]["seg_embed_tokens"] = avg
    if "seg_projection" in new["decoder"]:
        new["decoder"]["seg_projection"] = avg
    return new
