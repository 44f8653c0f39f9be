"""Resize ops with PyTorch-matching semantics, formulated for the TPU MXU.

The reference uses three resize flavors we must match numerically:
  - ``F.interpolate(mode='bilinear', align_corners=False)`` (pos-embed & rel-bias
    interpolation, encoder_module.py:366/799-808, decoder_module.py:546/609-620)
  - ``mmseg.ops.resize(..., mode='bilinear', align_corners=False)`` (logit
    upsampling, seg_criterion.py:237-244) — same math as the above
  - ``torchvision.transforms.Resize(InterpolationMode.NEAREST)`` (GT and
    artificial-grid down/up-sampling, segmentation_dataset.py:165/191) — torch
    "legacy nearest": ``src = floor(dst * in/out)``

Bilinear resize along an axis is a fixed (out,in) sparse-banded matrix; we apply
it as a dense matmul (MXU) which XLA fuses with neighboring ops.  For separable
2-D resizes this is two einsums instead of gathers — far faster on TPU than a
gather-based formulation and bit-identical to torch in fp32.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def bilinear_matrix(in_size: int, out_size: int, align_corners: bool = False):
    """(out_size, in_size) fp32 interpolation matrix matching torch bilinear."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    out = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(out)
        else:
            src = out * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (out + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, None)  # torch clamps negative source coords to 0
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    w_hi = np.clip(src - lo, 0.0, 1.0)
    w_lo = 1.0 - w_hi
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), lo] += w_lo
    mat[np.arange(out_size), hi] += w_hi
    return mat.astype(np.float32)


@lru_cache(maxsize=None)
def nearest_indices(in_size: int, out_size: int):
    """torch legacy-nearest source indices: floor(dst * in/out)."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


def resize_bilinear(x, out_hw, h_axis=-3, w_axis=-2, align_corners=False):
    """Bilinear-resize two axes of ``x`` (default layout ``(..., H, W, C)``)."""
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = out_hw
    dt = x.dtype
    xf = x.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST  # fp32 MXU passes: resize feeds metric math
    if in_h != out_h:
        ah = jnp.asarray(bilinear_matrix(in_h, out_h, align_corners))
        xf = jnp.tensordot(ah, xf, axes=[[1], [h_axis]], precision=hi)
        xf = jnp.moveaxis(xf, 0, h_axis)
    if in_w != out_w:
        aw = jnp.asarray(bilinear_matrix(in_w, out_w, align_corners))
        xf = jnp.tensordot(aw, xf, axes=[[1], [w_axis]], precision=hi)
        xf = jnp.moveaxis(xf, 0, w_axis)
    return xf.astype(dt)


def bilinear_matrix_dyn(in_size: int, out_pad: int, out_valid, in_valid=None):
    """Device-side (out_pad, in_size) interpolation matrix whose *logical*
    output size ``out_valid`` (and optionally logical input size ``in_valid``)
    is a traced scalar — the key to native-resolution eval under one compiled
    shape per bucket (SURVEY.md §7 "ragged eval" hard part).

    Rows i >= out_valid are zero.  Matches torch bilinear
    ``align_corners=False`` semantics exactly for the valid region.
    """
    out_valid = jnp.asarray(out_valid, jnp.float32)
    in_v = in_size if in_valid is None else jnp.asarray(in_valid, jnp.float32)
    i = jnp.arange(out_pad, dtype=jnp.float32)
    src = jnp.maximum((i + 0.5) * (in_v / out_valid) - 0.5, 0.0)
    lo = jnp.clip(jnp.floor(src), 0, in_v - 1)
    hi = jnp.clip(lo + 1, 0, in_v - 1)
    w_hi = jnp.clip(src - lo, 0.0, 1.0)
    w_lo = 1.0 - w_hi
    j = jnp.arange(in_size, dtype=jnp.float32)
    mat = w_lo[:, None] * (j[None, :] == lo[:, None]) + w_hi[:, None] * (
        j[None, :] == hi[:, None]
    )
    return jnp.where(i[:, None] < out_valid, mat, 0.0)


def resize_nearest(x, out_hw, h_axis=-3, w_axis=-2):
    """Nearest-resize two axes of ``x`` with torch legacy-nearest semantics."""
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    out_h, out_w = out_hw
    ih = nearest_indices(x.shape[h_axis], out_h)
    iw = nearest_indices(x.shape[w_axis], out_w)
    x = jnp.take(x, jnp.asarray(ih), axis=h_axis)
    x = jnp.take(x, jnp.asarray(iw), axis=w_axis)
    return x


def resize_nearest_np(x: np.ndarray, out_hw, h_axis=-2, w_axis=-1) -> np.ndarray:
    """Numpy nearest-resize (host-side data pipeline), same semantics."""
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    out_h, out_w = out_hw
    ih = nearest_indices(x.shape[h_axis], out_h)
    iw = nearest_indices(x.shape[w_axis], out_w)
    x = np.take(x, ih, axis=h_axis)
    x = np.take(x, iw, axis=w_axis)
    return x
