"""Dense CRF post-processing (reference crf.py:11-37) — native C++ backend.

The reference depends on the external pydensecrf C++ package; here the same
algorithm (mean-field with permutohedral-lattice Gaussian + bilateral
pairwise potentials, symmetric normalization, Potts compatibility) is
implemented in csrc/{permutohedral.h,densecrf.cpp} and bound via ctypes.
Compiled on demand with g++ into ``ifseg_tpu/ops/_lib/libdensecrf.so``.

``rgb_dense_crf(image_bgr, probs, max_iter)`` matches the reference signature:
unary from softmax, PairwiseGaussian(sxy=1, compat=3),
PairwiseBilateral(sxy=67, srgb=3, compat=4).
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_LOCK = threading.Lock()
_LIB = None

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_DIR = os.path.join(os.path.dirname(__file__), "_lib")
_LIB_PATH = os.path.join(_LIB_DIR, "libdensecrf.so")


def _build() -> str:
    os.makedirs(_LIB_DIR, exist_ok=True)
    src = os.path.join(_CSRC, "densecrf.cpp")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-march=native", src, "-o", _LIB_PATH,
    ]
    logger.info("building densecrf: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            src = os.path.join(_CSRC, "densecrf.cpp")
            hdr = os.path.join(_CSRC, "permutohedral.h")
            stale = not os.path.exists(_LIB_PATH) or any(
                os.path.getmtime(p) > os.path.getmtime(_LIB_PATH)
                for p in (src, hdr)
                if os.path.exists(p)
            )
            if stale:
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.dense_crf_inference.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),  # image_bgr
                ctypes.POINTER(ctypes.c_float),  # probs
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # H W C
                ctypes.c_int,  # n_iter
                ctypes.c_float, ctypes.c_float,  # gauss sxy, compat
                ctypes.c_float, ctypes.c_float, ctypes.c_float,  # bi sxy srgb compat
                ctypes.POINTER(ctypes.c_float),  # out
            ]
            lib.dense_crf_inference.restype = None
            _LIB = lib
    return _LIB


def dense_crf(
    image_bgr: np.ndarray,
    probs: np.ndarray,
    n_iter: int = 10,
    sxy_gauss: float = 1.0,
    compat_gauss: float = 3.0,
    sxy_bilateral: float = 67.0,
    srgb_bilateral: float = 3.0,
    compat_bilateral: float = 4.0,
) -> np.ndarray:
    """probs: (H, W, C) softmax; image_bgr: (H, W, 3) uint8 -> refined (H, W, C)."""
    h, w, c = probs.shape
    assert image_bgr.shape == (h, w, 3), (image_bgr.shape, probs.shape)
    img = np.ascontiguousarray(image_bgr, np.uint8)
    p = np.ascontiguousarray(probs, np.float32)
    out = np.empty((h, w, c), np.float32)
    _lib().dense_crf_inference(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, c, n_iter,
        sxy_gauss, compat_gauss, sxy_bilateral, srgb_bilateral, compat_bilateral,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def rgb_dense_crf(image_bgr: np.ndarray, probs: np.ndarray, max_iter: int = 10):
    """Reference-signature wrapper (crf.py:19-37).  ``probs`` may be (C, H, W)
    like the reference (channel-first) or (H, W, C); returns the same layout."""
    channel_first = probs.ndim == 3 and probs.shape[0] < probs.shape[2]
    p = probs.transpose(1, 2, 0) if channel_first else probs
    out = dense_crf(image_bgr, p, n_iter=max_iter)
    return out.transpose(2, 0, 1) if channel_first else out
