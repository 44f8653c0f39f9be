"""Weight quantization: scalar int8 and iterative product quantization.

Capability parity with the reference's optional quantization stack
(custom_fairseq/fairseq/quantization_utils.py + modules/quantization/{scalar,
pq}): post-training scalar quantization with per-channel scales, fake-quant
(straight-through) for QAT, and product quantization via k-means codebooks
over weight sub-vectors ("iPQ").  All pure jnp; k-means runs as a lax.scan.
"""

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def scalar_quantize(w, bits: int = 8, axis: Optional[int] = None):
    """Symmetric absmax quantization. Returns (int codes, fp32 scale)."""
    qmax = 2 ** (bits - 1) - 1
    if axis is None:
        scale = jnp.max(jnp.abs(w)) / qmax
    else:
        scale = jnp.max(jnp.abs(w), axis=axis, keepdims=True) / qmax
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -qmax - 1, qmax)
    dtype = jnp.int8 if bits <= 8 else jnp.int16
    return q.astype(dtype), scale.astype(jnp.float32)


def scalar_dequantize(q, scale):
    return q.astype(jnp.float32) * scale


@jax.custom_vjp
def fake_quant(w, bits: int = 8):
    """Quantize-dequantize with straight-through gradients (scalar QAT,
    modules/quantization/scalar)."""
    q, s = scalar_quantize(w, bits)
    return scalar_dequantize(q, s)


def _fq_fwd(w, bits):
    return fake_quant(w, bits), None


def _fq_bwd(res, g):
    return g, None


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def _kmeans(x, k: int, iters: int, rng):
    """x: (n, d) -> (centroids (k, d), assignments (n,))."""
    n = x.shape[0]
    idx = jax.random.choice(rng, n, shape=(k,), replace=n < k)
    cents = x[idx]

    def step(cents, _):
        d2 = (
            jnp.sum(x**2, 1, keepdims=True)
            - 2 * x @ cents.T
            + jnp.sum(cents**2, 1)[None, :]
        )
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # (n, k)
        counts = jnp.maximum(onehot.sum(0), 1.0)
        new = (onehot.T @ x) / counts[:, None]
        # keep old centroid where a cluster went empty
        new = jnp.where((onehot.sum(0) > 0)[:, None], new, cents)
        return new, None

    cents, _ = jax.lax.scan(step, cents, None, length=iters)
    d2 = (
        jnp.sum(x**2, 1, keepdims=True)
        - 2 * x @ cents.T
        + jnp.sum(cents**2, 1)[None, :]
    )
    return cents, jnp.argmin(d2, axis=1).astype(jnp.int32)


def pq_quantize(
    w,  # (out, in) weight
    block_size: int = 8,
    n_centroids: int = 256,
    iters: int = 15,
    rng=None,
):
    """Product quantization: rows split into in/block sub-vectors, one shared
    k-means codebook (modules/quantization/pq).  Returns (codebook (k, block),
    codes (out * in/block,), shape)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    out_f, in_f = w.shape
    assert in_f % block_size == 0, (in_f, block_size)
    blocks = w.reshape(out_f * (in_f // block_size), block_size).astype(jnp.float32)
    cents, codes = _kmeans(blocks, n_centroids, iters, rng)
    return cents, codes, w.shape


def pq_dequantize(codebook, codes, shape):
    return jnp.take(codebook, codes, axis=0).reshape(shape)


def quantize_tree_scalar(params: Any, bits: int = 8, min_size: int = 4096):
    """Quantize every large leaf; returns (quantized tree, metadata, report).

    Small leaves (LayerNorms, biases) stay fp32, matching the reference's
    layer-selection configs (quantization_utils.py:entry via config)."""
    report = {"quantized": 0, "kept": 0, "bytes_fp32": 0, "bytes_quant": 0}

    def one(leaf):
        import numpy as np

        size = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        report["bytes_fp32"] += size * 4
        if size >= min_size and leaf.ndim >= 2:
            q, s = scalar_quantize(leaf, bits, axis=tuple(range(leaf.ndim - 1)))
            report["quantized"] += 1
            report["bytes_quant"] += size + int(np.prod(s.shape)) * 4
            return {"q": q, "scale": s}
        report["kept"] += 1
        report["bytes_quant"] += size * 4
        return leaf

    tree = jax.tree_util.tree_map(one, params)
    return tree, report


def _is_quant_node(x) -> bool:
    # structural marker (keys only), so the check stays STATIC when the tree
    # flows through jit — a bool value inside the tree would become a tracer
    # and poison `if`
    return isinstance(x, dict) and set(x.keys()) == {"q", "scale"}


def dequantize_tree(tree: Any):
    """Inverse of quantize_tree_scalar; safe to call inside jit (the serving
    path dequantizes weights on the fly so only int8 bytes stream from HBM)."""

    def one(leaf):
        if _is_quant_node(leaf):
            return scalar_dequantize(leaf["q"], leaf["scale"])
        return leaf

    return jax.tree_util.tree_map(one, tree, is_leaf=_is_quant_node)
