"""Scalar + product quantization."""

import numpy as np

import jax
import jax.numpy as jnp

from ifseg_tpu.ops.quantization import (
    dequantize_tree,
    fake_quant,
    pq_dequantize,
    pq_quantize,
    quantize_tree_scalar,
    scalar_dequantize,
    scalar_quantize,
)


def test_scalar_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    q, s = scalar_quantize(w, bits=8, axis=(0,))
    wr = scalar_dequantize(q, s)
    rel = float(jnp.mean(jnp.abs(wr - w)) / jnp.mean(jnp.abs(w)))
    assert rel < 0.01
    q4, s4 = scalar_quantize(w, bits=4, axis=(0,))
    rel4 = float(jnp.mean(jnp.abs(scalar_dequantize(q4, s4) - w)) / jnp.mean(jnp.abs(w)))
    assert rel4 > rel  # fewer bits -> more error


def test_fake_quant_straight_through():
    w = jnp.asarray([[0.5, -0.3], [1.2, 0.01]], jnp.float32)
    g = jax.grad(lambda x: jnp.sum(fake_quant(x) * 2))(w)
    np.testing.assert_allclose(np.asarray(g), 2.0)


def test_pq_reconstruction():
    rng = np.random.default_rng(1)
    # clustered blocks -> PQ reconstructs well
    base = rng.normal(size=(16, 8))
    w = jnp.asarray(
        base[rng.integers(0, 16, size=512)] + 0.01 * rng.normal(size=(512, 8)),
        jnp.float32,
    ).reshape(64, 64)
    cb, codes, shape = pq_quantize(w, block_size=8, n_centroids=32, iters=10)
    wr = pq_dequantize(cb, codes, shape)
    rel = float(jnp.linalg.norm(wr - w) / jnp.linalg.norm(w))
    assert rel < 0.1, rel
    assert cb.shape == (32, 8)


def test_tree_quantization_report():
    params = {
        "big": jnp.ones((128, 64)),
        "small": jnp.ones((4,)),
    }
    tree, report = quantize_tree_scalar(params, min_size=1024)
    assert report["quantized"] == 1 and report["kept"] == 1
    assert report["bytes_quant"] < report["bytes_fp32"]
    back = dequantize_tree(tree)
    np.testing.assert_allclose(np.asarray(back["big"]), 1.0, atol=0.01)
    np.testing.assert_array_equal(np.asarray(back["small"]), 1.0)
