"""Exhaustive bf16 verification of the polynomial gelu (ops/gelu.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ifseg_tpu.ops.gelu import gelu_poly


def _all_finite_bf16_as_f32():
    bits = np.arange(65536, dtype=np.uint32) << 16
    f32 = bits.view(np.float32)
    return f32[np.isfinite(f32)]


def _to_bf16_bits(a):
    """bf16 bit patterns remapped to a sign-monotone integer key so that
    |key(a) - key(b)| is the ulp distance even across the +/-0 boundary."""
    a32 = np.asarray(a, np.float32)
    b = a32.view(np.uint32)
    bits = (((b + 0x7FFF + ((b >> 16) & 1)) & 0xFFFF0000) >> 16).astype(np.int64)
    neg = (bits & 0x8000) != 0
    return np.where(neg, 0x8000 - (bits & 0x7FFF), 0x8000 + bits)


def test_poly_never_worse_than_f32_erf_formula_all_bf16():
    """Over ALL finite bf16 inputs, the poly's bf16 output is at least as
    close to the cancellation-free float64 reference as the f32 1+erf
    formula's output (modulo 1 ulp of tie-breaking)."""
    x32 = _all_finite_bf16_as_f32()
    x64 = x32.astype(np.float64)
    ref = 0.5 * x64 * np.vectorize(math.erfc)(-x64 / math.sqrt(2))
    ref_bits = _to_bf16_bits(ref)

    poly = np.asarray(gelu_poly(jnp.asarray(x32)), np.float32)
    cur = (
        np.float32(0.5)
        * x32
        * (np.float32(1.0) + np.vectorize(math.erf)(x64 / math.sqrt(2)).astype(np.float32))
    )
    d_poly = np.abs(_to_bf16_bits(poly) - ref_bits)
    d_cur = np.abs(_to_bf16_bits(cur) - ref_bits)
    # exclude outputs below f32 min-normal: XLA (and the TPU VPU) flush
    # subnormals to zero, the numpy reference doesn't — an environment
    # artifact, not an algorithmic difference
    # 2x margin: at |ref| == tiny exactly, a 1e-7 relative wiggle in the poly
    # crosses into the flushed-subnormal range
    normal = (np.abs(ref) >= 2 * np.finfo(np.float32).tiny) | (ref == 0.0)
    assert np.all(d_poly[normal] <= d_cur[normal] + 1), (
        f"poly worse than erf formula at {np.sum(d_poly[normal] > d_cur[normal] + 1)} inputs"
    )
    # in the (sub)tiny output region anything the poly produces is within a
    # hair of zero — flushed or a borderline normal
    assert np.all(np.abs(poly[~normal]) <= 4 * np.finfo(np.float32).tiny)
    # and the two agree within 1 ulp wherever the current formula is sane
    sane = (d_cur <= 1) & normal
    assert np.all(np.abs(_to_bf16_bits(poly)[sane] - _to_bf16_bits(cur)[sane]) <= 1)


def test_poly_bf16_roundtrip_matches_model_usage():
    # the model calls gelu_poly on bf16 activations
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1024,)) * 3, jnp.bfloat16)
    y = gelu_poly(x)
    assert y.dtype == jnp.bfloat16
    ref = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32), atol=0.016
    )


def test_poly_gradient_close_to_erf_gelu():
    x = jnp.linspace(-6.0, 3.0, 2001, dtype=jnp.float32)
    g_poly = jax.vmap(jax.grad(lambda v: gelu_poly(v)))(x)
    g_ref = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x)
    # the piecewise fit targets VALUE accuracy; its derivative deviates most
    # at the branch seams (up to ~0.02) — far below bf16 gradient noise
    err = np.abs(np.asarray(g_poly) - np.asarray(g_ref))
    assert err.max() < 0.03, err.max()
    assert err.mean() < 1e-3, err.mean()


def test_poly_edge_cases():
    x = jnp.asarray([np.inf, -np.inf, np.nan, 0.0, -0.0, 100.0, -100.0], jnp.float32)
    y = np.asarray(gelu_poly(x), np.float32)
    assert y[0] == np.inf
    assert y[1] == 0.0 and np.signbit(y[1])
    assert np.isnan(y[2])
    assert y[3] == 0.0 and y[4] == 0.0
    assert y[5] == 100.0
    assert y[6] == 0.0
