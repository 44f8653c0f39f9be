"""Lightweight / dynamic convolution modules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ifseg_tpu.models.lightconv import DynamicConv, LightConv


def _naive_lightconv(x, weight, num_heads, causal):
    b, l, c = x.shape
    h, k = weight.shape
    w = np.exp(weight - weight.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    out = np.zeros_like(x)
    for bi in range(b):
        for t in range(l):
            for ci in range(c):
                head = ci // (c // h)
                for ki in range(k):
                    src = t + ki - (k - 1) if causal else t + ki - (k - 1) // 2
                    if 0 <= src < l:
                        out[bi, t, ci] += w[head, ki] * x[bi, src, ci]
    return out


@pytest.mark.parametrize("causal", [False, True])
def test_lightconv_matches_naive(causal):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 8)).astype(np.float32)
    m = LightConv(kernel_size=3, num_heads=4, causal=causal)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(params, jnp.asarray(x))
    want = _naive_lightconv(x, np.asarray(params["params"]["weight"]), 4, causal)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_dynamicconv_shapes_and_causality():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 9, 8)), jnp.float32)
    m = DynamicConv(kernel_size=3, num_heads=2, causal=True)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == x.shape
    # causality: perturbing a later timestep leaves earlier outputs unchanged
    x2 = x.at[0, 6].add(1.0)
    out2 = m.apply(params, x2)
    np.testing.assert_allclose(
        np.asarray(out[0, :6]), np.asarray(out2[0, :6]), atol=1e-6
    )
    assert np.abs(np.asarray(out[0, 6:]) - np.asarray(out2[0, 6:])).max() > 0
