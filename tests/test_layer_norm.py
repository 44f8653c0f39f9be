"""Fused LayerNorm op: flax parity (forward + gradients) and module drop-in."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ifseg_tpu.ops import layer_norm as lnmod
from ifseg_tpu.ops.layer_norm import LayerNorm, fused_layer_norm


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 24, 256)) * 3 + 1, jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(256,)) * 0.2 + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(256,)) * 0.1, jnp.float32)
    return x, scale, bias


def _flax_ref(x, scale, bias):
    ref = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
    return ref.apply({"params": {"scale": scale, "bias": bias}}, x)


def test_forward_matches_flax(data):
    x, scale, bias = data
    y = fused_layer_norm(x, scale, bias, 1e-5, jnp.dtype(jnp.float32))
    yr = _flax_ref(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-5)


def test_forward_pallas_path_matches_fallback(data, monkeypatch):
    # force the pallas path (interpret mode off-TPU) against the jnp math
    x, scale, bias = data
    yr = fused_layer_norm(x, scale, bias, 1e-5, jnp.dtype(jnp.float32))
    monkeypatch.setattr(lnmod, "_use_pallas", lambda n, d: True)
    import jax.experimental.pallas as pl  # noqa: F401 — interpret on CPU

    orig = lnmod.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(lnmod.pl, "pallas_call", interp_call)
    y = fused_layer_norm(x, scale, bias, 1e-5, jnp.dtype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-6)


def test_gradients_match_flax(data):
    x, scale, bias = data
    x32 = x.astype(jnp.float32)

    def loss_fused(x_, s_, b_):
        return jnp.sum(fused_layer_norm(x_, s_, b_, 1e-5, jnp.dtype(jnp.float32)) ** 2)

    def loss_ref(x_, s_, b_):
        return jnp.sum(_flax_ref(x_, s_, b_) ** 2)

    g = jax.grad(loss_fused, argnums=(0, 1, 2))(x32, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x32, scale, bias)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-3)


def test_module_param_names_match_flax(data):
    x, scale, bias = data
    m = LayerNorm(out_dtype=jnp.bfloat16)
    vs = m.init(jax.random.PRNGKey(0), x)
    assert set(vs["params"].keys()) == {"scale", "bias"}
    y = m.apply({"params": {"scale": scale, "bias": bias}}, x)
    assert y.dtype == jnp.bfloat16
    yr = _flax_ref(x, scale, bias).astype(jnp.bfloat16)
    # 1 bf16 ulp: the kernel rounds once (fp32 math -> bf16 out) vs the
    # reference's fp32 output rounded outside
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32), atol=4e-3
    )
