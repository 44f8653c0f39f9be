"""Fused Pallas attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ifseg_tpu.ops.flash_attention as fa


@pytest.fixture(autouse=True)
def force_interpret():
    old = fa.INTERPRET
    fa.INTERPRET = True
    yield
    fa.INTERPRET = old


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("lq,lk", [(64, 64), (80, 100)])
def test_matches_xla(causal, lq, lk):
    b, h, d = 2, 2, 16
    q = _rand((b, h, lq, d), 0)
    k = _rand((b, h, lk, d), 1)
    v = _rand((b, h, lk, d), 2)
    bias = _rand((h, lq, lk), 3)
    mask = np.zeros((b, lk), bool)
    mask[0, lk - 7 :] = True
    mask = jnp.asarray(mask)

    got = fa.flash_attention_bias(q, k, v, bias, mask, causal)
    want = fa._attention_xla(q, k, v, bias, mask, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_no_bias_no_mask():
    b, h, l, d = 1, 2, 96, 16
    q, k, v = _rand((b, h, l, d), 0), _rand((b, h, l, d), 1), _rand((b, h, l, d), 2)
    got = fa.flash_attention_bias(q, k, v, None, None, False)
    want = fa._attention_xla(q, k, v, None, None, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_gradients_flow():
    b, h, l, d = 1, 2, 64, 16
    q, k, v = _rand((b, h, l, d), 0), _rand((b, h, l, d), 1), _rand((b, h, l, d), 2)
    bias = _rand((h, l, l), 3)

    def loss_flash(q, k, v, bias):
        return jnp.sum(fa.flash_attention_bias(q, k, v, bias, None, False) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(fa._attention_xla(q, k, v, bias, None, False) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_with_mask_and_causal(causal):
    b, h, lq, lk, d = 2, 2, 80, 100, 16
    q, k, v = _rand((b, h, lq, d), 0), _rand((b, h, lk, d), 1), _rand((b, h, lk, d), 2)
    bias = _rand((h, lq, lk), 3)
    mask = np.zeros((b, lk), bool)
    mask[0, lk - 9 :] = True
    mask = jnp.asarray(mask)

    def loss_flash(q, k, v, bias):
        return jnp.sum(fa.flash_attention_bias(q, k, v, bias, mask, causal) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(fa._attention_xla(q, k, v, bias, mask, causal) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_ragged_lq(causal):
    """Lq=85 is not a multiple of any legal q-block: the Pallas backward
    zero-pads q/do/bias to the block multiple (88) in its wrapper and slices
    dq/dbias back.  Covers the padded-tail path the 1025-token decoder
    surrogate hits at 512px (see _flash_backward)."""
    b, h, lq, lk, d = 2, 2, 85, 100, 16
    q, k, v = _rand((b, h, lq, d), 0), _rand((b, h, lk, d), 1), _rand((b, h, lk, d), 2)
    bias = _rand((h, lq, lk), 3)
    mask = np.zeros((b, lk), bool)
    mask[0, lk - 9 :] = True
    mask = jnp.asarray(mask)
    assert fa._pick_bq(lq, lk, 1, bufs=7, prefer_large=True) != lq  # exercises padding

    def loss_flash(q, k, v, bias):
        return jnp.sum(fa.flash_attention_bias(q, k, v, bias, mask, causal) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(fa._attention_xla(q, k, v, bias, mask, causal) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4)

    to3 = lambda t, ln: t.transpose(0, 2, 1, 3).reshape(b, ln, h * d)

    def loss_packed(q3, k3, v3, bias):
        return jnp.sum(
            fa.flash_attention_bias_packed(q3, k3, v3, bias, mask, causal, h) ** 2
        )

    gp = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(
        to3(q, lq), to3(k, lk), to3(v, lk), bias
    )
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(to3(gx[0], lq)), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(to3(gx[1], lk)), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gp[2]), np.asarray(to3(gx[2], lk)), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gp[3]), np.asarray(gx[3]), atol=2e-4, rtol=2e-4)


def test_pallas_backward_impl_matches_xla():
    old = fa.BACKWARD_IMPL
    try:
        b, h, l, d = 1, 2, 64, 16
        q, k, v = _rand((b, h, l, d), 0), _rand((b, h, l, d), 1), _rand((b, h, l, d), 2)
        bias = _rand((h, l, l), 3)

        def loss(q, k, v, bias):
            return jnp.sum(fa.flash_attention_bias(q, k, v, bias, None, False) ** 2)

        fa.BACKWARD_IMPL = "pallas"
        gp = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
        fa.BACKWARD_IMPL = "xla"
        gx = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4
            )
    finally:
        fa.BACKWARD_IMPL = old


@pytest.mark.parametrize("causal", [False, True])
def test_packed_matches_legacy(causal):
    """Packed (B, L, H*D) layout == legacy (B, H, L, D) layout, fwd + grads
    (the packed path is the model default: no HBM head transposes)."""
    b, h, lq, lk, d = 2, 4, 72, 72, 16
    q = _rand((b, h, lq, d), 0)
    k = _rand((b, h, lk, d), 1)
    v = _rand((b, h, lk, d), 2)
    bias = _rand((h, lq, lk), 3)
    mask = np.zeros((b, lk), bool)
    mask[0, lk - 5:] = True
    mask = jnp.asarray(mask)
    to3 = lambda t: t.transpose(0, 2, 1, 3).reshape(b, t.shape[2], h * d)

    ref = fa.flash_attention_bias(q, k, v, bias, mask, causal)
    got = fa.flash_attention_bias_packed(
        to3(q), to3(k), to3(v), bias, mask, causal, h
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(to3(ref)), atol=2e-5, rtol=2e-5
    )

    def loss4(q, k, v, bias):
        return jnp.sum(fa.flash_attention_bias(q, k, v, bias, mask, causal) ** 2)

    def loss3(q, k, v, bias):
        return jnp.sum(
            fa.flash_attention_bias_packed(q, k, v, bias, mask, causal, h) ** 2
        )

    g4 = jax.grad(loss4, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g3 = jax.grad(loss3, argnums=(0, 1, 2, 3))(to3(q), to3(k), to3(v), bias)
    np.testing.assert_allclose(np.asarray(g3[0]), np.asarray(to3(g4[0])), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g3[1]), np.asarray(to3(g4[1])), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g3[2]), np.asarray(to3(g4[2])), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g3[3]), np.asarray(g4[3]), atol=2e-4, rtol=2e-4)


def test_packed_xla_backward_fallback():
    """BACKWARD_IMPL=xla reshapes packed operands to the legacy layout."""
    old = fa.BACKWARD_IMPL
    try:
        b, h, l, d = 1, 2, 64, 16
        q3 = _rand((b, l, h * d), 0)
        k3 = _rand((b, l, h * d), 1)
        v3 = _rand((b, l, h * d), 2)
        bias = _rand((h, l, l), 3)

        def loss(q, k, v, bias):
            return jnp.sum(
                fa.flash_attention_bias_packed(q, k, v, bias, None, False, h) ** 2
            )

        fa.BACKWARD_IMPL = "pallas"
        gp = jax.grad(loss, argnums=(0, 1, 2, 3))(q3, k3, v3, bias)
        fa.BACKWARD_IMPL = "xla"
        gx = jax.grad(loss, argnums=(0, 1, 2, 3))(q3, k3, v3, bias)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4
            )
    finally:
        fa.BACKWARD_IMPL = old


def test_bf16_bias_grads():
    """bf16 bias (the train-path pack dtype under bf16 compute): dbias comes
    back bf16 but must be accumulated over batch in fp32 scratch.  Each
    Pallas gradient is checked against a full-fp32 dense reference with a
    *scale-relative* bound: bf16 operand rounding alone costs ~1% of the
    gradient's magnitude (the XLA-fallback backward on the same bf16
    operands sits at ~0.5%), while a bf16 batch accumulation of dbias
    (B=16 summands at 8 mantissa bits) would blow well past the bound."""
    old = fa.BACKWARD_IMPL
    try:
        b, h, lq, lk, d = 16, 2, 64, 80, 16
        q = _rand((b, h, lq, d), 0).astype(jnp.bfloat16)
        k = _rand((b, h, lk, d), 1).astype(jnp.bfloat16)
        v = _rand((b, h, lk, d), 2).astype(jnp.bfloat16)
        bias = _rand((h, lq, lk), 3).astype(jnp.bfloat16)

        out = fa.flash_attention_bias(q, k, v, bias, None, False)
        assert out.dtype == jnp.bfloat16

        def loss(q, k, v, bias):
            return jnp.sum(
                fa.flash_attention_bias(q, k, v, bias, None, False).astype(
                    jnp.float32
                )
                ** 2
            )

        fa.BACKWARD_IMPL = "pallas"
        gp = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
        assert gp[3].dtype == jnp.bfloat16

        def loss32(q, k, v, bias):
            return jnp.sum(fa._attention_xla(q, k, v, bias, None, False) ** 2)

        gr = jax.grad(loss32, argnums=(0, 1, 2, 3))(
            *(x.astype(jnp.float32) for x in (q, k, v, bias))
        )
        for name, a, r in zip(("dq", "dk", "dv", "dbias"), gp, gr):
            a = np.asarray(a, np.float32)
            r = np.asarray(r, np.float32)
            rel = np.abs(a - r).max() / np.abs(r).max()
            assert rel < 2.5e-2, f"{name}: rel err {rel:.4f} vs fp32 reference"
    finally:
        fa.BACKWARD_IMPL = old

@pytest.mark.parametrize("causal", [False, True])
def test_xla_stats_backward_matches(causal):
    """BACKWARD_IMPL=xla_stats (five plain einsums from the saved out/lse —
    the FLOP-optimal backward) == the pallas kernels, both layouts, with a
    key-padding mask, a ragged Lq, and a bf16 bias."""
    old = fa.BACKWARD_IMPL
    try:
        b, h, lq, lk, d = 2, 4, 72, 80, 16
        q = _rand((b, h, lq, d), 0)
        k = _rand((b, h, lk, d), 1)
        v = _rand((b, h, lk, d), 2)
        bias = _rand((h, lq, lk), 3)
        mask = np.zeros((b, lk), bool)
        mask[0, lk - 5:] = True
        mask = jnp.asarray(mask)

        def loss(q, k, v, bias):
            return jnp.sum(fa.flash_attention_bias(q, k, v, bias, mask, causal) ** 2)

        fa.BACKWARD_IMPL = "pallas"
        gp = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
        fa.BACKWARD_IMPL = "xla_stats"
        gs = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b_ in zip(("dq", "dk", "dv", "dbias"), gs, gp):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4,
                err_msg=name,
            )

        to3 = lambda t: t.transpose(0, 2, 1, 3).reshape(b, t.shape[2], h * d)
        bias16 = bias.astype(jnp.bfloat16)

        def loss3(q3, k3, v3, bias):
            return jnp.sum(
                fa.flash_attention_bias_packed(
                    q3, k3, v3, bias, mask, causal, h
                ).astype(jnp.float32) ** 2
            )

        args3 = (to3(q).astype(jnp.bfloat16), to3(k).astype(jnp.bfloat16),
                 to3(v).astype(jnp.bfloat16), bias16)
        fa.BACKWARD_IMPL = "pallas"
        gp3 = jax.grad(loss3, argnums=(0, 1, 2, 3))(*args3)
        fa.BACKWARD_IMPL = "xla_stats"
        gs3 = jax.grad(loss3, argnums=(0, 1, 2, 3))(*args3)
        assert gs3[3].dtype == jnp.bfloat16
        for name, a, b_ in zip(("dq", "dk", "dv", "dbias"), gs3, gp3):
            a = np.asarray(a, np.float32)
            r = np.asarray(b_, np.float32)
            rel = np.abs(a - r).max() / max(np.abs(r).max(), 1e-6)
            assert rel < 2.5e-2, f"packed bf16 {name}: rel err {rel:.4f}"
    finally:
        fa.BACKWARD_IMPL = old
