"""GPipe pipeline parallelism on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh
from ifseg_tpu.parallel.pipeline import gpipe

pytestmark = [pytest.mark.slow, pytest.mark.mesh]


def test_gpipe_matches_sequential():
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=1, tensor_parallel=4))
    s = mesh.shape["model"]
    d = 8
    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (s, d, d)) * 0.5  # one linear per stage
    b = jax.random.normal(jax.random.PRNGKey(1), (s, d)) * 0.1

    def stage_fn(params, consts, bcast, x, mbrow, mb):
        wi, bi = params
        return jnp.tanh(x @ wi + bi)

    xs = jax.random.normal(jax.random.PRNGKey(2), (24, d))  # batch-major

    out = jax.jit(
        lambda p, x: gpipe(p, stage_fn, x, mesh, axis="model", chunks=6)
    )((w, b), xs)

    # sequential reference (rows are independent, layout is row-aligned)
    want = np.asarray(xs)
    for i in range(s):
        want = np.tanh(want @ np.asarray(w[i]) + np.asarray(b[i]))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_gpipe_gradients_flow():
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=1, tensor_parallel=4))
    s = mesh.shape["model"]
    d = 4
    w = jax.random.normal(jax.random.PRNGKey(0), (s, d, d)) * 0.5

    def stage_fn(wi, consts, bcast, x, mbrow, mb):
        return jnp.tanh(x @ wi)

    xs = jax.random.normal(jax.random.PRNGKey(1), (6, d))

    def loss(w):
        return jnp.sum(gpipe(w, stage_fn, xs, mesh, axis="model", chunks=3) ** 2)

    g = jax.jit(jax.grad(loss))(w)

    def loss_ref(w):
        y = xs
        for i in range(s):
            y = jnp.tanh(y @ w[i])
        return jnp.sum(y**2)

    g_ref = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def test_gpipe_mb_consts_and_multileaf_carry():
    """Per-microbatch constants are indexed locally by (tick - stage) and the
    multi-leaf carried pytree rotates through ONE packed ppermute."""
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=1, tensor_parallel=4))
    s = mesh.shape["model"]
    d = 6
    w = jax.random.normal(jax.random.PRNGKey(0), (s, d, d)) * 0.5
    bsz = 20
    xs = jax.random.normal(jax.random.PRNGKey(1), (bsz, d))
    ys = jax.random.normal(jax.random.PRNGKey(2), (bsz, d)).astype(jnp.bfloat16)
    # per-row additive constant every stage reads (never rotated)
    c = jax.random.normal(jax.random.PRNGKey(3), (bsz, d))

    def stage_fn(wi, consts, bcast, carry, mbrow, mb_idx):
        x, y = carry
        x = jnp.tanh(x @ wi + mbrow["c"])
        y = (y.astype(jnp.float32) + x).astype(jnp.bfloat16)
        return (x, y)

    out_x, out_y = jax.jit(
        lambda p, x, y, cc: gpipe(
            p, stage_fn, (x, y), mesh, axis="model", mb_consts={"c": cc},
            chunks=5,
        )
    )(w, xs, ys, c)

    want_x, want_y = np.asarray(xs), np.asarray(ys, np.float32)
    for i in range(s):
        want_x = np.tanh(want_x @ np.asarray(w[i]) + np.asarray(c))
        want_y = np.asarray(
            (jnp.asarray(want_y).astype(jnp.bfloat16).astype(jnp.float32) + want_x
             ).astype(jnp.bfloat16).astype(jnp.float32)
        )
    np.testing.assert_allclose(np.asarray(out_x), want_x, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_y, np.float32), want_y, atol=0.15, rtol=0.1
    )


def test_gpipe_rejects_nonfloat_carry():
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=1, tensor_parallel=4))
    s = mesh.shape["model"]
    w = jnp.zeros((s, 2, 2))

    def stage_fn(wi, consts, bcast, x, mbrow, mb):
        return x

    xs = jnp.zeros((4, 2), jnp.int32)
    try:
        gpipe(w, stage_fn, xs, mesh, axis="model", chunks=2)
    except AssertionError as e:
        assert "mb_consts" in str(e)
    else:
        raise AssertionError("int carry should be rejected")
