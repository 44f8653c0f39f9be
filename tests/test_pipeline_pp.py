"""GPipe pipeline parallelism on the CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh
from ifseg_tpu.parallel.pipeline import gpipe


def test_gpipe_matches_sequential():
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=1, tensor_parallel=4))
    s = mesh.shape["model"]
    d = 8
    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (s, d, d)) * 0.5  # one linear per stage
    b = jax.random.normal(jax.random.PRNGKey(1), (s, d)) * 0.1

    def stage_fn(params, consts, bcast, x):
        wi, bi = params
        return jnp.tanh(x @ wi + bi)

    m, mb = 6, 4
    xs = jax.random.normal(jax.random.PRNGKey(2), (m, mb, d))

    out = jax.jit(
        lambda p, x: gpipe(p, stage_fn, x, mesh, axis="model")
    )((w, b), xs)

    # sequential reference
    want = np.asarray(xs)
    for i in range(s):
        want = np.tanh(want @ np.asarray(w[i]) + np.asarray(b[i]))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_gpipe_gradients_flow():
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=1, tensor_parallel=4))
    s = mesh.shape["model"]
    d = 4
    w = jax.random.normal(jax.random.PRNGKey(0), (s, d, d)) * 0.5

    def stage_fn(wi, consts, bcast, x):
        return jnp.tanh(x @ wi)

    xs = jax.random.normal(jax.random.PRNGKey(1), (3, 2, d))

    def loss(w):
        return jnp.sum(gpipe(w, stage_fn, xs, mesh, axis="model") ** 2)

    g = jax.jit(jax.grad(loss))(w)

    def loss_ref(w):
        y = xs
        for i in range(s):
            y = jnp.tanh(y @ w[i])
        return jnp.sum(y**2)

    g_ref = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)
