"""Ring attention (context parallelism) vs dense attention."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ifseg_tpu.parallel.context import ring_attention
from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh


def dense(q, k, v, bias):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias[None]
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_ring_attention_matches_dense():
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=1, tensor_parallel=4))
    b, h, l, d = 2, 3, 32, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, l, l)), jnp.float32)

    sh = NamedSharding(mesh, P(None, None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    out = jax.jit(lambda a, b_, c, e: ring_attention(a, b_, c, e, mesh))(
        qs, ks, vs, bias
    )
    want = dense(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_ring_attention_no_bias():
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=1, tensor_parallel=4))
    b, h, l, d = 1, 2, 16, 4
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    out = jax.jit(lambda a, b_, c: ring_attention(a, b_, c, None, mesh))(q, k, v)
    want = dense(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
