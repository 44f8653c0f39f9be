"""Expert parallelism (BASE-style MoE) on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ifseg_tpu.ops.balanced_assignment import (
    balanced_assignment_auction,
    balanced_assignment_sinkhorn,
)
from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh
from ifseg_tpu.parallel.moe import base_moe_layer, init_moe_params, moe_param_shardings

pytestmark = [pytest.mark.slow, pytest.mark.mesh]


def test_auction_is_balanced_and_greedy_when_easy():
    rng = np.random.default_rng(0)
    n, e = 32, 4
    scores = rng.normal(size=(n, e)).astype(np.float32)
    out = np.asarray(balanced_assignment_auction(jnp.asarray(scores)))
    counts = np.bincount(out, minlength=e)
    np.testing.assert_array_equal(counts, np.full(e, n // e))
    # auction maximizes total score: compare against exhaustive greedy bound
    total = scores[np.arange(n), out].sum()
    # a balanced random assignment should be clearly worse
    rand = np.repeat(np.arange(e), n // e)
    rng.shuffle(rand)
    assert total >= scores[np.arange(n), rand].sum()


def test_sinkhorn_is_balanced():
    rng = np.random.default_rng(1)
    n, e = 64, 8
    scores = jnp.asarray(rng.normal(size=(n, e)).astype(np.float32))
    out = np.asarray(jax.jit(balanced_assignment_sinkhorn)(scores))
    counts = np.bincount(out, minlength=e)
    np.testing.assert_array_equal(counts, np.full(e, n // e))


def test_auction_beats_sinkhorn_or_ties():
    rng = np.random.default_rng(2)
    n, e = 64, 4
    scores = rng.normal(size=(n, e)).astype(np.float32)
    a = np.asarray(balanced_assignment_auction(jnp.asarray(scores)))
    s = np.asarray(balanced_assignment_sinkhorn(jnp.asarray(scores)))
    ta = scores[np.arange(n), a].sum()
    ts = scores[np.arange(n), s].sum()
    assert ta >= ts - 1e-3, (ta, ts)


def test_base_moe_layer_matches_unsharded():
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=1, tensor_parallel=4))
    n_exp = mesh.shape["model"]
    d, f = 16, 32
    tokens = 64  # across all devices

    params = init_moe_params(jax.random.PRNGKey(0), n_exp, d, f)
    params = jax.device_put(params, moe_param_shardings(mesh))
    # tokens enter data-sharded (replicated over the expert axis); each
    # expert-axis member slices its 1/E of the resident rows internally
    x = jax.random.normal(jax.random.PRNGKey(1), (tokens, d))
    x = jax.device_put(x, NamedSharding(mesh, P(("data", "fsdp"), None)))

    out = jax.jit(
        lambda p, xx: base_moe_layer(p, xx, mesh, assignment="sinkhorn")
    )(params, x)
    out = np.asarray(out)
    assert out.shape == (tokens, d)
    assert np.isfinite(out).all()

    # dense reference: recompute each shard's assignment+experts without
    # sharding; shard-local routing means per-shard assignment over its own
    # 8 tokens
    cents = np.asarray(params["centroids"])
    wi = np.asarray(params["wi"])
    wo = np.asarray(params["wo"])
    xh = np.asarray(x)
    n_shards = mesh.devices.size
    per = tokens // n_shards
    want = np.empty_like(xh)
    for s in range(n_shards):
        xs = xh[s * per : (s + 1) * per]
        scores = xs @ cents.T
        assign = np.asarray(balanced_assignment_sinkhorn(jnp.asarray(scores)))
        for i in range(per):
            e = assign[i]
            h = np.asarray(jax.nn.gelu(xs[i] @ wi[e]))
            eo = h @ wo[e]
            gate = 1.0 / (1.0 + np.exp(-scores[i, e]))
            want[s * per + i] = xs[i] + gate * eo
    np.testing.assert_allclose(out, want, atol=1e-4, rtol=1e-4)


def test_sinkhorn_rounding_adversarial_all_prefer_one_expert():
    """Worst case for the round-based rounding: every token prefers expert 0,
    forcing one expert to fill per round — must still terminate with exact
    balance within the E+1 round bound."""
    rng = np.random.default_rng(3)
    n, e = 64, 8
    scores = rng.normal(size=(n, e)).astype(np.float32) * 0.01
    scores[:, 0] += 100.0  # everyone wants expert 0
    scores[:, 1] += 50.0   # then expert 1, etc.
    scores[:, 2] += 25.0
    out = np.asarray(jax.jit(balanced_assignment_sinkhorn)(jnp.asarray(scores)))
    counts = np.bincount(out, minlength=e)
    assert (counts == n // e).all(), counts
    assert (out >= 0).all()
