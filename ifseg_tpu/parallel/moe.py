"""Expert parallelism: BASE-style MoE layer over a mesh axis.

Capability parity with the reference's BASE layers
(custom_fairseq/fairseq/modules/base_layer.py + clib/libbase): one expert FFN
per device on the expert axis, balanced token->expert assignment, All2All
token routing, sigmoid-gated residual combine.

TPU-native shape: expert weights live stacked (E, ...) sharded over the mesh
axis; routing runs inside ``shard_map`` with ``jax.lax.all_to_all`` riding
ICI; the balanced assignment is the on-device Sinkhorn rounding by default
(ops/balanced_assignment.py; the exact C++ auction is available for parity
experiments via ``assignment='auction'``).

Each shard assigns its local tokens to all E experts with equal capacity
n_local/E, so the All2All exchanges equal-size chunks — no capacity overflow,
no dropped tokens (the BASE property).
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ifseg_tpu.ops.balanced_assignment import (
    balanced_assignment_auction,
    balanced_assignment_sinkhorn,
)


def init_moe_params(rng, num_experts: int, d_model: int, d_ff: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    scale = d_model**-0.5
    return {
        "centroids": jax.random.normal(k1, (num_experts, d_model)) * scale,
        "wi": jax.random.normal(k2, (num_experts, d_model, d_ff)) * scale,
        "wo": jax.random.normal(k3, (num_experts, d_ff, d_model)) * (d_ff**-0.5),
    }


def moe_param_shardings(mesh: Mesh, axis: str = "model"):
    return {
        "centroids": NamedSharding(mesh, P(axis, None)),
        "wi": NamedSharding(mesh, P(axis, None, None)),
        "wo": NamedSharding(mesh, P(axis, None, None)),
    }


def _expert_ffn(wi, wo, x):
    h = jax.nn.gelu(jnp.einsum("nd,df->nf", x, wi, preferred_element_type=jnp.float32))
    return jnp.einsum("nf,fd->nd", h.astype(x.dtype), wo, preferred_element_type=jnp.float32).astype(x.dtype)


def base_moe_layer(
    params,
    x,  # (tokens, D) globally; sharded over data axes
    mesh: Mesh,
    expert_axis: str = "model",
    data_axes=("data", "fsdp"),
    assignment: str = "sinkhorn",
):
    """x -> x + sigmoid(score) * expert(x), experts sharded on ``expert_axis``.

    Tokens are sharded over (*data_axes, expert_axis) jointly — the BASE
    layout where every worker owns both a token shard and one expert
    (base_layer.py:27-29: expert params excluded from DP grad sync)."""
    n_exp = mesh.shape[expert_axis]

    def local_fn(centroids_l, wi_l, wo_l, x_l):
        # centroids_l: (1, D) local shard -> gather all for scoring
        centroids = jax.lax.all_gather(
            centroids_l, expert_axis, axis=0, tiled=True
        )  # (E, D)
        n_local = x_l.shape[0]
        cap = n_local // n_exp
        scores = jnp.einsum(
            "nd,ed->ne", x_l.astype(jnp.float32), centroids.astype(jnp.float32)
        )
        if assignment == "auction":
            expert_of = balanced_assignment_auction(scores)
        else:
            expert_of = balanced_assignment_sinkhorn(scores)

        # sort local tokens by assigned expert -> (E, cap, D) chunks
        order = jnp.argsort(expert_of)
        x_sorted = x_l[order]
        chunks = x_sorted.reshape(n_exp, cap, -1)

        # All2All: chunk e goes to device e; receive one chunk per peer
        routed = jax.lax.all_to_all(
            chunks, expert_axis, split_axis=0, concat_axis=0, tiled=False
        )  # (E, cap, D): all tokens destined for the local expert
        routed_flat = routed.reshape(n_exp * cap, -1)
        out_flat = _expert_ffn(wi_l[0], wo_l[0], routed_flat)
        out_chunks = out_flat.reshape(n_exp, cap, -1)

        # route back and unsort
        back = jax.lax.all_to_all(
            out_chunks, expert_axis, split_axis=0, concat_axis=0, tiled=False
        ).reshape(n_local, -1)
        unsort = jnp.argsort(order)
        expert_out = back[unsort]

        gate = jax.nn.sigmoid(
            jnp.take_along_axis(scores, expert_of[:, None], axis=1)[:, 0]
        ).astype(x_l.dtype)
        return x_l + gate[:, None] * expert_out

    data_spec = P(tuple(data_axes) + (expert_axis,))
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(expert_axis, None),
            P(expert_axis, None, None),
            P(expert_axis, None, None),
            data_spec,
        ),
        out_specs=data_spec,
    )(params["centroids"], params["wi"], params["wo"], x)
