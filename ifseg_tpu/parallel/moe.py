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

    ``x`` enters sharded over the data axes only (the layout every
    surrounding op already uses), replicated across the expert axis; each
    expert-axis member slices its own 1/E of the resident rows by
    ``axis_index`` and all_gathers the results at the end.  Entering with a
    3-axis token sharding instead (the round-2 design) forced a GSPMD
    "involuntary full rematerialization" of every neighboring op between the
    [data,fsdp]-sharded graph and the 8-way layout.  Every worker still owns
    a token slice and one expert — the BASE layout (base_layer.py:27-29)."""
    n_exp = mesh.shape[expert_axis]

    def local_fn(centroids_l, wi_l, wo_l, x_rep):
        # x_rep: (n_rep, D) — this data shard's rows, replicated over the
        # expert axis; slice this member's share
        idx = jax.lax.axis_index(expert_axis)
        n_rep = x_rep.shape[0]
        # tail rows past n_local*n_exp would be sliced by NO expert member
        # and come back as silent zeros from the psum reassembly — fail
        # loudly instead (moe_ffn.py pads to a data*fsdp*E^2 multiple)
        assert n_rep % n_exp == 0, (
            f"{n_rep} resident rows not divisible by {n_exp} experts; pad "
            f"the token axis before base_moe_layer"
        )
        n_local = n_rep // n_exp
        x_l = jax.lax.dynamic_slice_in_dim(x_rep, idx * n_local, n_local, 0)
        # centroids_l: (1, D) local shard -> gather all for scoring
        centroids = jax.lax.all_gather(
            centroids_l, expert_axis, axis=0, tiled=True
        )  # (E, D)
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
        out_l = x_l + gate[:, None] * expert_out
        # reassemble the full data-shard block on every expert-axis member so
        # the output layout matches the input's (data-sharded, replicated).
        # psum of disjoint slices == all_gather, and unlike all_gather its
        # output is provably axis-invariant for shard_map's replication check
        buf = jnp.zeros((n_rep, out_l.shape[1]), out_l.dtype)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, out_l, idx * n_local, 0)
        return jax.lax.psum(buf, expert_axis)

    data_axes = tuple(a for a in data_axes if mesh.shape.get(a, 1) > 1)
    data_spec = P(data_axes if data_axes else None, None)
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
