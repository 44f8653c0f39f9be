"""Parameter / batch sharding rules (GSPMD via NamedSharding).

Covers the reference's parallelism inventory (SURVEY §2.4) the TPU-native way:

  DP   — batch sharded over ('data', 'fsdp'); params replicated on 'data';
         XLA inserts the gradient psum (replaces DDP/TPUDistributedDataParallel)
  FSDP — params/optimizer additionally sharded over 'fsdp' on their largest
         axis; XLA turns the implied movement into all_gather (fwd/bwd) and
         reduce_scatter (grads) — the ZeRO-3 pattern of
         distributed/fully_sharded_data_parallel.py without a wrapper class
  TP   — Megatron column/row splits over 'model' for attention and FFN
         (analog of model_parallel/modules/multihead_attention.py):
         q/k/v and fc1 kernels column-split on the output dim, out_proj and
         fc2 row-split on the input dim, embeddings split on the feature dim

Rules are (substring-pattern, PartitionSpec) pairs matched against the
flattened parameter path; first match wins.  Everything unmatched replicates
(LayerNorms, biases, scalars), then the fsdp axis is layered on the largest
still-unsharded dimension if it divides evenly.
"""

import re
from typing import Any, List, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex on 'a/b/c' joined path, spec) — specs sized to param ndim at apply time
TP_RULES: List[Tuple[str, P]] = [
    # attention: column-parallel qkv (kernel (in, out) in flax), row-parallel out
    (r"self_attn/(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"encoder_attn/(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"self_attn/(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r"encoder_attn/(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r"self_attn/out_proj/kernel$", P("model", None)),
    (r"encoder_attn/out_proj/kernel$", P("model", None)),
    # FFN: column fc1, row fc2
    (r"ffn/fc1/kernel$", P(None, "model")),
    (r"ffn/fc1/bias$", P("model")),
    (r"ffn/fc2/kernel$", P("model", None)),
    # big embeddings: shard the vocab/row axis
    (r"embed_tokens/embedding$", P("model", None)),
    (r"image_proj/kernel$", P(None, "model")),
]

# BASE MoE experts: one expert per 'model'-axis device (models/moe_ffn.py;
# ref base_layer.py:27-29 expert params skip DP sync).  Applied independently
# of TP: a --moe-experts run must keep expert params on the model axis even
# though the shared (non-expert) params stay replicated there.
MOE_RULES: List[Tuple[str, P]] = [
    (r"moe/centroids$", P("model", None)),
    (r"moe/(wi|wo)$", P("model", None, None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _spec_for(
    path_str: str, shape, mesh: Mesh, use_tp: bool, use_fsdp: bool,
    use_moe: bool = True,
) -> P:
    spec = [None] * len(shape)
    if mesh.shape["model"] > 1:
        rules = (TP_RULES if use_tp else []) + (MOE_RULES if use_moe else [])
        for pat, rule in rules:
            if re.search(pat, path_str):
                for i, ax in enumerate(rule):
                    if i < len(spec) and ax is not None and shape[i] % mesh.shape["model"] == 0:
                        spec[i] = ax
                break
    if use_fsdp and mesh.shape["fsdp"] > 1 and len(shape) >= 2:
        # Shard the largest unsharded axis that divides evenly.  1-D params
        # (LayerNorm scales, biases) stay replicated: they are a negligible
        # fraction of the bytes, and fsdp-sharding e.g. an LN gamma over its
        # only (feature) axis makes the dgamma reduction in backward demand
        # the (B, L, E) activation resharded batch-major -> feature-major —
        # a transition the SPMD partitioner can only do by full
        # rematerialization (replicate + repartition).
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        if re.search(r"embedding$", path_str):
            # Gather tables (token/position/type embeddings) may only shard
            # the row axis: a feature-dim-sharded table makes every lookup
            # emerge feature-sharded, and feature-major -> batch-major is
            # another full-remat transition.  Odd row counts just replicate
            # (a few MB; not worth padding the vocab for).
            order = [0]
        for i in order:
            if spec[i] is None and shape[i] % mesh.shape["fsdp"] == 0 and shape[i] >= mesh.shape["fsdp"] * 8:
                spec[i] = "fsdp"
                break
    return P(*spec)


def param_shardings(params: Any, mesh: Mesh, use_tp=True, use_fsdp=True,
                    use_moe=True):
    """Pytree of NamedShardings matching ``params``.

    ``use_tp`` must be False when the 'model' axis is occupied by a shard_map
    strategy (CP/PP/MoE): those programs expect replicated non-expert params,
    and TP-sharded kernels would force a full resharding round-trip at every
    shard_map boundary (an XLA "involuntary full rematerialization")."""

    def shard_one(path, leaf):
        ps = _path_str(path)
        shape = np.shape(leaf)
        if len(shape) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(
            mesh, _spec_for(ps, shape, mesh, use_tp, use_fsdp, use_moe)
        )

    return jax.tree_util.tree_map_with_path(shard_one, params)


def shardings_for_plan(dist_cfg):
    """(use_tp, use_moe) for the run's distributed config: TP rules apply only
    when TP itself occupies the model axis; MoE expert rules whenever experts
    are active (they are shard_map-resident on the model axis by design)."""
    tp = max(getattr(dist_cfg, "tensor_parallel", 1), 1)
    moe = max(getattr(dist_cfg, "moe_experts", 0), 0)
    return tp > 1, moe > 1


def opt_state_shardings(opt_state: Any, mesh: Mesh, zero1: bool = False,
                        use_tp=True, use_fsdp=True, use_moe=True):
    """Shardings for optimizer-state leaves.  mu/nu trees mirror the param
    tree, and the param path is a suffix of the state path, so the SAME
    TP/FSDP rules apply — Adam moments land on the same axes as their
    params (a TP-sharded fc kernel gets TP-sharded moments, not replicas).
    With ``zero1`` they additionally shard over the data axis even when
    params are replicated (the ZeRO-1 / fairscale-OSS pattern)."""

    def shard_one(path, leaf):
        shape = np.shape(leaf)
        if len(shape) == 0:
            return NamedSharding(mesh, P())
        ps = _path_str(path)
        spec = list(_spec_for(ps, shape, mesh, use_tp, use_fsdp, use_moe))
        if zero1 and mesh.shape["data"] > 1:
            order = sorted(range(len(shape)), key=lambda i: -shape[i])
            for i in order:
                if spec[i] is None and shape[i] % mesh.shape["data"] == 0 and shape[i] >= mesh.shape["data"] * 8:
                    spec[i] = "data"
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(shard_one, opt_state)


def batch_sharding(mesh: Mesh):
    """Leading (batch) axis over both data axes."""
    def shard_one(leaf):
        nd = np.ndim(leaf)
        if nd == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(("data", "fsdp"), *([None] * (nd - 1))))

    return shard_one


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
