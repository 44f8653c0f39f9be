"""BASE-layer MoE FFN as a flax module (EP productization).

Replaces a transformer layer's dense FFN with one expert per device on the
'model' mesh axis (parallel/moe.py base_moe_layer; reference
modules/base_layer.py:14-135 + clib/libbase balanced assignment).  Expert
weights are stacked (E, ...) and sharded over the expert axis
(parallel/sharding.py MOE rule); tokens route through lax.all_to_all inside
shard_map, riding ICI.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ifseg_tpu.parallel.moe import base_moe_layer


class MoEFeedForward(nn.Module):
    embed_dim: int
    ffn_dim: int
    plan: "ParallelPlan"  # ifseg_tpu.parallel.plan.ParallelPlan
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        e = self.plan.moe_experts
        d, f = self.embed_dim, self.ffn_dim
        scale = d**-0.5
        params = {
            "centroids": self.param(
                "centroids", nn.initializers.normal(stddev=scale), (e, d), jnp.float32
            ),
            "wi": self.param(
                "wi", nn.initializers.normal(stddev=scale), (e, d, f), jnp.float32
            ),
            "wo": self.param(
                "wo", nn.initializers.normal(stddev=f**-0.5), (e, f, d), jnp.float32
            ),
        }
        b, l, _ = x.shape
        flat = x.reshape(b * l, d)
        # equal-capacity routing needs the per-shard token count divisible by
        # E: pad with zero rows (zero scores route harmlessly), slice after
        mesh = self.plan.mesh
        shards = mesh.shape["data"] * mesh.shape["fsdp"] * mesh.shape[self.plan.axis]
        mult = shards * e
        n = flat.shape[0]
        n_pad = (-n) % mult
        if n_pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((n_pad, d), flat.dtype)], axis=0
            )
        out = base_moe_layer(
            params,
            flat,
            mesh,
            expert_axis=self.plan.axis,
            assignment=self.plan.moe_assignment,
        )
        out = (out - flat)[:n]
        # base_moe_layer returns x + gate*expert(x); the transformer layer
        # adds its own residual, so return only the gated expert output
        return out.reshape(b, l, d).astype(self.dtype)
