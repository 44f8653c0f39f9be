"""Pipeline parallelism: GPipe-style stage execution over a mesh axis.

Capability parity with the reference's PipelineParallelTransformerModel
(model_parallel/models/pipeline_parallel_transformer/model.py:49-79 — torch
`Pipe` with balance/devices/chunks), built the TPU-native way: stage
parameters stacked (S, ...) and sharded over the pipeline axis, a
``shard_map`` body where each device runs its resident stage, and
``lax.ppermute`` rotating activations around the ring.  The classic GPipe
schedule: T = microbatches + stages - 1 ticks, bubble at both ends.

The payload is an arbitrary pytree (activations + whatever must travel with
each microbatch, e.g. padding masks or encoder context for cross-attention);
per-stage constants (e.g. the per-layer attention biases of the resident
layers) are sharded over the pipeline axis alongside the parameters, and
broadcast constants reach every stage replicated.  Gradients flow through
ppermute, so the same function trains under ``jax.grad``.
"""

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gpipe(
    stage_params: Any,  # pytree, leaves (S, ...), sharded over `axis`
    stage_fn: Callable,  # (params_1stage, consts_1stage, bcast, payload) -> payload
    microbatches: Any,  # pytree, leaves (M, mb, ...); mb sharded over data_axes
    mesh: Mesh,
    axis: str = "model",
    stage_consts: Any = None,  # pytree, leaves (S, ...), sharded over `axis`
    bcast: Any = None,  # pytree, replicated, passed to every stage call
    data_axes: tuple = ("data", "fsdp"),
):
    """Returns the payload pytree, same sharding as ``microbatches``.

    Payload leaves of rank >= 2 keep their per-microbatch batch dim (dim 1)
    sharded over ``data_axes`` so DP composes with PP (each data shard
    pipelines its own rows); rank-1 leaves (e.g. microbatch counters)
    replicate."""
    s = mesh.shape[axis]
    data_axes = tuple(a for a in data_axes if a in mesh.shape and mesh.shape[a] > 1)

    def local(params_local, consts_local, bcast_local, xs):
        # *_local leaves have leading dim 1 (this device's stage)
        my_params = jax.tree_util.tree_map(lambda p: p[0], params_local)
        my_consts = (
            jax.tree_util.tree_map(lambda p: p[0], consts_local)
            if consts_local is not None
            else None
        )
        idx = jax.lax.axis_index(axis)
        leaves = jax.tree_util.tree_leaves(xs)
        m = leaves[0].shape[0]
        t_total = m + s - 1
        # carries become axis-varying after ppermute/axis_index; mark the
        # replicated initial values as varying so scan types line up
        vary = lambda z: jax.lax.pvary(z, (axis,))
        zero = jax.tree_util.tree_map(lambda a: vary(jnp.zeros_like(a[0])), xs)

        def tick(carry, t):
            buf, outs = carry
            # stage 0 consumes microbatch t; other stages consume the ring buf
            mb_t = jnp.clip(t, 0, m - 1)
            feed = jax.tree_util.tree_map(
                lambda a, z: jnp.where(t < m, a[mb_t], z), xs, zero
            )
            inp = jax.tree_util.tree_map(
                lambda f, b: jnp.where(idx == 0, f, b), feed, buf
            )
            y = stage_fn(my_params, my_consts, bcast_local, inp)
            # last stage emits microbatch t-(s-1)
            mb_idx = t - (s - 1)
            valid_out = (idx == s - 1) & (mb_idx >= 0)
            mb_c = jnp.clip(mb_idx, 0, m - 1)
            outs = jax.tree_util.tree_map(
                lambda o, yy: o.at[mb_c].set(jnp.where(valid_out, yy, o[mb_c])),
                outs, y,
            )
            buf = jax.tree_util.tree_map(
                lambda yy: jax.lax.ppermute(
                    yy, axis, [(i, (i + 1) % s) for i in range(s)]
                ),
                y,
            )
            return (buf, outs), None

        init = (zero, jax.tree_util.tree_map(lambda a: vary(jnp.zeros_like(a)), xs))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(t_total))

        # replicate the last stage's outputs to every pipeline member
        def rep_out(o):
            if o.dtype == jnp.bool_:  # psum is float/int only (padding masks)
                kept = jnp.where(idx == s - 1, o, False).astype(jnp.int32)
                return jax.lax.psum(kept, axis) != 0
            return jax.lax.psum(jnp.where(idx == s - 1, o, jnp.zeros_like(o)), axis)

        return jax.tree_util.tree_map(rep_out, outs)

    stage_spec = lambda tree: jax.tree_util.tree_map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), tree
    )
    rep_spec = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)

    data_size = 1
    for a in data_axes:
        data_size *= mesh.shape[a]

    def payload_spec(leaf):
        if leaf.ndim >= 2 and data_axes and leaf.shape[1] % data_size == 0:
            return P(None, data_axes, *([None] * (leaf.ndim - 2)))
        return P()

    pspec = jax.tree_util.tree_map(payload_spec, microbatches)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            stage_spec(stage_params),
            stage_spec(stage_consts) if stage_consts is not None else None,
            rep_spec(bcast) if bcast is not None else None,
            pspec,
        ),
        out_specs=pspec,
    )(stage_params, stage_consts, bcast, microbatches)
