"""Pipeline parallelism: GPipe-style stage execution over a mesh axis.

Capability parity with the reference's PipelineParallelTransformerModel
(model_parallel/models/pipeline_parallel_transformer/model.py:49-79 — torch
`Pipe` with balance/devices/chunks), built the TPU-native way: stage
parameters stacked (S, ...) and sharded over the pipeline axis, a
``shard_map`` body where each device runs its resident stage, and
``lax.ppermute`` rotating activations around the ring.  The classic GPipe
schedule: T = microbatches + stages - 1 ticks, bubble at both ends.

The stage function is arbitrary (a stack of transformer layers in practice);
gradients flow through ppermute, so the same function trains under
``jax.grad`` — the fill/drain bubble is the standard GPipe cost.
"""

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gpipe(
    stage_params: Any,  # pytree with leading stage axis (S, ...), sharded on axis
    stage_fn: Callable,  # (params_for_one_stage, x) -> y  (same shape)
    microbatches,  # (M, mb, ...) replicated input microbatches
    mesh: Mesh,
    axis: str = "model",
):
    """Returns (M, mb, ...) outputs, replicated across the pipeline axis."""
    s = mesh.shape[axis]

    def local(params_local, xs):
        # params_local leaves have leading dim 1 (this device's stage)
        my_params = jax.tree_util.tree_map(lambda p: p[0], params_local)
        idx = jax.lax.axis_index(axis)
        m = xs.shape[0]
        t_total = m + s - 1
        # carries become axis-varying after ppermute/axis_index; mark the
        # replicated initial values as varying so scan types line up
        zero = jax.lax.pvary(jnp.zeros_like(xs[0]), (axis,))

        def tick(carry, t):
            buf, outs = carry
            # stage 0 consumes microbatch t; other stages consume the ring buf
            feed = jnp.where(t < m, xs[jnp.clip(t, 0, m - 1)], zero)
            inp = jnp.where(idx == 0, feed, buf)
            y = stage_fn(my_params, inp)
            # last stage emits microbatch t-(s-1)
            mb_idx = t - (s - 1)
            valid_out = (idx == s - 1) & (mb_idx >= 0)
            mb_c = jnp.clip(mb_idx, 0, m - 1)
            outs = outs.at[mb_c].set(jnp.where(valid_out, y, outs[mb_c]))
            buf = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % s) for i in range(s)]
            )
            return (buf, outs), None

        init = (zero, jax.lax.pvary(jnp.zeros_like(xs), (axis,)))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(t_total))
        # replicate the last stage's outputs to every pipeline member
        outs = jax.lax.psum(
            jnp.where(idx == s - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs

    param_specs = jax.tree_util.tree_map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), stage_params
    )
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
    )(stage_params, microbatches)
