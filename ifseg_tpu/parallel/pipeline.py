"""Pipeline parallelism: GPipe-style stage execution over a mesh axis.

Capability parity with the reference's PipelineParallelTransformerModel
(model_parallel/models/pipeline_parallel_transformer/model.py:49-79 — torch
`Pipe` with balance/devices/chunks), built the TPU-native way: stage
parameters stacked (S, ...) and sharded over the pipeline axis, a
``shard_map`` body where each device runs its resident stage, and
``lax.ppermute`` rotating activations around the ring.  The classic GPipe
schedule: T = microbatches + stages - 1 ticks, bubble at both ends.

Collective discipline (one dispatch per tick): only the *transformed*
activations rotate, packed into a single buffer when the carried pytree has
several leaves.  Everything else a stage needs per microbatch — padding
masks, encoder context for cross-attention — enters as ``mb_consts``,
replicated across the pipeline axis, and each stage indexes the row block of
its current microbatch (tick − stage) locally.  The round-2 design rotated
one ppermute per payload leaf; concurrent independent collectives are both
wasted dispatches on ICI and the exact trigger of XLA:CPU rendezvous
timeouts on core-starved hosts (MULTICHIP_r02).

Layout discipline: payloads enter batch-major (B, ...) with the SAME
(data, fsdp) sharding as every surrounding op, and the microbatch split
happens *inside* the shard_map on each device's resident rows — so the
shard_map boundary moves no data.  (Splitting outside with a global
reshape(M, B/M) forced a cross-device row regrouping at entry and exit.)

Gradients flow through ppermute, so the same function trains under
``jax.grad``.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _pack(tree):
    """Flatten a float pytree into one 1-D buffer (single-leaf trees pass
    through untouched).  Returns (buffer, unpack_fn)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if len(leaves) == 1:
        (leaf,) = leaves

        def unpack_one(buf):
            return jax.tree_util.tree_unflatten(treedef, [buf])

        return leaf, unpack_one
    dt = jnp.result_type(*[l.dtype for l in leaves])
    shapes = [l.shape for l in leaves]
    dtypes = [l.dtype for l in leaves]
    sizes = [int(jnp.size(l)) for l in leaves]
    flat = jnp.concatenate([l.astype(dt).reshape(-1) for l in leaves])

    def unpack(buf):
        out, off = [], 0
        for sh, dt_i, sz in zip(shapes, dtypes, sizes):
            out.append(buf[off : off + sz].reshape(sh).astype(dt_i))
            off += sz
        return jax.tree_util.tree_unflatten(treedef, out)

    return flat, unpack


def gpipe(
    stage_params: Any,  # pytree, leaves (S, ...), sharded over `axis`
    stage_fn: Callable,  # (params_1stage, consts_1stage, bcast, carry, mb_const_row, mb_idx) -> carry
    carried: Any,  # pytree, float leaves (B, ...); B sharded over data_axes
    mesh: Mesh,
    axis: str = "model",
    stage_consts: Any = None,  # pytree, leaves (S, ...), sharded over `axis`
    bcast: Any = None,  # pytree, replicated, passed to every stage call
    mb_consts: Any = None,  # pytree, leaves (B, ...), read-only per-microbatch inputs
    chunks: int = 0,  # microbatches per pipeline step; 0 -> stage count
    data_axes: tuple = ("data", "fsdp"),
):
    """Returns the carried pytree after all stages, same layout as input.

    ``carried`` holds only what stages transform (activations); its leaves
    must be floating point (they rotate through one packed ppermute per tick
    and receive gradients).  Per-microbatch inputs that stages merely *read*
    go in ``mb_consts`` — they never travel.  Each data shard splits its own
    resident rows into ``chunks`` microbatches, so DP composes with PP
    without any relayout (each data shard pipelines its own rows)."""
    import math

    s = mesh.shape[axis]
    m = chunks or s
    data_axes = tuple(a for a in data_axes if a in mesh.shape and mesh.shape[a] > 1)
    data_size = 1
    for a in data_axes:
        data_size *= mesh.shape[a]
    b_total = jax.tree_util.tree_leaves(carried)[0].shape[0]
    assert b_total % data_size == 0, (
        f"batch {b_total} not divisible by {data_size} data shards"
    )
    # each data shard chunks its own resident rows; clamp the microbatch
    # count to what divides them (m=1 degenerates to a full-bubble pipeline,
    # still correct) — loudly, since a silent clamp hides an S-1/S idle
    # bubble the user thought --pipeline-chunks had removed
    m_req = m
    m = math.gcd(m, b_total // data_size)
    if m != m_req:
        import logging

        logging.getLogger(__name__).warning(
            "pipeline microbatches clamped %d -> %d (per-shard rows %d not "
            "divisible); pipeline bubble grows accordingly",
            m_req, m, b_total // data_size,
        )
    for leaf in jax.tree_util.tree_leaves(carried):
        assert jnp.issubdtype(leaf.dtype, jnp.inexact), (
            f"carried leaves must be float (got {leaf.dtype}); pass masks/"
            f"indices via mb_consts"
        )

    def local(params_local, consts_local, bcast_local, xs_flat, mbc_flat):
        # params_local/consts_local leaves have leading dim 1 (this device's
        # stage); xs_flat/mbc_flat are this data shard's resident rows
        # (b_loc, ...), replicated over `axis` — split them into microbatches
        # locally so the shard_map boundary moves no data
        my_params = jax.tree_util.tree_map(lambda p: p[0], params_local)
        my_consts = (
            jax.tree_util.tree_map(lambda p: p[0], consts_local)
            if consts_local is not None
            else None
        )
        split = lambda a: a.reshape(m, a.shape[0] // m, *a.shape[1:])
        xs = jax.tree_util.tree_map(split, xs_flat)
        mbc = (
            jax.tree_util.tree_map(split, mbc_flat)
            if mbc_flat is not None
            else None
        )
        idx = jax.lax.axis_index(axis)
        t_total = m + s - 1
        # carries become axis-varying after ppermute/axis_index; mark the
        # replicated initial values as varying so scan types line up
        vary = lambda z: jax.lax.pvary(z, (axis,))
        zero = jax.tree_util.tree_map(lambda a: vary(jnp.zeros_like(a[0])), xs)
        perm = [(i, (i + 1) % s) for i in range(s)]

        def tick(carry, t):
            buf, outs = carry
            # stage `idx` processes microbatch t - idx this tick (garbage
            # during bubble ticks; discarded by the masks below)
            mb_idx = t - idx
            mb_c = jnp.clip(mb_idx, 0, m - 1)
            # stage 0 consumes microbatch t from the input; others the ring
            feed_t = jnp.clip(t, 0, m - 1)
            feed = jax.tree_util.tree_map(
                lambda a, z: jnp.where(t < m, a[feed_t], z), xs, zero
            )
            inp = jax.tree_util.tree_map(
                lambda f, b: jnp.where(idx == 0, f, b), feed, buf
            )
            mbrow = (
                jax.tree_util.tree_map(lambda a: a[mb_c], mbc)
                if mbc is not None
                else None
            )
            y = stage_fn(my_params, my_consts, bcast_local, inp, mbrow, mb_c)
            # last stage emits microbatch t-(s-1)
            out_idx = t - (s - 1)
            valid_out = (idx == s - 1) & (out_idx >= 0)
            oc = jnp.clip(out_idx, 0, m - 1)
            outs = jax.tree_util.tree_map(
                lambda o, yy: o.at[oc].set(jnp.where(valid_out, yy, o[oc])),
                outs, y,
            )
            packed, unpack = _pack(y)
            buf = unpack(jax.lax.ppermute(packed, axis, perm))
            return (buf, outs), None

        init = (zero, jax.tree_util.tree_map(lambda a: vary(jnp.zeros_like(a)), xs))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(t_total))

        # replicate the last stage's outputs to every pipeline member and
        # restore the flat (b_loc, ...) row layout
        def rep_out(o):
            o = jax.lax.psum(jnp.where(idx == s - 1, o, jnp.zeros_like(o)), axis)
            return o.reshape(o.shape[0] * o.shape[1], *o.shape[2:])

        return jax.tree_util.tree_map(rep_out, outs)

    stage_spec = lambda tree: jax.tree_util.tree_map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), tree
    )
    rep_spec = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)

    def payload_spec(leaf):
        # batch-major over the data axes — identical to batch_sharding, so
        # entering/leaving the shard_map moves nothing
        return P(data_axes if data_axes else None, *([None] * (leaf.ndim - 1)))

    cspec = jax.tree_util.tree_map(payload_spec, carried)
    mspec = (
        jax.tree_util.tree_map(payload_spec, mb_consts)
        if mb_consts is not None
        else None
    )
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            stage_spec(stage_params),
            stage_spec(stage_consts) if stage_consts is not None else None,
            rep_spec(bcast) if bcast is not None else None,
            cspec,
            mspec,
        ),
        out_specs=cspec,
    )(stage_params, stage_consts, bcast, carried, mb_consts)
