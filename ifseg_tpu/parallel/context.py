"""Context parallelism: ring attention over a mesh axis.

The reference has NO sequence/context parallelism (SURVEY.md §2.4/§5) — this
is designed fresh for the TPU build: shard the (1024-token image) sequence
axis across devices and rotate K/V chunks around the ring with ``ppermute``,
accumulating softmax online (flash-style m/s/o state), so no device ever
holds the full (Lq, Lk) logits and attention memory scales 1/N per device.

Supports the OFA additive bias: the full (H, Lq, Lk) bias is sharded over the
query axis; each ring step slices the K-column block for the chunk currently
resident.  Exact (not approximate): matches dense attention to float
tolerance.

Collective discipline (one dispatch per ring step): K and V travel as a
single stacked (2, B, H, Lc, D) buffer through ONE ``ppermute``; the key
padding mask does not rotate at all — each step slices the resident chunk's
columns locally, exactly like the bias.  Concurrent independent collectives
are what starve XLA:CPU's rendezvous on core-limited hosts and are wasted
dispatches on ICI.  Batch stays sharded over the non-ring mesh axes so the
shard_map boundary never forces a replicate-repartition round trip.

Ragged lengths: sequences that do not divide the axis size are zero-padded to
``n·⌈L/n⌉`` here (mask rows added, padded key columns masked, outputs sliced
back), so the 1025-token surrogate decoder rings under --context-parallel.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e9


def ring_attention(
    q,  # (B, H, L, D)
    k,  # (B, H, L, D)
    v,  # (B, H, L, D)
    bias: Optional[jnp.ndarray],  # (H, L, L) fp32 or None
    mesh: Mesh,
    axis: str = "model",
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, L) bool, True = pad
    causal: bool = False,
):
    """Exact attention with the sequence axis sharded over ``axis``.

    Causal masking compares global query rows (idx·Lc + local offset) against
    global key columns (resident-chunk offset) so the result matches dense
    causal attention exactly."""
    n = mesh.shape[axis]
    b, h, l, d = q.shape
    # batch stays sharded over the non-ring mesh axes: the surrounding jit
    # keeps activations batch-sharded over data×fsdp, and entering the
    # shard_map replicated (the old P(None, ...) specs) forced a
    # replicate-then-repartition round trip per boundary — the "[SPMD]
    # Involuntary full rematerialization" storm on every q/k/v projection's
    # backward.  Axes that don't divide the batch fall back to replicated.
    batch_axes = tuple(
        a for a in mesh.axis_names if a != axis and mesh.shape[a] > 1
    )
    bdiv = 1
    for a in batch_axes:
        bdiv *= mesh.shape[a]
    if b % bdiv != 0:
        batch_axes = ()
    bspec = batch_axes if batch_axes else None

    lp = -(-l // n) * n  # padded length divisible by the ring size
    if lp != l:
        pad = lp - l
        padw = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, padw)
        k = jnp.pad(k, padw)
        v = jnp.pad(v, padw)
        if key_padding_mask is None:
            key_padding_mask = jnp.zeros((b, l), bool)
        key_padding_mask = jnp.pad(
            key_padding_mask, ((0, 0), (0, pad)), constant_values=True
        )
        if bias is not None:
            # padded query rows are sliced off below; padded key columns are
            # killed by the padding mask — zero-fill keeps the bias finite
            bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))

    def local_fn(q_l, kv_l, bias_l, mask_full):
        # q_l: (B, H, Lq_loc, D); kv_l: (2, B, H, Lc, D) local K/V chunk
        # bias_l: (H, Lq_loc, L_total) or None; mask_full: (B, L_total) or None
        idx = jax.lax.axis_index(axis)
        bl = q_l.shape[0]  # local batch (sharded over batch_axes)
        lq = q_l.shape[2]
        lc = kv_l.shape[3]
        qf = q_l.astype(jnp.float32)

        o0 = jnp.zeros((bl, h, lq, d), jnp.float32)
        m0 = jnp.full((bl, h, lq, 1), -jnp.inf, jnp.float32)
        s0 = jnp.zeros((bl, h, lq, 1), jnp.float32)
        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(carry, t):
            o, m, s, kv = carry
            src = (idx - t) % n  # which chunk is resident this step
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qf, kv[0].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            col = src * lc
            if bias_l is not None:
                bslice = jax.lax.dynamic_slice_in_dim(bias_l, col, lc, axis=2)
                logits = logits + bslice[None]
            if mask_full is not None:
                mslice = jax.lax.dynamic_slice_in_dim(mask_full, col, lc, axis=1)
                logits = jnp.where(mslice[:, None, None, :], NEG_INF, logits)
            if causal:
                rows = idx * lq + jnp.arange(lq)  # global query positions
                cols = col + jnp.arange(lc)  # global key positions
                logits = jnp.where(
                    cols[None, None, None, :] > rows[None, None, :, None],
                    NEG_INF, logits,
                )
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            scale = jnp.exp(m - m_new)
            s = s * scale + jnp.sum(p, axis=-1, keepdims=True)
            o = o * scale + jnp.einsum(
                "bhqk,bhkd->bhqd", p, kv[1].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            kv = jax.lax.ppermute(kv, axis, perm)
            return (o, m_new, s, kv), None

        vary = (axis,) + batch_axes
        init = (
            jax.lax.pvary(o0, vary),
            jax.lax.pvary(m0, vary),
            jax.lax.pvary(s0, vary),
            kv_l,
        )
        (o, m, s, _), _ = jax.lax.scan(step, init, jnp.arange(n))
        return (o / jnp.maximum(s, 1e-30)).astype(q_l.dtype)

    bias_spec = P(None, axis, None) if bias is not None else P()
    # the mask is (B, L) bool — batch-sharded like q, and it never rotates:
    # each ring step slices the resident chunk's columns locally
    mask_spec = P(bspec, None) if key_padding_mask is not None else P()

    def wrapper(q_, kv_, b_, m_):
        return local_fn(
            q_, kv_,
            b_ if bias is not None else None,
            m_ if key_padding_mask is not None else None,
        )

    kv = jnp.stack([k, v])  # (2, B, H, L, D): one buffer -> one ppermute
    out = shard_map(
        wrapper,
        mesh=mesh,
        in_specs=(
            P(bspec, None, axis, None),
            P(None, bspec, None, axis, None),
            bias_spec,
            mask_spec,
        ),
        out_specs=P(bspec, None, axis, None),
    )(
        q, kv,
        bias if bias is not None else jnp.zeros((1,), jnp.float32),
        key_padding_mask if key_padding_mask is not None else jnp.zeros((1,), bool),
    )
    return out[:, :, :l] if lp != l else out
