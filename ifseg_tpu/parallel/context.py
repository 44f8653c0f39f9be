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
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e9


def ring_attention(
    q,  # (B, H, L, D) — L sharded over `axis`
    k,  # (B, H, L, D) — same sharding
    v,  # (B, H, L, D)
    bias: Optional[jnp.ndarray],  # (H, L, L) fp32 or None; rows sharded
    mesh: Mesh,
    axis: str = "model",
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, L) bool, True = pad
    causal: bool = False,
):
    """Exact attention with the sequence axis sharded over ``axis``.

    The padding mask rotates around the ring with its K/V chunk; causal
    masking compares global query rows (idx-local offset) against global key
    columns (resident-chunk offset) so the result matches dense causal
    attention exactly."""
    n = mesh.shape[axis]

    def local_fn(q_l, k_l, v_l, bias_l, mask_l):
        # q_l: (B, H, Lq_loc, D); k_l/v_l: (B, H, Lc, D) local chunk
        # bias_l: (H, Lq_loc, L_total); mask_l: (B, Lc)
        idx = jax.lax.axis_index(axis)
        b, h, lq, d = q_l.shape
        lc = k_l.shape[2]
        qf = q_l.astype(jnp.float32)

        o0 = jnp.zeros((b, h, lq, d), jnp.float32)
        m0 = jnp.full((b, h, lq, 1), -jnp.inf, jnp.float32)
        s0 = jnp.zeros((b, h, lq, 1), jnp.float32)
        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(carry, t):
            o, m, s, kc, vc, mc = carry
            src = (idx - t) % n  # which chunk is resident this step
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qf, kc.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            if bias_l is not None:
                col = src * lc
                bslice = jax.lax.dynamic_slice_in_dim(bias_l, col, lc, axis=2)
                logits = logits + bslice[None]
            if mc is not None:
                logits = jnp.where(mc[:, None, None, :], NEG_INF, logits)
            if causal:
                rows = idx * lq + jnp.arange(lq)  # global query positions
                cols = src * lc + jnp.arange(lc)  # global key positions
                logits = jnp.where(
                    cols[None, None, None, :] > rows[None, None, :, None],
                    NEG_INF, logits,
                )
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            scale = jnp.exp(m - m_new)
            s = s * scale + jnp.sum(p, axis=-1, keepdims=True)
            o = o * scale + jnp.einsum(
                "bhqk,bhkd->bhqd", p, vc.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            if mc is not None:
                mc = jax.lax.ppermute(mc, axis, perm)
            return (o, m_new, s, kc, vc, mc), None

        init = (
            jax.lax.pvary(o0, (axis,)),
            jax.lax.pvary(m0, (axis,)),
            jax.lax.pvary(s0, (axis,)),
            k_l,
            v_l,
            mask_l,
        )
        (o, m, s, _, _, _), _ = jax.lax.scan(step, init, jnp.arange(n))
        return (o / jnp.maximum(s, 1e-30)).astype(q_l.dtype)

    bias_spec = P(None, axis, None) if bias is not None else P()
    mask_spec = P(None, axis) if key_padding_mask is not None else P()

    def wrapper(q_, k_, v_, b_, m_):
        return local_fn(
            q_, k_, v_,
            b_ if bias is not None else None,
            m_ if key_padding_mask is not None else None,
        )

    return shard_map(
        wrapper,
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, None, axis, None),
            bias_spec,
            mask_spec,
        ),
        out_specs=P(None, None, axis, None),
    )(
        q, k, v,
        bias if bias is not None else jnp.zeros((1,), jnp.float32),
        key_padding_mask if key_padding_mask is not None else jnp.zeros((1,), bool),
    )
