"""Multi-head attention with additive position bias and per-head gains.

Matches models/segofa/unify_multihead_attention.py math:
  - q scaled by (head_dim * attn_scale_factor) ** -0.5 (ref :58)
  - additive ``attn_bias`` on the logits (ref :464-465)
  - key-padding mask -> -inf before softmax (ref :477-489)
  - optional per-head gain ``c_attn`` ("scale_heads", ref :62, :509-512)

TPU-first: batch-major (B, L, D), logits accumulated in fp32 on the MXU,
bias broadcast (heads, Lq, Lk) when batch-independent.  A Pallas
flash-attention path (ifseg_tpu/ops/flash_attention.py) is used for long
sequences when enabled; the XLA einsum path below is the reference-math
baseline and the autodiff-friendly default.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    scale_factor: float = 2.0
    scale_heads: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    kdim: Optional[int] = None
    use_flash: bool = False  # fused Pallas path (TPU; exact-bias attention)

    @nn.compact
    def __call__(
        self,
        query,  # (B, Lq, D)
        key=None,  # (B, Lk, Dk) or None for self-attention
        bias=None,  # (H, Lq, Lk) or (B, H, Lq, Lk), fp32
        key_padding_mask=None,  # (B, Lk) bool, True = pad
        causal: bool = False,
        deterministic: bool = True,
    ):
        if key is None:
            key = query
        head_dim = self.embed_dim // self.num_heads
        scaling = float(head_dim * self.scale_factor) ** -0.5

        dense = lambda name, feats: nn.Dense(
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("q_proj", self.embed_dim)(query) * scaling
        k = dense("k_proj", self.embed_dim)(key)
        v = dense("v_proj", self.embed_dim)(key)

        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, self.num_heads, head_dim)
        k = k.reshape(b, lk, self.num_heads, head_dim)
        v = v.reshape(b, lk, self.num_heads, head_dim)

        flash_ok = (
            self.use_flash
            and (self.dropout == 0.0 or deterministic)
            and (bias is None or bias.ndim == 3)
        )
        if flash_ok:
            from ifseg_tpu.ops.flash_attention import flash_attention_bias

            out = flash_attention_bias(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                bias,
                key_padding_mask,
                causal,
            ).transpose(0, 2, 1, 3).astype(self.dtype)
        else:
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            if bias is not None:
                if bias.ndim == 3:
                    bias = bias[None]
                logits = logits + bias.astype(jnp.float32)
            if causal:
                causal_mask = jnp.tril(jnp.ones((lq, lk), bool), k=lk - lq)
                logits = jnp.where(causal_mask[None, None], logits, NEG_INF)
            if key_padding_mask is not None:
                logits = jnp.where(
                    key_padding_mask[:, None, None, :], NEG_INF, logits
                )
            probs = nn.softmax(logits, axis=-1).astype(self.dtype)
            if self.dropout > 0.0:
                probs = nn.Dropout(rate=self.dropout)(
                    probs, deterministic=deterministic
                )
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)

        if self.scale_heads:
            c_attn = self.param(
                "c_attn", nn.initializers.ones, (self.num_heads,), jnp.float32
            )
            out = out * c_attn[None, None, :, None].astype(out.dtype)
        out = out.reshape(b, lq, self.embed_dim)
        return dense("out_proj", self.embed_dim)(out)
