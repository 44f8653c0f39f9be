"""Lightweight and dynamic convolutions (Wu et al. 2019).

TPU-native equivalents of the reference's CUDA kernels
(custom_fairseq/fairseq/modules/{lightconv_layer,dynamicconv_layer}/*.cu,
~1400 LoC native): depthwise convolutions with softmax-normalized,
head-shared kernels — static (LightConv) or predicted per position
(DynamicConv).  Formulated as an unfold + einsum, which XLA maps onto the
MXU; no custom kernel needed at these sizes.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _unfold(x, kernel_size: int, causal: bool):
    """x: (B, L, C) -> windows (B, L, K, C) with zero padding."""
    k = kernel_size
    if causal:
        pad = (k - 1, 0)
    else:
        pad = ((k - 1) // 2, k // 2)
    xp = jnp.pad(x, ((0, 0), pad, (0, 0)))
    l = x.shape[1]
    return jnp.stack([xp[:, i : i + l] for i in range(k)], axis=2)


class LightConv(nn.Module):
    """Depthwise conv with softmax-normalized weights shared across
    ``num_heads`` channel groups (modules/lightconv_layer)."""

    kernel_size: int = 3
    num_heads: int = 4
    causal: bool = False
    weight_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, l, c = x.shape
        h, k = self.num_heads, self.kernel_size
        assert c % h == 0
        weight = self.param("weight", nn.initializers.normal(0.1), (h, k))
        w = jax.nn.softmax(weight, axis=-1)
        if self.weight_dropout > 0.0:
            w = nn.Dropout(self.weight_dropout)(w, deterministic=deterministic)
        windows = _unfold(x, k, self.causal)  # (B, L, K, C)
        windows = windows.reshape(b, l, k, h, c // h)
        out = jnp.einsum("blkhd,hk->blhd", windows, w)
        return out.reshape(b, l, c)


class DynamicConv(nn.Module):
    """Position-specific depthwise conv: kernels predicted from the input
    (modules/dynamicconv_layer)."""

    kernel_size: int = 3
    num_heads: int = 4
    causal: bool = False
    weight_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, l, c = x.shape
        h, k = self.num_heads, self.kernel_size
        assert c % h == 0
        w = nn.Dense(h * k, use_bias=False, name="weight_linear")(x)
        w = jax.nn.softmax(w.reshape(b, l, h, k), axis=-1)
        if self.weight_dropout > 0.0:
            w = nn.Dropout(self.weight_dropout)(w, deterministic=deterministic)
        windows = _unfold(x, k, self.causal).reshape(b, l, k, h, c // h)
        out = jnp.einsum("blkhd,blhk->blhd", windows, w)
        return out.reshape(b, l, c)
