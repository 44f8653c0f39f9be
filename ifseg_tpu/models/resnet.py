"""ResNet V1.5 image stem (truncated after layer3: stride 16, 1024 channels).

Mirrors models/segofa/resnet.py (torchvision-style bottlenecks, stride on the
3x3 conv) with frozen batch-norm folded into the convolution (frozen_bn.py).

TPU-first choices: NHWC layout (XLA's preferred conv layout on TPU); the
frozen BN affine is folded INTO the conv — scale into the kernel
(conv(x, W)·s == conv(x, W·s)) and shift as an epilogue bias — and every
1x1 conv is lowered to a matmul over the channel axis.  TPU convolutions
are opaque to XLA's loop fusion, so an unfolded stem pays a separate
HBM-bound elementwise pass per BN/relu/residual (~12 ms/step at 512px
batch-32 serving, measured v5e); matmuls fuse their whole elementwise
epilogue (bias + relu + residual add), which removes those passes for the
two 1x1 convs of every bottleneck and the downsample branch.  The stem runs
in the model compute dtype (bf16) with fp32 params.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

RESNET_LAYERS = {
    "resnet50": (3, 4, 6),
    "resnet101": (3, 4, 23),
    "resnet152": (3, 8, 36),
}


class FrozenBN(nn.Module):
    """BatchNorm with fixed statistics and affine params (frozen_bn.py:28-57).

    Stored as four param vectors so torch checkpoints map 1:1; the optimizer
    mask keeps them frozen regardless of the resnet-freeze policy.
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.weight = self.param(
            "weight", nn.initializers.ones, (self.features,), jnp.float32
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        self.running_mean = self.param(
            "running_mean", nn.initializers.zeros, (self.features,), jnp.float32
        )
        # reference initializes running_var = 1 - eps so a fresh FrozenBN is identity
        self.running_var = self.param(
            "running_var",
            lambda key, shape, dtype: jnp.ones(shape, dtype) - self.eps,
            (self.features,),
            jnp.float32,
        )

    def scale_shift(self):
        """The affine as (scale, shift) fp32 vectors, for conv folding."""
        scale = self.weight * jnp.reciprocal(jnp.sqrt(self.running_var + self.eps))
        shift = self.bias - self.running_mean * scale
        return scale, shift

    def __call__(self, x):
        scale, shift = self.scale_shift()
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


class _Conv(nn.Module):
    """Conv with an optional folded FrozenBN (scale into the kernel, shift as
    epilogue bias); 1x1 convs run as channel-axis matmuls (strided slice
    first when stride > 1) so XLA fuses the downstream elementwise chain."""

    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale=None, shift=None):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
            jnp.float32,
        )
        if scale is not None:
            w = w * scale  # per-output-channel; broadcasts over (kh, kw, in)
        w = w.astype(self.dtype)
        if self.kernel == 1:
            if self.stride != 1:
                x = x[:, :: self.stride, :: self.stride, :]
            y = jax.lax.dot_general(x, w[0, 0], (((3,), (0,)), ((), ())))
        else:
            y = jax.lax.conv_general_dilated(
                x,
                w,
                (self.stride, self.stride),
                [(self.kernel // 2, self.kernel // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if shift is not None:
            y = y + shift.astype(self.dtype)
        return y


def _valid_mask(y, valid_hw):
    """Zero features outside the top-left ``valid_hw`` region (no-op if None).

    ``valid_hw`` entries may be scalars (one extent for the whole batch) or
    (B,) vectors (per-row extents — the evaluator's group-shared forward
    batches rows whose ceil-16 extents match but whose exact pixel extents
    differ)."""
    if valid_hw is None:
        return y
    vh, vw = jnp.asarray(valid_hw[0]), jnp.asarray(valid_hw[1])
    r = jnp.arange(y.shape[1])[:, None]
    c = jnp.arange(y.shape[2])[None, :]
    if vh.ndim or vw.ndim:
        m = (r[None] < vh[:, None, None]) & (c[None] < vw[:, None, None])
        return y * m[:, :, :, None].astype(y.dtype)
    m = (r < vh) & (c < vw)
    return y * m[None, :, :, None].astype(y.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_in_hw=None, valid_out_hw=None):
        """``valid_in_hw`` masks before the 3x3 conv (its zero-padding
        semantics must see zeros beyond the valid edge); ``valid_out_hw``
        masks the block output."""
        width = self.planes
        bn = lambda feats, name: FrozenBN(
            feats, dtype=self.dtype, name=name
        ).scale_shift()
        conv = lambda feats, k, s, name: _Conv(
            feats, k, stride=s, dtype=self.dtype, name=name
        )
        out = nn.relu(conv(width, 1, 1, "conv1")(x, *bn(width, "bn1")))
        out = _valid_mask(out, valid_in_hw)
        out = nn.relu(
            conv(width, 3, self.stride, "conv2")(out, *bn(width, "bn2"))
        )
        out = conv(width * 4, 1, 1, "conv3")(out, *bn(width * 4, "bn3"))
        if self.downsample:
            identity = conv(width * 4, 1, self.stride, "downsample_conv")(
                x, *bn(width * 4, "downsample_bn")
            )
        else:
            identity = x
        return _valid_mask(nn.relu(identity + out), valid_out_hw)


class ResNetStem(nn.Module):
    """conv1 -> maxpool -> layer1..layer3 (models/segofa/resnet.py:140-226).

    Input  (B, H, W, 3) normalized images; output (B, H/16, W/16, 1024).
    """

    layers: Sequence[int] = (3, 4, 23)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_hw=None):
        """``valid_hw=(h, w)`` (traced scalars) marks the top-left valid pixel
        region of a zero-padded input.  Features outside the (stagewise
        ceil-divided) valid region are zeroed after every stage, which makes a
        padded-image forward bit-match an unpadded one: torch's conv zero
        padding at the true image border is exactly reproduced by zeros in the
        padded region (post-normalize pad value 0.0 == torch's conv pad), and
        max_pool windows only ever add relu-nonnegative zeros."""

        masked = valid_hw is not None
        vh, vw = valid_hw if masked else (None, None)
        ceil2 = lambda v: None if v is None else -(-v // 2)
        cur = lambda: (vh, vw) if masked else None

        s1, b1 = FrozenBN(64, dtype=self.dtype, name="bn1").scale_shift()
        x = _Conv(64, 7, stride=2, dtype=self.dtype, name="conv1")(x, s1, b1)
        vh, vw = ceil2(vh), ceil2(vw)
        x = _valid_mask(nn.relu(x), cur())
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        vh, vw = ceil2(vh), ceil2(vw)
        x = _valid_mask(x, cur())
        for stage, (blocks, planes, stride) in enumerate(
            zip(self.layers, (64, 128, 256), (1, 2, 2)), start=1
        ):
            for i in range(blocks):
                s = stride if i == 0 else 1
                in_hw = cur()
                if s == 2:
                    vh, vw = ceil2(vh), ceil2(vw)
                x = Bottleneck(
                    planes,
                    stride=s,
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage}_{i}",
                )(x, valid_in_hw=in_hw, valid_out_hw=cur())
        return x
