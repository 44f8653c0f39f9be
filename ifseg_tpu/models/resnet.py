"""ResNet V1.5 image stem (truncated after layer3: stride 16, 1024 channels).

Mirrors models/segofa/resnet.py (torchvision-style bottlenecks, stride on the
3x3 conv) with frozen batch-norm folded into a scale+bias (frozen_bn.py).

TPU-first choices: NHWC layout (XLA's preferred conv layout on TPU), frozen BN
folded into an affine so the whole stem is conv+mul+add chains XLA fuses; the
stem runs in the model compute dtype (bf16) with fp32 params.
"""

from typing import Sequence

import flax.linen as nn
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

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        # reference initializes running_var = 1 - eps so a fresh FrozenBN is identity
        var = self.param(
            "running_var",
            lambda key, shape, dtype: jnp.ones(shape, dtype) - self.eps,
            (self.features,),
            jnp.float32,
        )
        scale = weight * jnp.reciprocal(jnp.sqrt(var + self.eps))
        shift = bias - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


def _conv(features, kernel, stride, name, dtype):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _valid_mask(y, valid_hw):
    """Zero features outside the top-left ``valid_hw`` region (no-op if None)."""
    if valid_hw is None:
        return y
    vh, vw = valid_hw
    r = jnp.arange(y.shape[1])[:, None]
    c = jnp.arange(y.shape[2])[None, :]
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
        out = _conv(width, 1, 1, "conv1", self.dtype)(x)
        out = nn.relu(FrozenBN(width, dtype=self.dtype, name="bn1")(out))
        out = _valid_mask(out, valid_in_hw)
        out = _conv(width, 3, self.stride, "conv2", self.dtype)(out)
        out = nn.relu(FrozenBN(width, dtype=self.dtype, name="bn2")(out))
        out = _conv(width * 4, 1, 1, "conv3", self.dtype)(out)
        out = FrozenBN(width * 4, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = _conv(width * 4, 1, self.stride, "downsample_conv", self.dtype)(x)
            identity = FrozenBN(width * 4, dtype=self.dtype, name="downsample_bn")(identity)
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

        x = _conv(64, 7, 2, "conv1", self.dtype)(x)
        vh, vw = ceil2(vh), ceil2(vw)
        x = _valid_mask(nn.relu(FrozenBN(64, dtype=self.dtype, name="bn1")(x)), cur())
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
