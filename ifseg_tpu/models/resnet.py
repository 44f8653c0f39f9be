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


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = self.planes
        out = _conv(width, 1, 1, "conv1", self.dtype)(x)
        out = nn.relu(FrozenBN(width, dtype=self.dtype, name="bn1")(out))
        out = _conv(width, 3, self.stride, "conv2", self.dtype)(out)
        out = nn.relu(FrozenBN(width, dtype=self.dtype, name="bn2")(out))
        out = _conv(width * 4, 1, 1, "conv3", self.dtype)(out)
        out = FrozenBN(width * 4, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = _conv(width * 4, 1, self.stride, "downsample_conv", self.dtype)(x)
            identity = FrozenBN(width * 4, dtype=self.dtype, name="downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(identity + out)


class ResNetStem(nn.Module):
    """conv1 -> maxpool -> layer1..layer3 (models/segofa/resnet.py:140-226).

    Input  (B, H, W, 3) normalized images; output (B, H/16, W/16, 1024).
    """

    layers: Sequence[int] = (3, 4, 23)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _conv(64, 7, 2, "conv1", self.dtype)(x)
        x = nn.relu(FrozenBN(64, dtype=self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (blocks, planes, stride) in enumerate(
            zip(self.layers, (64, 128, 256), (1, 2, 2)), start=1
        ):
            for i in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if i == 0 else 1,
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage}_{i}",
                )(x)
        return x
