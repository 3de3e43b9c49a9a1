"""ResNet-50 backbone, NHWC flax.linen (reference: models/_resnet.py:117-346).

Faithful to torchvision semantics so released torch checkpoints convert 1:1:
Bottleneck [3,4,6,3], ``replace_stride_with_dilation`` with the
previous-dilation rule for the first block of a dilated stage, BN eps 1e-5.

Module/param naming mirrors torch (``conv1``, ``bn1``, ``layer1/0/conv2``,
``downsample_conv`` ...) so the converter in ``models/torch_convert.py`` is a
mechanical rename.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

Array = Any

_BN_EPS = 1e-5


class _ConvKernel(nn.Module):
    """Bare conv kernel with nn.Conv's name/shape/initializer (the
    e2vid.py `_ConvParams` idiom), for the folded-BN compute path."""

    kernel_shape: Sequence[int]  # (kh, kw, in, out) HWIO

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), tuple(self.kernel_shape)
        )


class _BNParams(nn.Module):
    """Bare BatchNorm variables with nn.BatchNorm's names/collections."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        return scale, bias, mean.value, var.value


def _conv_bn(
    parent_dtype, fold, train, x, *,
    features, k, stride, dilation, pad, conv_name, bn_name,
):
    """conv -> BatchNorm, optionally with the inference-mode BN folded into
    the conv weights.

    Folding is mathematically exact for a FROZEN trunk (inference BN is an
    affine map: y = conv(x)*s + (beta - mu*s), s = gamma/sqrt(var+eps), so
    s scales the conv kernel and the rest is a bias). It removes the
    bf16->f32->bf16 round-trip the f32 BN forces between every conv pair —
    with ~53 BNs over the fully-dilated H/4 x W/4 activations this is pure
    HBM traffic. Both paths declare the IDENTICAL variable tree
    (conv_name/kernel + bn_name/{scale,bias} + batch_stats), so checkpoints
    and the torch converter are unaffected. In train mode (batch-stat BN,
    mutable running stats) folding is undefined, so the standard path runs
    regardless of ``fold`` — a fold_bn model still trains correctly.
    """
    if train or not fold:
        y = nn.Conv(
            features, (k, k), strides=(stride, stride),
            kernel_dilation=(dilation, dilation),
            padding=[(pad, pad), (pad, pad)], use_bias=False,
            dtype=parent_dtype, name=conv_name,
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=_BN_EPS,
            dtype=jnp.float32, name=bn_name,
        )(y)
    w = _ConvKernel((k, k, x.shape[-1], features), name=conv_name)()
    scale, bias, mean, var = _BNParams(features, name=bn_name)()
    s = scale * lax.rsqrt(var + _BN_EPS)
    wf = (w * s).astype(parent_dtype)
    b = (bias - mean * s).astype(parent_dtype)
    y = lax.conv_general_dilated(
        x.astype(parent_dtype), wf,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cb = lambda x, f, k, s, d, p, cname, bname: _conv_bn(
            self.dtype, self.fold_bn, train, x,
            features=f, k=k, stride=s, dilation=d, pad=p,
            conv_name=cname, bn_name=bname,
        )
        identity = x
        out = nn.relu(cb(x, self.planes, 1, 1, 1, 0, "conv1", "bn1"))
        out = nn.relu(
            cb(out, self.planes, 3, self.stride, self.dilation, self.dilation,
               "conv2", "bn2")
        )
        out = cb(out, self.planes * 4, 1, 1, 1, 0, "conv3", "bn3")
        if self.has_downsample:
            identity = cb(
                x, self.planes * 4, 1, self.stride, 1, 0,
                "downsample_conv", "downsample_bn",
            )
        return nn.relu(out + identity.astype(out.dtype))


class ResNet50(nn.Module):
    """Returns the layer4 feature map (``IntermediateLayerGetter('layer4')``).

    ``replace_stride_with_dilation``:
      - deeplab os16: (False, False, True)  — models/deeplabv3.py:141
      - deeplab os8:  (False, True, True)   — models/deeplabv3.py:138
      - teacher:      (True, True, True)    — models/image_model.py:105
    """

    replace_stride_with_dilation: Sequence[bool] = (False, False, True)
    layers: Sequence[int] = (3, 4, 6, 3)
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = _conv_bn(
            self.dtype, self.fold_bn, train, x,
            features=64, k=7, stride=2, dilation=1, pad=3,
            conv_name="conv1", bn_name="bn1",
        )
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        dilation = 1
        inplanes = 64
        for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            dilate = li > 0 and self.replace_stride_with_dilation[li - 1]
            previous_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            for bi in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    dilation=previous_dilation if bi == 0 else dilation,
                    has_downsample=(bi == 0 and (stride != 1 or inplanes != planes * 4)),
                    fold_bn=self.fold_bn,
                    dtype=self.dtype,
                    name=f"layer{li + 1}/{bi}",
                )(x, train=train)
                if bi == 0:
                    inplanes = planes * 4
        return x
