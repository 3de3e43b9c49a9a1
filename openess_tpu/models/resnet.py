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

Array = Any


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        conv = lambda f, k, s, d, p, name: nn.Conv(
            f, (k, k), strides=(s, s), kernel_dilation=(d, d),
            padding=[(p, p), (p, p)], use_bias=False, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, 1, 0, "conv1")(x)))
        out = nn.relu(
            bn("bn2")(
                conv(self.planes, 3, self.stride, self.dilation, self.dilation, "conv2")(out)
            )
        )
        out = bn("bn3")(conv(self.planes * 4, 1, 1, 1, 0, "conv3")(out))
        if self.has_downsample:
            identity = bn("downsample_bn")(
                conv(self.planes * 4, 1, self.stride, 1, 0, "downsample_conv")(x)
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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn1",
        )(x)
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
                    dtype=self.dtype,
                    name=f"layer{li + 1}/{bi}",
                )(x, train=train)
                if bi == 0:
                    inplanes = planes * 4
        return x
