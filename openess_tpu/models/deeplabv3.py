"""DeepLabV3-ResNet50 student with CLIP text-embedding classifier.

Reference: ``models/deeplabv3.py:86-189``. The classifier is open-vocabulary:
pixel features (512-d) are matched against frozen CLIP text embeddings
``[num_classes, 512]`` via a 1x1 conv (deeplabv3.py:115), so the class set is
whatever text was embedded. Returns ``(logits, feats)`` both upsampled to the
input size (deeplabv3.py:183-188); ``feats`` is the 256-d ASPP output used by
the F2E distillation losses.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from openess_tpu.models.resnet import ResNet50
from openess_tpu.ops.resize import resize_bilinear

Array = Any


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (deeplabv3.py:319-348): 1x1 + three
    dilated 3x3 branches + global-pool branch, concat -> 1x1 project."""

    atrous_rates: Sequence[int]
    out_channels: int = 256
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        res = []
        # branch 0: 1x1 conv
        b = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv0"
        )(x)
        res.append(nn.relu(bn("bn0")(b)))
        # branches 1-3: dilated 3x3
        for i, rate in enumerate(self.atrous_rates, start=1):
            b = nn.Conv(
                self.out_channels, (3, 3), kernel_dilation=(rate, rate),
                padding=[(rate, rate), (rate, rate)], use_bias=False,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            res.append(nn.relu(bn(f"bn{i}")(b)))
        # branch 4: global average pool -> 1x1 -> broadcast back
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv4"
        )(g)
        g = nn.relu(bn("bn4")(g))
        res.append(jnp.broadcast_to(g, res[0].shape))

        y = jnp.concatenate(res, axis=-1)
        y = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="project"
        )(y)
        y = nn.relu(bn("project_bn")(y))
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


class DeepLabHead(nn.Module):
    """ASPP -> 512-d pixel features -> text-embedding logits (deeplabv3.py:86-117)."""

    num_classes: int
    aspp_dilate: Sequence[int]
    text_embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature, text_embeddings: Optional[Array], *, train: bool = False):
        feats = ASPP(self.aspp_dilate, dtype=self.dtype, name="aspp")(
            feature, train=train
        )  # [B, h, w, 256]
        y = nn.Conv(
            self.text_embed_dim, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="classifier_conv",
        )(feats)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="classifier_bn",
        )(y)
        y = nn.relu(y)
        if text_embeddings is None:
            # learnable text matrix when no CLIP embeddings given (deeplabv3.py:105-107)
            text_embeddings = self.param(
                "text_embeddings",
                nn.initializers.normal(stddev=0.01),
                (self.num_classes, self.text_embed_dim),
            )
        # 1x1 conv against text embeddings == matmul over channel dim
        logits = jnp.einsum(
            "bhwd,cd->bhwc", y, text_embeddings.astype(y.dtype)
        )
        return logits, feats


class DeepLabV3TextSeg(nn.Module):
    """The event/recon segmentation student (deeplabv3.py:128-189).

    ``output_stride=8`` dilates layer3+4; any other value dilates layer4 only
    (matching the reference's if/else on ==8). ``linear_probe`` adds the 1x1
    class-mixing conv applied to frozen logits (deeplabv3.py:170,186-187).
    """

    num_classes: int
    output_stride: int = 16
    linear_probe: bool = False
    # fold the backbone's BNs into conv weights when applied with
    # train=False (inference/eval only — resnet._conv_bn runs the standard
    # batch-stat path in train mode, so training is unaffected); exact,
    # identical variable tree
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, text_embeddings: Optional[Array] = None, *, train: bool = False):
        if self.output_stride == 8:
            rswd, dilate = (False, True, True), (12, 24, 36)
        else:
            rswd, dilate = (False, False, True), (6, 12, 18)
        h, w = x.shape[1], x.shape[2]
        feat = ResNet50(
            replace_stride_with_dilation=rswd, fold_bn=self.fold_bn,
            dtype=self.dtype, name="backbone",
        )(x, train=train)
        logits, feats = DeepLabHead(
            self.num_classes, dilate, dtype=self.dtype, name="classifier"
        )(feat, text_embeddings, train=train)
        logits = resize_bilinear(logits, out_h=h, out_w=w, align_corners=False)
        feats = resize_bilinear(feats, out_h=h, out_w=w, align_corners=False)
        if self.linear_probe:
            logits = nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype, name="linear_probe"
            )(logits)
        return logits, feats
