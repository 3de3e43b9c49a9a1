"""Frozen self-supervised RGB frame teacher (reference: models/image_model.py:90-143).

Fully-dilated ResNet-50 (output stride 4) -> 1x1 conv to 256-d -> 4x bilinear
upsample (align_corners=True) -> L2-normalized per-pixel features. Weights
come from converted released checkpoints (dino/moco/swav, image_model.py:26-74)
and are frozen during training (image_model.py:116-117).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from openess_tpu.models.resnet import ResNet50
from openess_tpu.ops.resize import resize_bilinear

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def imagenet_normalize(x):
    """ImageNet preprocessing on [0,1] RGB NHWC (image_model.py:77-87)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


class DilationFeatureExtractor(nn.Module):
    """256-d per-pixel frame features for F2E distillation.

    ``output_stride``: 4 is the reference-exact fully-dilated trunk
    (image_model.py:104); 8/16 keep the first one/two stage strides,
    cutting stage-2..4 FLOPs 4x/16x — the features only feed superpixel
    mean-pooling after upsampling to full resolution, so coarser trunks
    trade negligible pooled-feature fidelity for most of the teacher's
    step-time share (TPU fast path, ``tpu: teacher_os``)."""

    model_n_out: int = 256
    normalize_features: bool = True
    preprocess: bool = True
    output_stride: int = 4
    frozen_encoder: bool = True
    # Fold the frozen trunk's inference-mode BNs into the conv weights
    # (exact; identical variable tree — see resnet._conv_bn). Removes the
    # f32 BN round-trips between every conv pair of the dilated R50.
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        if self.preprocess:
            x = imagenet_normalize(x)
        dilation = {
            4: (True, True, True),
            8: (False, True, True),
            16: (False, False, True),
        }[self.output_stride]
        feat = ResNet50(
            replace_stride_with_dilation=dilation,
            fold_bn=self.fold_bn,
            dtype=self.dtype,
            name="encoder",
        )(x, train=False)  # frozen teacher: always inference-mode BN
        if self.frozen_encoder:
            # reference: encoder requires_grad=False (image_model.py:116-117)
            # — grads never reach it, so cut the (expensive, fully-dilated)
            # R50 out of the backward graph entirely; the decoder conv
            # below stays trainable
            import jax

            feat = jax.lax.stop_gradient(feat)
        feat = nn.Conv(
            self.model_n_out, (1, 1), dtype=self.dtype, name="decoder_conv"
        )(feat)
        feat = resize_bilinear(feat, out_h=h, out_w=w, align_corners=True)
        if self.normalize_features:
            feat = feat / jnp.maximum(
                jnp.linalg.norm(feat.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
            ).astype(feat.dtype)
        return feat
