"""SemSegE2VID: skip decoder over the E2VID latent pyramid -> open-vocab logits.

Reference: ``models/style_networks.py:9-198`` (skip_connect=True, concat skips
— the configuration every OpenESS config uses). Consumes
``latent = {"2": 64ch@1/2, "4": 128ch@1/4, "8": 256ch@1/8}`` and produces
``(logits [B, H, W, num_classes], feat256 [B, H, W, 256])``; logits are a 1x1
conv of 512-d pixel features against frozen CLIP text embeddings
(style_networks.py:163-165).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from openess_tpu.ops.resize import upsample2x_nearest

Array = Any


def _instance_norm(x):
    """torch InstanceNorm2d(affine=False) over NHWC spatial dims.

    Stats are accumulated in f32 (the converts fuse into the reductions so
    no f32 copy of ``x`` ever hits HBM), but the normalize itself runs in
    ``x.dtype``: under bf16 this halves the elementwise HBM stream vs the
    former upcast-normalize-downcast round trip (ROOFLINE.md: the SemSeg
    head ran at 14 % of peak because of exactly those f32 round-trips).
    ``mean``/``inv`` are [B, 1, 1, C] — casting them is free. Exact no-op
    under f32 (the parity-test dtype).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-5).astype(x.dtype)
    return (x - mean.astype(x.dtype)) * inv


class ReLUINSConv2d(nn.Module):
    """Conv -> InstanceNorm(no affine) -> ReLU (style_networks.py:252-263)."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        y = nn.Conv(
            self.features, (self.kernel_size, self.kernel_size),
            padding=[(pad, pad)] * 2, use_bias=True, dtype=self.dtype, name="conv",
        )(x)
        return nn.relu(_instance_norm(y))


class INSResBlock(nn.Module):
    """conv-IN-relu-conv-IN + residual (style_networks.py:266-289)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="conv1"
        )(x)
        y = nn.relu(_instance_norm(y))
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="conv2"
        )(y)
        y = _instance_norm(y)
        return y + x


class SemSegE2VID(nn.Module):
    """The voxel-path student head (input_c=256, pretrain_trainer.py:133-139)."""

    input_c: int = 256
    num_classes: int = 11
    linear_probe: bool = False
    text_embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latent: dict, text_embeddings: Optional[Array] = None):
        tch = self.input_c  # 256
        x = latent["8"]

        # decoder_scale_1: 5 INSResBlocks + 256->128
        for i in range(5):
            x = INSResBlock(tch, dtype=self.dtype, name=f"ds1_res{i}")(x)
        x = ReLUINSConv2d(tch // 2, 3, dtype=self.dtype, name="ds1_conv")(x)

        x = upsample2x_nearest(x)
        x = jnp.concatenate([x, latent["4"].astype(x.dtype)], axis=-1)  # 256

        x = ReLUINSConv2d(tch // 2, 3, dtype=self.dtype, name="ds2_conv1")(x)  # 128
        x = ReLUINSConv2d(tch // 4, 3, dtype=self.dtype, name="ds2_conv2")(x)  # 64
        x = upsample2x_nearest(x)
        x = jnp.concatenate([x, latent["2"].astype(x.dtype)], axis=-1)  # 128

        x = ReLUINSConv2d(tch // 4, 3, dtype=self.dtype, name="ds3_conv1")(x)  # 64
        x = ReLUINSConv2d(tch // 4, 3, dtype=self.dtype, name="ds3_conv2")(x)  # 64
        x = upsample2x_nearest(x)

        x = ReLUINSConv2d(tch // 8, 3, dtype=self.dtype, name="ds4_conv")(x)  # 32

        feat256 = nn.Conv(
            256, (1, 1), dtype=self.dtype, name="decoder_ch256"
        )(x)
        x512 = nn.Conv(
            self.text_embed_dim, (1, 1), dtype=self.dtype, name="decoder_ch512"
        )(feat256)

        if text_embeddings is None:
            text_embeddings = self.param(
                "text_embeddings",
                nn.initializers.normal(stddev=0.01),
                (self.num_classes, self.text_embed_dim),
            )
        logits = jnp.einsum("bhwd,cd->bhwc", x512, text_embeddings.astype(x512.dtype))

        if self.linear_probe:
            logits = nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype, name="linear_probe"
            )(logits)
        return logits, feat256
