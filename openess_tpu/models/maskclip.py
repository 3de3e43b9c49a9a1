"""MaskCLIP: frozen CLIP ViT-B/16 -> dense open-vocabulary logits.

Reference: ``models/maskclip_model.py`` — VisionTransformer (:545-851) with
the MaskCLIP "value-path" trick on the final encoder layer (:519-543): the
attention's value projection output (passed through the same out-proj,
residual and FFN as the normal path, then ln_post) is used as the per-patch
feature; the CLIP visual projection (1x1 conv, :132-148) maps it to the text
space and logits are a cosine match against frozen text embeddings
(cls_seg, :218-222). ``maskClipFeatureExtractor`` (:853-916) resizes logits
back to the input resolution.

TPU-first: NHWC, bf16-capable, single jit; position embeddings are resized
once per input shape (static under jit).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from openess_tpu.ops.resize import resize_bilinear

Array = Any


class CLIPAttention(nn.Module):
    """Multi-head self-attention with combined qkv in-proj (torch
    MultiheadAttention layout, so converted weights drop straight in)."""

    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, also_value_path: bool = False):
        C, H = self.embed_dim, self.num_heads
        in_proj = nn.Dense(3 * C, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(C, dtype=self.dtype, name="out_proj")

        qkv = in_proj(x)  # [B, L, 3C]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            b, l, _ = t.shape
            return t.reshape(b, l, H, C // H).transpose(0, 2, 1, 3)

        attn = jnp.einsum(
            "bhld,bhmd->bhlm", heads(q) / jnp.sqrt(C // H).astype(q.dtype), heads(k),
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(x.shape)
        out = out_proj(out)

        if also_value_path:
            # MaskCLIP: q/k/v each individually mapped through out_proj
            # (maskclip_model.py:523-533)
            qp = out_proj(q)
            kp = out_proj(k)
            vp = out_proj(v)
            return out, (qp, kp, vp)
        return out, None


class CLIPMLp(nn.Module):
    embed_dim: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.embed_dim * self.mlp_ratio, dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(y)


class CLIPEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_qkv: bool = False):
        ln1 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln1")
        ln2 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln2")
        attn = CLIPAttention(self.embed_dim, self.num_heads, self.dtype, name="attn")
        mlp = CLIPMLp(self.embed_dim, dtype=self.dtype, name="mlp")

        y = ln1(x).astype(x.dtype)
        out, qkv = attn(y, also_value_path=return_qkv)
        q = k = v = None
        if return_qkv:
            q, k, v = qkv
            v = v + x  # residual (maskclip_model.py:536)
            v = v + mlp(ln2(v).astype(v.dtype))  # ffn with identity (:537)
        x = x + out
        x = x + mlp(ln2(x).astype(x.dtype))
        return x, q, k, v


class MaskClipViT(nn.Module):
    """CLIP ViT-B/16 returning (x_spatial, q, k, v_spatial) of the last layer
    (maskclip_model.py:799-851: out_indices=-1, return_qkv on last layer,
    ln_post applied to both x and v)."""

    patch_size: int = 16
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        ps = self.patch_size
        # 'corner' padding: zeros at bottom/right to a multiple of patch size
        pad_h = (-h) % ps
        pad_w = (-w) % ps
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        gh, gw = (h + pad_h) // ps, (w + pad_w) // ps

        x = nn.Conv(
            self.embed_dim, (ps, ps), strides=(ps, ps), use_bias=False,
            dtype=self.dtype, name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, (224 // ps) * (224 // ps) + 1, self.embed_dim),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1,
        )
        x = x + _resize_pos_embed(pos_embed, gh, gw).astype(x.dtype)

        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln_pre")(x).astype(
            x.dtype
        )

        q = k = v = None
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x, q, k, v = CLIPEncoderLayer(
                self.embed_dim, self.num_heads, self.dtype, name=f"layers_{i}"
            )(x, return_qkv=last)

        ln_post = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln_post")
        x = ln_post(x).astype(v.dtype)
        v = ln_post(v).astype(x.dtype)

        def spatial(t):
            return t[:, 1:].reshape(b, gh, gw, self.embed_dim)

        return spatial(x), q[:, 1:], k[:, 1:], spatial(v)


def _resize_pos_embed(pos_embed, gh: int, gw: int):
    """Bicubic spatial resize of the (non-cls) position embeddings
    (maskclip_model.py _pos_embeding, interpolate_mode='bicubic')."""
    cls_pe = pos_embed[:, :1]
    n = pos_embed.shape[1] - 1
    g0 = int(round(float(n) ** 0.5))
    spatial = pos_embed[:, 1:].reshape(1, g0, g0, -1)
    if (g0, g0) != (gh, gw):
        spatial = jax.image.resize(
            spatial.astype(jnp.float32),
            (1, gh, gw, spatial.shape[-1]),
            method="cubic",
        ).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pe, spatial.reshape(1, gh * gw, -1)], axis=1)


class MaskClipFeatureExtractor(nn.Module):
    """Frozen dense open-vocab teacher: image -> per-pixel class logits
    (maskClipFeatureExtractor, maskclip_model.py:853-916).

    Returns logits upsampled to the input size; ``return_features=True`` also
    yields the 768-d value-path features (``image_feats`` in the reference).
    """

    num_classes: int
    text_embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, text_embeddings: Array, *, return_features: bool = False):
        h, w = img.shape[1], img.shape[2]
        x, q, k, v = MaskClipViT(dtype=self.dtype, name="encoder")(img)
        # CLIP visual projection (1x1 conv, no bias)
        feat = nn.Dense(
            self.text_embed_dim, use_bias=False, dtype=self.dtype, name="proj"
        )(v)
        feat = feat / jnp.maximum(
            jnp.linalg.norm(feat.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
        ).astype(feat.dtype)
        logits = jnp.einsum(
            "bhwd,cd->bhwc", feat, text_embeddings.astype(feat.dtype)
        )
        logits = resize_bilinear(logits, out_h=h, out_w=w, align_corners=False)
        if return_features:
            return logits, v
        return logits
