"""CLIP ConvNeXt-Large backbone for FC-CLIP (TPU-native flax).

Reference: ``fc-clip/fcclip/modeling/backbone/clip.py:27-237`` wrapping
open_clip's ``convnext_large_d_320`` (timm ConvNeXt trunk + MLP projection
head + CLIP text transformer). This reimplements the three paths FC-CLIP
uses:

- ``extract_features_convnext`` (clip.py:120-130): stem + 4 stages ->
  {stem, res2..res5, clip_vis_dense} feature pyramid (os4..os32),
- ``visual_prediction_forward_convnext`` (clip.py:150-155): pooled mask
  embeddings -> trunk head norm -> CLIP MLP projection -> 768-d CLIP space,
- ``encode_text`` (clip.py:90-102): CLIP text transformer producing the
  open-vocabulary classifier weights from VILD-templated prompts.

TPU-first: NHWC throughout, LayerNorms in f32, depthwise 7x7 via
``feature_group_count`` (XLA maps it onto the VPU/MXU), bf16-capable
compute. All shapes static under jit.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = Any

# convnext_large_d_320 (open_clip): trunk depths/dims, 768-d CLIP embedding
CONVNEXT_LARGE_DEPTHS = (3, 3, 27, 3)
CONVNEXT_LARGE_DIMS = (192, 384, 768, 1536)
CLIP_EMBED_DIM = 768


class ConvNeXtBlock(nn.Module):
    """timm ConvNeXt block: 7x7 depthwise -> LN -> MLP(4x, GELU) -> gamma."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="conv_dw",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        x = x.astype(self.dtype)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(1e-6), (self.dim,), jnp.float32
        )
        return shortcut + x * gamma.astype(x.dtype)


class ConvNeXtStage(nn.Module):
    """Optional (LN -> 2x2/s2 conv) downsample followed by ``depth`` blocks."""

    dim: int
    depth: int
    downsample: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="downsample_norm")(x)
            x = nn.Conv(
                self.dim, (2, 2), strides=2, padding="VALID",
                dtype=self.dtype, name="downsample_conv",
            )(x.astype(self.dtype))
        for i in range(self.depth):
            x = ConvNeXtBlock(self.dim, self.dtype, name=f"block_{i}")(x)
        return x


class ConvNeXtCLIPVisual(nn.Module):
    """ConvNeXt trunk: ``__call__(x)`` -> feature dict
    (extract_features_convnext semantics, clip.py:120-130)."""

    depths: Sequence[int] = CONVNEXT_LARGE_DEPTHS
    dims: Sequence[int] = CONVNEXT_LARGE_DIMS
    embed_dim: int = CLIP_EMBED_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, 3], CLIP-normalized
        out = {}
        x = nn.Conv(
            self.dims[0], (4, 4), strides=4, padding="VALID",
            dtype=self.dtype, name="stem_conv",
        )(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_norm")(x)
        x = x.astype(self.dtype)
        out["stem"] = x  # os4
        for i, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            x = ConvNeXtStage(
                dim, depth, downsample=(i > 0), dtype=self.dtype,
                name=f"stage_{i}",
            )(x)
            out[f"res{i + 2}"] = x  # os4, os8, os16, os32
        # norm_pre is Identity for convnext_large_d (timm head_norm_first=False)
        out["clip_vis_dense"] = x
        return out


class CLIPVisualProjection(nn.Module):
    """[..., trunk_dim] mask-pooled features -> [..., embed_dim] CLIP space.

    visual_prediction_forward_convnext (clip.py:150-155): trunk.head (avg
    pool is trivial on already-pooled vectors -> LayerNorm) followed by the
    open_clip MLP projection head (fc1 -> GELU -> fc2).
    """

    trunk_dim: int = CONVNEXT_LARGE_DIMS[-1]
    embed_dim: int = CLIP_EMBED_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="trunk_head_norm")(pooled)
        y = y.astype(self.dtype)
        # Mlp(prev_chs, hidden=2*embed_dim, out=embed_dim)
        y = nn.Dense(2 * self.embed_dim, dtype=self.dtype, name="head_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.embed_dim, dtype=self.dtype, name="head_fc2")(y)
        return y


class TextAttention(nn.Module):
    """torch nn.MultiheadAttention layout (combined in-proj) with a causal
    mask, as used by the CLIP text transformer."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C, H = self.width, self.heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            b, l, _ = t.shape
            return t.reshape(b, l, H, C // H).transpose(0, 2, 1, 3)

        L = x.shape[1]
        causal = jnp.tril(jnp.ones((L, L), bool))
        attn = jnp.einsum(
            "bhld,bhmd->bhlm",
            split_heads(q) * (1.0 / np.sqrt(C // H)), split_heads(k),
            preferred_element_type=jnp.float32,
        )
        attn = jnp.where(causal, attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, split_heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(x.shape)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class TextBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        x = x + TextAttention(self.width, self.heads, self.dtype, name="attn")(
            y.astype(self.dtype)
        )
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        y = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc1")(
            y.astype(self.dtype)
        )
        # open_clip text tower uses exact GELU
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.width, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class CLIPTextEncoder(nn.Module):
    """CLIP text transformer (open_clip convnext_large_d text cfg: width 768,
    12 heads, 16 layers, vocab 49408, context 77). Returns the un-normalized
    eot-token embedding projected to CLIP space (clip.py:90-102)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    heads: int = 12
    layers: int = 16
    embed_dim: int = CLIP_EMBED_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        # tokens: [B, context_length] int32; eot = argmax (highest token id)
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width), jnp.float32,
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width), jnp.float32,
        )
        x = tok_emb[tokens] + pos_emb[None, : tokens.shape[1]]
        x = x.astype(self.dtype)
        for i in range(self.layers):
            x = TextBlock(self.width, self.heads, self.dtype, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02),
            (self.width, self.embed_dim), jnp.float32,
        )
        return x @ proj
