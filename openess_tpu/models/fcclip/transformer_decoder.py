"""FC-CLIP mask2former-style transformer decoder (TPU-native flax).

Reference: ``fc-clip/fcclip/modeling/transformer_decoder/
fcclip_transformer_decoder.py:57-519`` — MaskPooling (:57-82),
get_classification_logits (:38-54), MultiScaleMaskedTransformerDecoder
(:275-519): 9 (cross-attn -> self-attn -> FFN) layers over 250 learnable
queries cycling through the 3 pixel-decoder scales, with masked
cross-attention driven by the previous layer's mask predictions.

TPU-first: NHWC mask features, attention logits in f32, static 9-layer
unroll (inference path — XLA pipelines the per-layer matmuls on the MXU);
the ``num_templates`` class-synonym grouping is static python.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from openess_tpu.models.fcclip.pixel_decoder import position_embedding_sine
from openess_tpu.ops.resize import resize_bilinear

Array = Any


def get_classification_logits(x, text_classifier, logit_scale, num_templates):
    """fcclip_transformer_decoder.py:38-54. x [B, *, C]; text_classifier
    [R, C] rows = synonym-templated class embeddings + final void row;
    num_templates = static group sizes per output class. Returns
    [B, *, num_classes + 1] (last = void)."""
    x = x * jax.lax.rsqrt(
        jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-24
    )
    tc = text_classifier * jax.lax.rsqrt(
        jnp.sum(jnp.square(text_classifier), axis=-1, keepdims=True) + 1e-24
    )
    scale = jnp.minimum(jnp.exp(logit_scale), 100.0)
    logits = scale * (x @ tc.T)  # [B, *, R]
    groups = []
    cur = 0
    for n in num_templates:
        groups.append(jnp.max(logits[..., cur : cur + n], axis=-1))
        cur += n
    groups.append(logits[..., -1])  # void
    return jnp.stack(groups, axis=-1)


def mask_pooling(x, mask):
    """MaskPooling (fcclip_transformer_decoder.py:57-82): binary-mask mean
    pooling. x [B, H, W, C] NHWC; mask [B, Q, h, w] logits (resized to x if
    needed). Returns [B, Q, C]."""
    H, W = x.shape[1], x.shape[2]
    if mask.shape[-2:] != (H, W):
        m = mask.transpose(0, 2, 3, 1)  # [B, h, w, Q]
        m = resize_bilinear(m, out_h=H, out_w=W, align_corners=False)
        mask = m.transpose(0, 3, 1, 2)
    mask = jax.lax.stop_gradient((mask > 0).astype(jnp.float32))
    denorm = jnp.sum(mask, axis=(-1, -2), keepdims=True) + 1e-8
    return jnp.einsum(
        "bhwc,bqhw->bqc", x.astype(jnp.float32), mask / denorm
    )


class TorchMultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention layout (combined in_proj over [q;k;v])
    with optional boolean attn_mask [B, H, Q, L] (True = blocked)."""

    d_model: int
    n_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None):
        C, H = self.d_model, self.n_heads
        # torch packs the q/k/v projections in one [C, 3C] in_proj (converted
        # weights drop straight in); apply each stream's slice only — q/k/v
        # may be different tensors and the unused slices are not free
        kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (C, 3 * C),
            jnp.float32,
        ).astype(self.dtype)
        bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * C,), jnp.float32
        ).astype(self.dtype)
        qh = q @ kernel[:, :C] + bias[:C]
        kh = k @ kernel[:, C : 2 * C] + bias[C : 2 * C]
        vh = v @ kernel[:, 2 * C :] + bias[2 * C :]

        def split(t):
            b, l, _ = t.shape
            return t.reshape(b, l, H, C // H).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhld->bhql",
            split(qh) * (1.0 / np.sqrt(C // H)), split(kh),
            preferred_element_type=jnp.float32,
        )
        if attn_mask is not None:
            logits = jnp.where(attn_mask, -jnp.inf, logits)
        w = jax.nn.softmax(logits, axis=-1)
        # torch: rows that are fully masked produce NaN; the reference
        # pre-clears all-blocked rows (decoder:450) so this path never NaNs,
        # but guard anyway for numerical safety under bf16
        w = jnp.nan_to_num(w).astype(vh.dtype)
        out = jnp.einsum("bhql,bhld->bhqd", w, split(vh))
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class MLP(nn.Module):
    """3-layer relu MLP (fcclip_transformer_decoder.py:259-271)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layer_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class FCCLIPTransformerDecoder(nn.Module):
    """MultiScaleMaskedTransformerDecoder, inference path.

    ``__call__(multi_scale_features, mask_features, text_classifier,
    num_templates)`` -> {"pred_logits": [B, Q, K+1], "pred_masks":
    [B, Q, h4, w4]}.
    """

    hidden_dim: int = 256
    num_queries: int = 250
    n_heads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9  # DEC_LAYERS 10 - 1
    mask_dim: int = 256
    clip_embedding_dim: int = 768
    num_feature_levels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_features, text_classifier, num_templates):
        # x: list of NHWC features [os32, os16, os8]; mask_features NHWC os4
        assert len(x) == self.num_feature_levels
        C = self.hidden_dim
        B = x[0].shape[0]

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, C), jnp.float32,
        )
        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, C),
            jnp.float32,
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, C),
            jnp.float32,
        )

        srcs, poss, sizes = [], [], []
        for i in range(self.num_feature_levels):
            h, w = x[i].shape[1], x[i].shape[2]
            sizes.append((h, w))
            # input_proj is identity (in_channels == hidden_dim, no enforce)
            srcs.append(
                (x[i].reshape(B, h * w, C) + level_embed[i][None, None]).astype(
                    self.dtype
                )
            )
            pos = position_embedding_sine(h, w, C // 2).reshape(1, h * w, C)
            poss.append(jnp.broadcast_to(pos, (B, h * w, C)).astype(self.dtype))

        decoder_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="decoder_norm"
        )
        mask_embed = MLP(C, self.mask_dim, dtype=self.dtype, name="mask_embed")
        pool_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="mask_pooling_proj_norm"
        )
        pool_dense = nn.Dense(C, dtype=self.dtype, name="mask_pooling_proj_dense")
        class_embed = MLP(
            C, self.clip_embedding_dim, dtype=self.dtype, name="class_embed"
        )
        logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(float(np.log(1.0 / 0.07))), (), jnp.float32,
        )

        def prediction_heads(output, target_size):
            dec = decoder_norm(output)  # [B, Q, C] f32
            me = mask_embed(dec.astype(self.dtype))
            outputs_mask = jnp.einsum(
                "bqc,bhwc->bqhw", me.astype(jnp.float32),
                mask_features.astype(jnp.float32),
            )
            pooled = mask_pooling(mask_features, outputs_mask)
            pooled = pool_dense(pool_norm(pooled).astype(self.dtype))
            ce = class_embed((pooled + dec).astype(self.dtype))
            outputs_class = get_classification_logits(
                ce.astype(jnp.float32), text_classifier.astype(jnp.float32),
                logit_scale, num_templates,
            )
            # attention mask for the next layer (decoder:498-504)
            th, tw = target_size
            am = outputs_mask.transpose(0, 2, 3, 1)
            am = resize_bilinear(am, out_h=th, out_w=tw, align_corners=False)
            am = am.transpose(0, 3, 1, 2).reshape(B, self.num_queries, th * tw)
            am = jax.nn.sigmoid(am) < 0.5  # True = blocked
            return outputs_class, outputs_mask, am

        output = jnp.broadcast_to(
            query_feat[None], (B, self.num_queries, C)
        ).astype(self.dtype)
        qe = jnp.broadcast_to(
            query_embed[None], (B, self.num_queries, C)
        ).astype(self.dtype)

        outputs_class, outputs_mask, attn_mask = prediction_heads(
            output, sizes[0]
        )
        for i in range(self.dec_layers):
            li = i % self.num_feature_levels
            # un-block queries whose mask is entirely blocked (decoder:450)
            all_blocked = jnp.all(attn_mask, axis=-1, keepdims=True)
            am = jnp.where(all_blocked, False, attn_mask)
            am = jnp.broadcast_to(
                am[:, None], (B, self.n_heads, self.num_queries, am.shape[-1])
            )

            # cross-attention first (decoder:452-457)
            ca = TorchMultiheadAttention(
                C, self.n_heads, self.dtype, name=f"cross_attn_{i}"
            )
            y = ca(output + qe, srcs[li] + poss[li], srcs[li], attn_mask=am)
            output = output + y
            output = nn.LayerNorm(
                epsilon=1e-5, dtype=jnp.float32, name=f"cross_norm_{i}"
            )(output).astype(self.dtype)

            sa = TorchMultiheadAttention(
                C, self.n_heads, self.dtype, name=f"self_attn_{i}"
            )
            y = sa(output + qe, output + qe, output)
            output = output + y
            output = nn.LayerNorm(
                epsilon=1e-5, dtype=jnp.float32, name=f"self_norm_{i}"
            )(output).astype(self.dtype)

            # FFN (relu, dropout 0)
            y = nn.Dense(
                self.dim_feedforward, dtype=self.dtype, name=f"ffn_linear1_{i}"
            )(output)
            y = nn.relu(y)
            y = nn.Dense(C, dtype=self.dtype, name=f"ffn_linear2_{i}")(y)
            output = output + y
            output = nn.LayerNorm(
                epsilon=1e-5, dtype=jnp.float32, name=f"ffn_norm_{i}"
            )(output).astype(self.dtype)

            outputs_class, outputs_mask, attn_mask = prediction_heads(
                output, sizes[(i + 1) % self.num_feature_levels]
            )

        return {"pred_logits": outputs_class, "pred_masks": outputs_mask}
