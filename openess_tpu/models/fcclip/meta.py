"""FC-CLIP meta-architecture: open-vocabulary semantic inference.

Reference: ``fc-clip/fcclip/fcclip.py`` — VILD prompt ensemble (:26-41),
class-name preparation with synonym splitting + category-overlap mask
(:139-179), text-classifier assembly (:186-218), the in/out-vocabulary
geometric ensemble (:345-402) and semantic inference (:463-467).

The heavy pieces (ConvNeXt trunk, pixel decoder, transformer decoder) are
separate flax modules; :class:`FCCLIP` composes them into one parameter tree
so a converted released checkpoint loads as a single dict, and ``__call__``
is one jittable image -> per-pixel-class-probability map.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from openess_tpu.models.fcclip.backbone import (
    CLIP_EMBED_DIM,
    CLIPVisualProjection,
    ConvNeXtCLIPVisual,
)
from openess_tpu.models.fcclip.pixel_decoder import MSDeformAttnPixelDecoder
from openess_tpu.models.fcclip.transformer_decoder import (
    FCCLIPTransformerDecoder,
    get_classification_logits,
    mask_pooling,
)
from openess_tpu.ops.resize import resize_bilinear

Array = Any

# fcclip.py:26-41
VILD_PROMPT = (
    "a photo of a {}.",
    "This is a photo of a {}",
    "There is a {} in the scene",
    "There is the {} in the scene",
    "a photo of a {} in the scene",
    "a photo of a small {}.",
    "a photo of a medium {}.",
    "a photo of a large {}.",
    "This is a photo of a small {}.",
    "This is a photo of a medium {}.",
    "This is a photo of a large {}.",
    "There is a small {} in the scene.",
    "There is a medium {} in the scene.",
    "There is a large {} in the scene.",
)

# CLIP pixel statistics (config: PIXEL_MEAN/STD, RGB order)
PIXEL_MEAN = (122.7709383, 116.7460125, 104.09373615)
PIXEL_STD = (68.5005327, 66.6321579, 70.32316305)

# The 36-class user vocabulary the OpenESS pseudo-labels are generated with
# (demo/predictor.py:121-136); groups of synonyms map onto the 11 DSEC
# classes via the max-logit remap in the PL tool.
DSEC_USER_CLASSES = (
    "sky",
    "building", "house",
    "fence",
    "person", "pedestrian", "walking people", "standing people",
    "sitting people",
    "pole", "traffic sign pole", "light pole",
    "road",
    "sidewalk",
    "vegetation", "tree", "tree trunk", "woods",
    "grass",
    "car", "jeep", "SUV", "van", "caravan", "truck", "trailer",
    "bus", "train", "tram", "motorcycle", "scooter", "bicycle",
    "wall",
    "traffic-sign", "parking-sign", "direction-sign",
)

# Plain COCO-panoptic-133 category names, used as the default training
# vocabulary for the category-overlap (seen/unseen) test. The reference uses
# the openseg prompt-engineered variant (fcclip/data/datasets/
# openseg_classes.py — NOT vendored in the OpenESS snapshot); pass
# ``train_class_names`` explicitly to reproduce it exactly.
COCO_PANOPTIC_CLASSES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush", "banner",
    "blanket", "bridge", "cardboard", "counter", "curtain", "door-stuff",
    "floor-wood", "flower", "fruit", "gravel", "house", "light",
    "mirror-stuff", "net", "pillow", "platform", "playingfield", "railroad",
    "river", "road", "roof", "sand", "sea", "shelf", "snow", "stairs",
    "tent", "towel", "wall-brick", "wall-stone", "wall-tile", "wall-wood",
    "water-other", "window-blind", "window-other", "tree-merged",
    "fence-merged", "ceiling-merged", "sky-other-merged", "cabinet-merged",
    "table-merged", "floor-other-merged", "pavement-merged",
    "mountain-merged", "grass-merged", "dirt-merged", "paper-merged",
    "food-other-merged", "building-other-merged", "rock-merged",
    "wall-other-merged", "rug-merged",
)


def split_synonyms(class_names: Sequence[str]):
    """fcclip.py:140-146: each entry may hold comma-separated synonyms."""
    return [n.replace(", ", ",").split(",") for n in class_names]


def prepare_class_names(
    class_names: Sequence[str],
    train_class_names: Sequence[str] = COCO_PANOPTIC_CLASSES,
):
    """fcclip.py:139-179. Returns (category_overlapping_mask [K],
    num_templates [K] synonym counts, templated prompt list of
    len sum(num_templates) * len(VILD_PROMPT))."""
    groups = split_synonyms(class_names)
    train_set = {s for n in split_synonyms(train_class_names) for s in n}
    overlap = np.array(
        [int(not train_set.isdisjoint(set(g))) for g in groups], np.int32
    )
    num_templates = [len(g) for g in groups]
    prompts = [
        t.format(syn) for g in groups for syn in g for t in VILD_PROMPT
    ]
    return overlap, num_templates, prompts


def fold_template_embeddings(embeddings: Array) -> Array:
    """fcclip.py:196-199: [R * len(VILD_PROMPT), C] raw text embeddings ->
    [R, C] classifier rows (normalize -> mean over templates ->
    normalize)."""
    e = embeddings / jnp.linalg.norm(embeddings, axis=-1, keepdims=True)
    e = e.reshape(-1, len(VILD_PROMPT), e.shape[-1]).mean(axis=1)
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True)


class FCCLIP(nn.Module):
    """Inference meta-arch: image [B, H, W, 3] in [0, 255] RGB ->
    per-pixel class probabilities [B, H, W, K] (semantic_inference output,
    fcclip.py:463-467, channels-last).

    ``text_classifier`` is the [R, embed_dim] folded class matrix (see
    :func:`fold_template_embeddings`); the void row is appended internally
    from the checkpoint's ``void_embedding``. ``num_templates`` and
    ``category_overlap`` come from :func:`prepare_class_names`.
    """

    geometric_ensemble_alpha: float = 0.4
    geometric_ensemble_beta: float = 0.8
    # architecture dims: defaults are the released convnext_large_d_320
    # FC-CLIP; overridable for small test instantiations
    trunk_depths: Any = None
    trunk_dims: Any = None
    clip_embed_dim: int = CLIP_EMBED_DIM
    conv_dim: int = 256
    mask_dim: int = 256
    num_queries: int = 250
    dec_layers: int = 9
    enc_layers: int = 6
    n_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, text_classifier, num_templates, category_overlap):
        from openess_tpu.models.fcclip.backbone import (
            CONVNEXT_LARGE_DEPTHS,
            CONVNEXT_LARGE_DIMS,
        )

        depths = self.trunk_depths or CONVNEXT_LARGE_DEPTHS
        dims = self.trunk_dims or CONVNEXT_LARGE_DIMS
        mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
        std = jnp.asarray(PIXEL_STD, jnp.float32)
        x = (image.astype(jnp.float32) - mean) / std

        visual = ConvNeXtCLIPVisual(
            depths=tuple(depths), dims=tuple(dims),
            embed_dim=self.clip_embed_dim, dtype=self.dtype, name="visual",
        )
        projection = CLIPVisualProjection(
            trunk_dim=dims[-1], embed_dim=self.clip_embed_dim,
            dtype=self.dtype, name="visual_proj",
        )
        pixel_decoder = MSDeformAttnPixelDecoder(
            in_channels=tuple(dims), conv_dim=self.conv_dim,
            mask_dim=self.mask_dim, n_heads=self.n_heads,
            enc_layers=self.enc_layers, dtype=self.dtype,
            name="pixel_decoder",
        )
        decoder = FCCLIPTransformerDecoder(
            hidden_dim=self.conv_dim, num_queries=self.num_queries,
            n_heads=self.n_heads, dec_layers=self.dec_layers,
            mask_dim=self.mask_dim, clip_embedding_dim=self.clip_embed_dim,
            dtype=self.dtype, name="decoder",
        )
        void_embedding = self.param(
            "void_embedding", nn.initializers.normal(0.02),
            (1, self.clip_embed_dim), jnp.float32,
        )
        clip_logit_scale = self.param(
            "clip_logit_scale",
            nn.initializers.constant(float(np.log(1.0 / 0.07))), (),
            jnp.float32,
        )

        features = visual(x)
        tc = jnp.concatenate(
            [
                text_classifier,
                void_embedding
                / jnp.linalg.norm(void_embedding, axis=-1, keepdims=True),
            ],
            axis=0,
        )

        mask_features, ms_feats = pixel_decoder(features)
        out = decoder(ms_feats, mask_features, tc, num_templates)
        mask_cls = out["pred_logits"].astype(jnp.float32)  # [B, Q, K+1]
        mask_pred = out["pred_masks"].astype(jnp.float32)  # [B, Q, h4, w4]

        # ---- in/out-vocabulary geometric ensemble (fcclip.py:345-402) ----
        clip_dense = features["clip_vis_dense"]
        pooled = mask_pooling(clip_dense, mask_pred)  # resizes mask to os32
        pooled = projection(pooled.astype(self.dtype)).astype(jnp.float32)
        out_vocab = get_classification_logits(
            pooled, tc.astype(jnp.float32), clip_logit_scale, num_templates
        )
        in_vocab_probs = jax.nn.softmax(mask_cls[..., :-1], axis=-1)
        out_vocab_probs = jax.nn.softmax(out_vocab[..., :-1], axis=-1)

        overlap = category_overlap.astype(jnp.float32)  # [K]
        alpha, beta = self.geometric_ensemble_alpha, self.geometric_ensemble_beta
        seen = jnp.log(
            in_vocab_probs ** (1 - alpha) * out_vocab_probs**alpha + 1e-30
        ) * overlap
        unseen = jnp.log(
            in_vocab_probs ** (1 - beta) * out_vocab_probs**beta + 1e-30
        ) * (1 - overlap)
        cls_results = seen + unseen

        is_void = jax.nn.softmax(mask_cls, axis=-1)[..., -1:]
        probs = jnp.concatenate(
            [jax.nn.softmax(cls_results, axis=-1) * (1.0 - is_void), is_void],
            axis=-1,
        )
        mask_cls = jnp.log(probs + 1e-8)

        # upsample masks to the input resolution (fcclip.py:404-410)
        H, W = image.shape[1], image.shape[2]
        m = mask_pred.transpose(0, 2, 3, 1)
        m = resize_bilinear(m, out_h=H, out_w=W, align_corners=False)

        # semantic inference (fcclip.py:463-467), channels-last
        sem = jnp.einsum(
            "bqk,bhwq->bhwk",
            jax.nn.softmax(mask_cls, axis=-1)[..., :-1],
            jax.nn.sigmoid(m),
        )
        return sem
