"""FC-CLIP open-vocab labeler: shared builder for the offline PL generator
and the annotation-free zero-shot evaluator.

Reference contracts:
- DSEC: ``fc-clip/demo/generate_pl_dsec.py:104-127`` — 36-class extended
  vocabulary max-pooled onto the 11 DSEC classes.
- DDD17: ``fc-clip/demo/generate_pl_ddd17.py:106-130`` — the SAME 36-class
  vocabulary (demo/predictor.py:121-136) with a 34-entry remap onto the 6
  DDD17 classes; the last two vocabulary entries are simply not remapped
  (the reference loops ``range(len(user_to_ddd17))``), so their logits are
  dropped — mirrored here by truncating the vocabulary scores to the remap
  length.
"""
from __future__ import annotations

import numpy as np

# extended-vocab index -> DSEC class id (generate_pl_dsec.py:104-116)
USER_TO_DSEC = np.array(
    [0,
     1, 1,
     2,
     3, 3, 3, 3, 3,
     4, 4, 4,
     5,
     6,
     7, 7, 7, 7, 7,
     8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8,
     9,
     10, 10, 10]
)

# extended-vocab index -> DDD17 class id (generate_pl_ddd17.py:106-115;
# 34 entries — vocabulary entries 34/35 are unmapped in the reference)
USER_TO_DDD17 = np.array(
    [0, 0,
     1, 1,
     2, 2, 2, 2, 2, 2, 2,
     3, 3, 3, 3, 3,
     4, 4, 4, 4, 4,
     5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5]
)

DATASET_REMAP = {
    "dsec": (USER_TO_DSEC, 11),
    "ddd17": (USER_TO_DDD17, 6),
}


def maxpool_argmax(scores, remap, num_classes):
    """Max-pool extended-vocab scores into dataset classes, then argmax.

    Only the first ``len(remap)`` vocabulary channels participate
    (generate_pl_ddd17.py loops the remap, not the vocabulary)."""
    import jax.numpy as jnp

    out = jnp.full(scores.shape[:-1] + (num_classes,), -jnp.inf, scores.dtype)
    for user_idx in range(len(remap)):
        c = int(remap[user_idx])
        assert 0 <= c < num_classes, (c, num_classes)
        out = out.at[..., c].set(jnp.maximum(out[..., c], scores[..., user_idx]))
    return jnp.argmax(out, axis=-1).astype(jnp.uint8)


def build_fcclip_labeler(fcclip_ckpt: str, bpe_vocab: str, dataset: str):
    """Jitted ``image [B, H, W, 3] in [0,1] -> uint8 labels [B, H, W]``
    running the FC-CLIP meta-arch over the 36-class extended vocabulary and
    max-pooling into ``dataset``'s classes ('dsec' -> 11, 'ddd17' -> 6)."""
    import jax
    import jax.numpy as jnp

    from openess_tpu.models.fcclip import (
        DSEC_USER_CLASSES,
        FCCLIP,
        CLIPTextEncoder,
        SimpleTokenizer,
        convert_fcclip_checkpoint,
        fold_template_embeddings,
        prepare_class_names,
    )

    remap, num_classes = DATASET_REMAP[dataset]

    params, text_params = convert_fcclip_checkpoint(fcclip_ckpt)
    overlap, num_templates, prompts = prepare_class_names(DSEC_USER_CLASSES)

    tok = SimpleTokenizer(bpe_vocab)
    tokens = np.stack([tok(p) for p in prompts]).astype(np.int32)
    encoder = CLIPTextEncoder(dtype=jnp.bfloat16)
    embed = jax.jit(lambda t: encoder.apply({"params": text_params}, t))
    chunks = [
        np.asarray(embed(jnp.asarray(tokens[i : i + 256])))
        for i in range(0, len(tokens), 256)
    ]
    tc = np.asarray(fold_template_embeddings(np.concatenate(chunks, 0)))

    model = FCCLIP(dtype=jnp.bfloat16)
    nt = tuple(num_templates)
    ov = jnp.asarray(overlap)

    @jax.jit
    def infer(img):
        # img [B, H, W, 3] in [0, 1]; FCCLIP expects [0, 255]. The reference
        # pads AFTER pixel-mean/std normalization (detectron2 ImageList zero
        # pad), i.e. effectively with the pixel mean in raw space — match
        # that so border logits agree for non-multiple-of-32 inputs.
        from openess_tpu.models.fcclip.meta import PIXEL_MEAN

        h, w = img.shape[1], img.shape[2]
        ph, pw = (-h) % 32, (-w) % 32
        x = img * 255.0
        mean = jnp.asarray(PIXEL_MEAN, x.dtype)
        x = jnp.pad(x - mean, ((0, 0), (0, ph), (0, pw), (0, 0))) + mean
        sem = model.apply({"params": params}, x, jnp.asarray(tc), nt, ov)
        return maxpool_argmax(sem[:, :h, :w], remap, num_classes)

    return infer, num_classes
