"""FC-CLIP panoptic / instance inference (TPU-native, jittable).

Reference: ``fc-clip/fcclip/fcclip.py:468-524`` (``panoptic_inference``) and
``:526-568`` (``instance_inference``). The reference mutates a canvas in a
data-dependent Python loop over queries; here the same semantics are
expressed with static shapes — the query loop becomes a ``lax.scan`` that
assigns segment ids (stuff classes merge into their first segment), and the
canvas is a sum of disjoint argmax-winner masks. Filtered entries come back
as validity flags instead of ragged lists, so the whole thing jits.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Array = Any


class PanopticResult(NamedTuple):
    panoptic_seg: Array   # [H, W] int32 segment ids (0 = unassigned)
    segment_id: Array     # [Q] int32 id per query (0 = none)
    category: Array       # [Q] int32 predicted class per query
    isthing: Array        # [Q] bool
    info_valid: Array     # [Q] bool — True where a NEW segments_info entry
    #                       was emitted (stuff reuses suppress duplicates)


def panoptic_inference(
    mask_cls: Array,
    mask_pred: Array,
    thing_mask: Array,
    *,
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
) -> PanopticResult:
    """Single-image panoptic segmentation (fcclip.py:468-524).

    Args:
      mask_cls:  [Q, K+1] class logits (last column = void).
      mask_pred: [Q, H, W] mask logits.
      thing_mask: bool [K] — True for "thing" classes (the reference's
        ``thing_dataset_id_to_contiguous_id`` membership test).
    """
    num_classes = mask_cls.shape[-1] - 1
    probs = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1)
    keep = (labels != num_classes) & (scores > object_mask_threshold)

    sig = jax.nn.sigmoid(mask_pred.astype(jnp.float32))  # [Q, H, W]
    # non-kept queries can never win the argmax (reference indexes the kept
    # subset; -inf reproduces that with static shapes — applied via where,
    # not multiplication, so sig == 0 cells don't produce NaNs)
    prob_masks = jnp.where(
        keep[:, None, None], scores[:, None, None] * sig, -jnp.inf
    )
    # with no kept query, argmax over all -inf returns 0 but `keep[0]` is
    # False, so `valid` below is all-False and the canvas stays empty
    mask_ids = jnp.argmax(prob_masks, axis=0)  # [H, W]

    q = mask_cls.shape[0]
    qi = jnp.arange(q)
    win = mask_ids[None] == qi[:, None, None]          # [Q, H, W]
    binary = sig >= 0.5
    seg_mask = win & binary
    mask_area = jnp.sum(win, axis=(1, 2))
    orig_area = jnp.sum(binary, axis=(1, 2))
    bin_area = jnp.sum(seg_mask, axis=(1, 2))
    ratio = mask_area / jnp.maximum(orig_area, 1)
    valid = (
        keep & (mask_area > 0) & (orig_area > 0) & (bin_area > 0)
        & (ratio >= overlap_threshold)
    )

    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    isthing = jnp.asarray(thing_mask)[safe_labels] & valid

    def body(carry, inp):
        next_id, stuff_ids = carry
        v, cls, thing = inp
        reuse = (stuff_ids[cls] > 0) & ~thing
        new_id = jnp.where(
            v, jnp.where(reuse, stuff_ids[cls], next_id + 1), 0
        )
        fresh = v & ~reuse
        next_id = jnp.where(fresh, next_id + 1, next_id)
        stuff_ids = jnp.where(
            fresh & ~thing,
            stuff_ids.at[cls].set(new_id),
            stuff_ids,
        )
        return (next_id, stuff_ids), (new_id, fresh)

    (_, _), (seg_ids, fresh) = jax.lax.scan(
        body,
        (jnp.asarray(0, jnp.int32), jnp.zeros(num_classes, jnp.int32)),
        (valid, safe_labels.astype(jnp.int32), isthing),
    )

    canvas = jnp.sum(
        seg_ids[:, None, None] * seg_mask.astype(jnp.int32), axis=0
    ).astype(jnp.int32)
    return PanopticResult(
        panoptic_seg=canvas,
        segment_id=seg_ids.astype(jnp.int32),
        category=safe_labels.astype(jnp.int32),
        isthing=isthing,
        info_valid=fresh,
    )


class InstanceResult(NamedTuple):
    pred_masks: Array   # [topk, H, W] float32 binary masks
    pred_classes: Array  # [topk] int32
    scores: Array        # [topk] float32 (cls score x mean mask prob)
    valid: Array         # [topk] bool (False = filtered non-thing when
    #                      panoptic_on; reference drops these rows)


def instance_inference(
    mask_cls: Array,
    mask_pred: Array,
    *,
    topk: int,
    thing_mask: Array | None = None,
) -> InstanceResult:
    """Single-image instance segmentation (fcclip.py:526-568).

    ``thing_mask`` (bool [K]) enables the panoptic_on filtering of
    non-thing detections; the reference drops those rows, here they come
    back with ``valid=False``.
    """
    num_classes = mask_cls.shape[-1] - 1
    q = mask_cls.shape[0]
    scores = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)[:, :-1]
    flat = scores.reshape(-1)  # [Q * K]
    top_scores, top_idx = jax.lax.top_k(flat, topk)
    labels = top_idx % num_classes
    query = top_idx // num_classes

    masks = mask_pred[query].astype(jnp.float32)  # [topk, H, W]
    binary = (masks > 0).astype(jnp.float32)
    mask_scores = jnp.sum(jax.nn.sigmoid(masks) * binary, axis=(1, 2)) / (
        jnp.sum(binary, axis=(1, 2)) + 1e-6
    )
    final = top_scores * mask_scores
    if thing_mask is not None:
        valid = jnp.asarray(thing_mask)[labels]
    else:
        valid = jnp.ones_like(labels, bool)
    return InstanceResult(
        pred_masks=binary,
        pred_classes=labels.astype(jnp.int32),
        scores=final,
        valid=valid,
    )
