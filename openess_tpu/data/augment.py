"""Paired train-time augmentation, fused into the jitted train step.

Reference semantics (DSEC/dataset/sequence_ov.py:362-440, per sample):
  - p=.5 horizontal flip applied consistently to every spatial tensor
  - p=.5 brightness  * U(0.8, 1.2)  on recon and/or frame (independent draws)
  - p=.5 contrast    * U(0.8, 1.2)  (torchvision adjust_contrast semantics)
  - p=.5 additive N(0, 0.05) noise

The reference runs this on CPU in DataLoader workers; here it is vmapped
per-sample device code inside the train step — zero host work, same math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGE_KEYS = ("recon", "frame")
# spatial tensors: (key, W-axis index within a single sample)
_FLIP_AXES = {
    "event": 3,       # [T, bins, H, W] planar wire format
    "recon": 1,       # [H, W, 3]
    "frame": 1,
    "label": 1,       # [H, W]
    "pl": 1,
    "superpixel": 1,
    "sam_feat": 1,    # [h, w, C]
}


def _adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def _adjust_contrast(img, factor):
    # torchvision: blend with the mean of the grayscale image
    gray = (
        0.2989 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )
    mean = jnp.mean(gray)
    return jnp.clip((img - mean) * factor + mean, 0.0, 1.0)


def _augment_sample(rng, sample: dict) -> dict:
    k_flip, k_b, k_c, k_n = jax.random.split(rng, 4)
    out = dict(sample)

    do_flip = jax.random.uniform(k_flip) >= 0.5
    for key, axis in _FLIP_AXES.items():
        if key in out:
            out[key] = jnp.where(do_flip, jnp.flip(out[key], axis=axis), out[key])

    gates = {}
    for i, name in enumerate(("bright", "contrast", "noise")):
        gates[name] = jax.random.uniform(jax.random.fold_in(k_b, i)) >= 0.5

    for j, key in enumerate(IMAGE_KEYS):
        if key not in out:
            continue
        img = out[key]
        bf = jax.random.uniform(
            jax.random.fold_in(k_b, 100 + j), minval=0.8, maxval=1.2
        )
        img = jnp.where(gates["bright"], _adjust_brightness(img, bf), img)
        cf = jax.random.uniform(
            jax.random.fold_in(k_c, 100 + j), minval=0.8, maxval=1.2
        )
        img = jnp.where(gates["contrast"], _adjust_contrast(img, cf), img)
        noise = 0.05 * jax.random.normal(
            jax.random.fold_in(k_n, 100 + j), img.shape, img.dtype
        )
        img = jnp.where(gates["noise"], img + noise, img)
        out[key] = img
    return out


def augment_batch(rng, batch: dict) -> dict:
    """vmap the per-sample augmentation with independent keys."""
    b = next(iter(batch.values())).shape[0]
    keys = jax.random.split(rng, b)
    return jax.vmap(_augment_sample)(keys, batch)
