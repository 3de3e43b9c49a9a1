"""Torch-semantics spatial resizing for NHWC tensors.

The reference relies on ``F.interpolate`` in three flavors; each has exact
coordinate conventions that matter for weight-converted checkpoints:

- bilinear ``align_corners=False`` (deeplabv3.py:183-184): half-pixel centers.
- bilinear ``align_corners=True``  (image_model.py:123): endpoint-aligned.
- nearest scale_factor=2 (style_networks.py:148): index-floor == pixel repeat.

Implemented as separable gathers with precomputed static index/weight
vectors — cheap, fusion-friendly, and exact for both conventions (unlike
``jax.image.resize`` whose nearest/antialias conventions differ from torch).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _axis_coords(in_size: int, out_size: int, align_corners: bool):
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = np.arange(out_size) * scale
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    return lo, hi, w


def _resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense ``[out, in]`` interpolation matrix (rows sum to 1)."""
    lo, hi, w = _axis_coords(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - w)  # add.at: lo==hi at clipped edges
    np.add.at(m, (rows, hi), w)
    return m


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _resize_core(x: Array, out_h: int, out_w: int, align_corners: bool) -> Array:
    h, w = x.shape[-3], x.shape[-2]
    dt = x.dtype
    xf = x.astype(jnp.float32)

    lo, hi, wy = _axis_coords(h, out_h, align_corners)
    rows = (
        jnp.take(xf, lo, axis=-3) * (1.0 - wy)[:, None, None]
        + jnp.take(xf, hi, axis=-3) * wy[:, None, None]
    )
    lo, hi, wx = _axis_coords(w, out_w, align_corners)
    out = (
        jnp.take(rows, lo, axis=-2) * (1.0 - wx)[:, None]
        + jnp.take(rows, hi, axis=-2) * wx[:, None]
    )
    return out.astype(dt)


def _resize_core_fwd(x, out_h, out_w, align_corners):
    # zero-byte token carrying the static input (H, W) and dtype
    token = jnp.zeros((x.shape[-3], x.shape[-2], 0), x.dtype)
    return _resize_core(x, out_h, out_w, align_corners), token


def _resize_core_bwd(out_h, out_w, align_corners, res, g):
    """Exact separable transpose as two small dense matmuls.

    XLA transposes the forward's gather-lerp chain into per-pixel
    scatter-adds, which serialize on TPU (measured ~45 ms/step in the B8
    flagship teacher upsample backward, incl. forced f32 relayout copies).
    The adjoint of a separable linear resize is itself separable:
    ``g_in = My^T @ g @ Mx`` with tiny banded matrices — a few GFLOP on the
    MXU instead of a 2.2M-element scatter.
    """
    h, w, dtype = res.shape[0], res.shape[1], res.dtype
    g32 = g.astype(jnp.float32)
    hi_p = jax.lax.Precision.HIGHEST
    my = jnp.asarray(_resize_matrix(h, out_h, align_corners))  # [out_h, h]
    mx = jnp.asarray(_resize_matrix(w, out_w, align_corners))  # [out_w, w]
    # contract the axis whose reduction shrinks the tensor more first
    cost_h_first = out_w * h * out_h + h * w * out_w
    cost_w_first = out_h * w * out_w + h * w * out_h
    if cost_h_first <= cost_w_first:
        gh = jnp.einsum("...hwc,hu->...uwc", g32, my, precision=hi_p)
        gi = jnp.einsum("...uwc,wv->...uvc", gh, mx, precision=hi_p)
    else:
        gw = jnp.einsum("...hwc,wv->...hvc", g32, mx, precision=hi_p)
        gi = jnp.einsum("...hvc,hu->...uvc", gw, my, precision=hi_p)
    return (gi.astype(dtype),)


_resize_core.defvjp(_resize_core_fwd, _resize_core_bwd)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "align_corners"))
def resize_bilinear(
    x: Array, *, out_h: int, out_w: int, align_corners: bool = False
) -> Array:
    """Bilinear resize of ``[..., H, W, C]`` to ``[..., out_h, out_w, C]``.

    Matches torch ``F.interpolate(mode='bilinear')`` for both
    ``align_corners`` settings. Reverse-mode only: the ``jax.custom_vjp``
    underneath (whose transpose is the exact [out, in]->[in, out] matrix
    product instead of a scatter) means ``jax.jvp``/``jacfwd`` through this
    op raises; nothing in the repo uses forward-mode AD.
    """
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    return _resize_core(x, out_h, out_w, align_corners)


def upsample2x_nearest(x: Array) -> Array:
    """Exact torch ``interpolate(scale_factor=2, mode='nearest')`` (pixel repeat)."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_nearest(x: Array, *, out_h: int, out_w: int) -> Array:
    """Torch legacy 'nearest' (index floor) for arbitrary sizes."""
    h, w = x.shape[-3], x.shape[-2]
    iy = np.floor(np.arange(out_h) * (h / out_h)).astype(np.int32)
    ix = np.floor(np.arange(out_w) * (w / out_w)).astype(np.int32)
    return jnp.take(jnp.take(x, iy, axis=-3), ix, axis=-2)
