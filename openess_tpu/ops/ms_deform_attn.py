"""Multi-scale deformable attention sampling (TPU-native).

Reference: the FC-CLIP pixel decoder's CUDA op
``fc-clip/fcclip/modeling/pixel_decoder/ops/src/cuda/ms_deform_im2col_cuda.cuh``
(+ the pure-torch fallback ``ops/functions/ms_deform_attn_func.py:52``):
per (query, head, level, point) a bilinear sample of the value map at a
normalized location, reduced with attention weights.

On TPU this is a batched gather + weighted sum — XLA fuses it; no custom
CUDA needed. Sampling follows torch ``grid_sample(align_corners=False,
padding_mode='zeros')`` semantics exactly:
``pix = ((2*loc - 1) + 1) * size / 2 - 0.5`` with zero contribution from
out-of-range taps.

Shapes (matching the reference op):
  value              [B, L_in, H, D]    flattened multi-level value tokens
  spatial_shapes     [(h_l, w_l), ...]  static python list per level
  sampling_locations [B, L_q, H, levels, P, 2]  in [0, 1] (x, y)
  attention_weights  [B, L_q, H, levels, P]
Returns            [B, L_q, H * D]
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _bilinear_sample_zeros(value_hw: Array, x: Array, y: Array) -> Array:
    """grid_sample-style bilinear taps with zero padding.

    value_hw: [B*, Hh, Ww, D]; x, y: [B*, Q] pixel coords (already in the
    half-pixel convention). Returns [B*, Q, D].
    """
    hh, ww = value_hw.shape[-3], value_hw.shape[-2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < ww) & (yi >= 0) & (yi < hh)
        xi_c = jnp.clip(xi, 0, ww - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, hh - 1).astype(jnp.int32)
        flat = yi_c * ww + xi_c  # [B*, Q]
        v = jnp.take_along_axis(
            value_hw.reshape(value_hw.shape[0], hh * ww, -1),
            flat[..., None],
            axis=1,
        )
        return v * inside[..., None]

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn(
    value: Array,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: Array,
    attention_weights: Array,
) -> Array:
    b, l_in, h, d = value.shape
    _, l_q, _, levels, p, _ = sampling_locations.shape
    assert levels == len(spatial_shapes)

    out = jnp.zeros((b, l_q, h, d), jnp.float32)
    offset = 0
    for li, (hh, ww) in enumerate(spatial_shapes):
        v = value[:, offset : offset + hh * ww]  # [B, hh*ww, H, D]
        offset += hh * ww
        v = v.transpose(0, 2, 1, 3).reshape(b * h, hh, ww, d)

        loc = sampling_locations[:, :, :, li]  # [B, L_q, H, P, 2]
        # grid_sample(align_corners=False) pixel mapping of grid=2*loc-1
        px = loc[..., 0] * ww - 0.5
        py = loc[..., 1] * hh - 0.5
        px = px.transpose(0, 2, 1, 3).reshape(b * h, l_q * p)
        py = py.transpose(0, 2, 1, 3).reshape(b * h, l_q * p)

        sampled = _bilinear_sample_zeros(v.astype(jnp.float32), px, py)
        sampled = sampled.reshape(b, h, l_q, p, d)
        w = attention_weights[:, :, :, li].transpose(0, 2, 1, 3)  # [B, H, L_q, P]
        out = out + jnp.einsum("bhqpd,bhqp->bqhd", sampled, w.astype(jnp.float32))

    return out.reshape(b, l_q, h * d).astype(value.dtype)
