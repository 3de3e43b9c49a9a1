"""Superpixel segment-mean pooling — the F2E distillation hot op.

The reference pools per-pixel features into per-superpixel means with a sparse
COO one-hot matmul on GPU (``training/pretrain_trainer.py:487-507``). The
TPU-native forms here:

- :func:`segment_mean_pool`        — ``jax.ops.segment_sum`` reference impl.
- :func:`segment_mean_pool_pallas` — MXU kernel: the one-hot is materialized
  on the fly per pixel-chunk in VMEM and contracted with the feature chunk on
  the systolic array, accumulating ``[num_segments, D]`` partial sums. This
  turns a 2M-element scatter (serialized on TPU) into a dense chunked matmul.

Both return ``(means, counts)`` where ``means = sums / (counts + eps)``,
matching the reference's ``+1e-6`` denominator. Empty segments yield zero
rows exactly as in the reference.

Inputs are NHWC: ``feats [B, H, W, D]``, ``seg_ids [B, H, W]`` with values in
``[0, segments_per_image)``; batch offsets are applied internally
(reference: pretrain_trainer.py:487-490).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _flatten_with_batch_offset(
    feats: Array, seg_ids: Array, segments_per_image: int,
    pixel_order: str = "bhw",
):
    """Flatten to ``([N, D], [N])`` pixel rows + global segment ids.

    ``pixel_order="hwb"`` enumerates pixels H-major/B-minor instead of
    row-major: segment sums are order-invariant, but on TPU the conv
    outputs feeding the pool carry an H-major physical layout
    (``{3,0,2,1}``), so flattening in that order lets XLA lower the
    transpose to a free bitcast instead of a full-tensor relayout copy
    (~3.5 ms per 8x440x640x256 bf16 tensor on v5e, docs/ROOFLINE.md).
    """
    b, h, w, d = feats.shape
    if pixel_order == "hwb":
        feats = jnp.transpose(feats, (1, 2, 0, 3))  # [H, W, B, D]
        offsets = (jnp.arange(b, dtype=seg_ids.dtype) * segments_per_image)
        ids = jnp.transpose(seg_ids, (1, 2, 0)) + offsets  # [H, W, B]
    else:
        offsets = (
            jnp.arange(b, dtype=seg_ids.dtype) * segments_per_image
        )[:, None, None]
        ids = seg_ids + offsets
    ids_flat = ids.reshape(-1)
    feats_flat = feats.reshape(-1, d)
    return feats_flat, ids_flat, b * segments_per_image


@functools.partial(
    jax.jit, static_argnames=("segments_per_image", "pixel_order")
)
def segment_mean_pool(
    feats: Array, seg_ids: Array, *, segments_per_image: int,
    eps: float = 1e-6, pixel_order: str = "bhw",
) -> tuple[Array, Array]:
    """segment_sum reference implementation (XLA scatter-add)."""
    feats_flat, ids_flat, num_segments = _flatten_with_batch_offset(
        feats, seg_ids, segments_per_image, pixel_order
    )
    sums = jax.ops.segment_sum(feats_flat, ids_flat, num_segments=num_segments)
    counts = jax.ops.segment_sum(
        jnp.ones((ids_flat.shape[0],), feats_flat.dtype),
        ids_flat,
        num_segments=num_segments,
    )
    means = sums / (counts[:, None] + eps)
    return means, counts


def _pool_kernel(
    ids_ref, feats_ref, sums_ref, counts_ref, *, num_segments: int, precision
):
    """One grid step: accumulate one pixel-chunk's one-hot.T @ feats on the MXU."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)

    ids = ids_ref[:]  # [chunk, 1] int32
    chunk = ids.shape[0]
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, num_segments), 1)
    onehot = (ids == seg_iota).astype(jnp.float32)  # [chunk, S]
    feats = feats_ref[:].astype(jnp.float32)  # [chunk, D]
    sums_ref[:] += jax.lax.dot_general(
        onehot,
        feats,
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract over chunk
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    counts_ref[:] += jnp.sum(onehot, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _pallas_pool_sums(feats_p, ids_p, s_pad: int, chunk: int, precision):
    """(sums [s_pad, D], counts [s_pad]) via chunked MXU one-hot matmul.

    Custom VJP: the transpose of segment-sum over features is a gather —
    ``g_feats[pixel] = g_sums[seg_id[pixel]]`` — so the backward pass is one
    cheap ``take`` instead of differentiating through the kernel.
    """
    n_pad, d = feats_p.shape
    grid = n_pad // chunk
    sums, counts = pl.pallas_call(
        functools.partial(_pool_kernel, num_segments=s_pad, precision=precision),
        # CPU (tests / virtual meshes) only supports the interpreter
        interpret=jax.default_backend() == "cpu",
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((s_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
        ),
    )(ids_p, feats_p)
    return sums, counts[0]


def _pallas_pool_sums_fwd(feats_p, ids_p, s_pad, chunk, precision):
    out = _pallas_pool_sums(feats_p, ids_p, s_pad, chunk, precision)
    # dtype-carrying empty residual so bwd can match the primal feats dtype
    return out, (ids_p, jnp.zeros((0,), feats_p.dtype))


def _pallas_pool_sums_bwd(s_pad, chunk, precision, res, cotangents):
    ids_p, dtype_token = res
    g_sums, _g_counts = cotangents  # counts are feats-independent
    # Cast the small [s_pad, D] cotangent BEFORE the full-resolution gather:
    # taking in f32 materialized an f32 [B*H*W, D] tensor (+ its relayout
    # copies, ~7 ms each on v5e per ROOFLINE.md) that was immediately
    # rounded to bf16 anyway.
    g_feats = jnp.take(
        g_sums.astype(dtype_token.dtype), ids_p[:, 0], axis=0
    )
    return g_feats, None


_pallas_pool_sums.defvjp(_pallas_pool_sums_fwd, _pallas_pool_sums_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("segments_per_image", "chunk", "precision",
                     "pixel_order"),
)
def segment_mean_pool_pallas(
    feats: Array,
    seg_ids: Array,
    *,
    segments_per_image: int,
    eps: float = 1e-6,
    chunk: int = 1024,
    precision=None,
    pixel_order: str = "bhw",
) -> tuple[Array, Array]:
    """MXU one-hot-matmul pooling. Same contract as :func:`segment_mean_pool`.

    Pixels whose padded tail falls past B*H*W are redirected to a sentinel
    row that is sliced off, so arbitrary (non-chunk-multiple) sizes work.
    Differentiable wrt ``feats`` (custom VJP: gather of the segment grads).

    ``precision=None`` uses the fast MXU path (bf16 multiplicands, f32
    accumulation — plenty for the contrastive loss); pass
    ``jax.lax.Precision.HIGHEST`` for f32-exact sums.
    """
    feats_flat, ids_flat, num_segments = _flatten_with_batch_offset(
        feats, seg_ids, segments_per_image, pixel_order
    )
    n, d = feats_flat.shape
    # Clamp the chunk so the double-buffered feats block stays well inside
    # VMEM (measured: chunk*d*4 > ~2 MB triggers scoped-vmem OOM on v5e).
    chunk = max(128, min(chunk, (2 * 1024 * 1024) // max(d * 4, 1)))
    # Pad segments to the lane width; pad pixels to the chunk size with a
    # sentinel segment id pointing at the padded region.
    s_pad = max(128, ((num_segments + 1 + 127) // 128) * 128)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad == n:
        # zero-copy fast path (production shapes are chunk-aligned)
        ids_p = ids_flat.astype(jnp.int32)[:, None]
        feats_p = feats_flat
    else:
        ids_p = jnp.full((n_pad, 1), num_segments, jnp.int32)
        ids_p = ids_p.at[:n, 0].set(ids_flat.astype(jnp.int32))
        # keep the (large) feature tensor in its input dtype — upcasting to
        # f32 here would double the HBM stream; the kernel accumulates f32.
        feats_p = jnp.zeros((n_pad, d), feats_flat.dtype).at[:n].set(feats_flat)

    chunk = min(chunk, n_pad)
    sums, counts = _pallas_pool_sums(feats_p, ids_p, s_pad, chunk, precision)
    sums = sums[:num_segments]
    counts = counts[:num_segments]
    means = sums / (counts[:, None] + eps)
    return means.astype(feats.dtype), counts.astype(feats.dtype)
