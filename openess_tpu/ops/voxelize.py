"""Event-stream -> dense representation kernels (jit-compiled, TPU-native).

Replaces the reference's host-side per-sample converters with fused device ops:

- :func:`voxel_grid_trilinear`  — DSEC-style signed trilinear (x, y, t) voxel
  grid; semantics of ``DSEC/dataset/representations.py:15-53`` (torch ``put_``
  scatter-add with 8-corner interpolation, polarity values ±1).
- :func:`voxel_grid_bilinear_t` — DDD17/E2VID-style voxel grid with bilinear
  binning only along time and optional separate polarity channels; semantics of
  ``datasets/data_util.py:51-117`` (``np.add.at`` per polarity).
- :func:`event_histogram`       — 2-channel (neg, pos) event count image;
  semantics of ``datasets/data_util.py:17-35``.
- :func:`normalize_nonzero`     — nonzero-mean/std normalization in both the
  biased (``datasets/data_util.py:38-48``) and unbiased
  (``DSEC/dataset/representations.py:45-53``) flavors.

All functions take fixed-size event arrays plus a validity mask so they are
jit/vmap-compatible (static shapes; padding events carry ``valid=False``).
Scatter-adds lower to XLA's native TPU scatter; x/y/t arrive as separate
arrays (structure-of-arrays), the layout produced by the HDF5/memmap readers,
which avoids host-side transposes.

Performance notes (measured on v5e, 16M corner-updates into a 1.5M-cell
grid): XLA scatter-add 133 ms; sort(81 ms)+sorted-scatter 215 ms;
sort+cumsum+boundary unique-scatter 219 ms; a Pallas VMEM-resident serial
scatter is rejected by Mosaic ("cannot statically prove index is a multiple
of 128" — the TPU ISA has no unaligned per-element VMEM store, so per-event
scatter cannot vectorize). XLA's scatter (~9.7 Mev/s at DSEC scale) is the
ceiling for scatter-BASED device voxelization; the round-2 scatter-FREE
Pallas kernel (``ops/voxelize_mxu.py``: trilinear splat as one-hot-weighted
MXU matmuls) reaches ~25 Mev/s (2.6x) on-chip. The production data plane
picks between the native C++ host kernel (``openess_tpu.native``, ~175M
updates/s/core, threads scale linearly) and the device kernels, overlapped
with device compute via the prefetch pipeline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_first_last(t: Array, valid: Array) -> tuple[Array, Array]:
    """First and last *valid* timestamps of a time-sorted, padded event array."""
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    tf = t.astype(jnp.float32)
    t_first = jnp.min(jnp.where(valid, tf, big))
    t_last = jnp.max(jnp.where(valid, tf, -big))
    return t_first, t_last


def _scatter_add(flat_size: int, idx: Array, vals: Array, mask: Array) -> Array:
    """Masked scatter-add into a flat zero-initialized buffer.

    Invalid entries are redirected out of range and dropped by XLA scatter's
    ``mode='drop'`` — no host-side filtering, fully vectorized on device.
    """
    idx = jnp.where(mask, idx, flat_size)
    vals = jnp.where(mask, vals, 0.0)
    out = jnp.zeros((flat_size,), jnp.float32)
    return out.at[idx].add(vals, mode="drop")


@functools.partial(jax.jit, static_argnames=("num_bins", "height", "width", "normalize"))
def voxel_grid_trilinear(
    x: Array,
    y: Array,
    p: Array,
    t: Array,
    valid: Array,
    *,
    num_bins: int,
    height: int,
    width: int,
    normalize: bool = False,
) -> Array:
    """Signed trilinear voxel grid (DSEC semantics).

    Args:
      x, y: float event coordinates (rectified; may be fractional/negative).
      p:    polarity in {0, 1}.
      t:    event timestamps (any monotonic unit); normalized internally to
            ``(num_bins - 1) * (t - t_first) / (t_last - t_first)``.
      valid: bool mask; padding events must be False.

    Returns:
      ``[num_bins, height, width]`` float32 grid with ±1-weighted 8-corner
      trilinear contributions (reference: representations.py:24-43).
    """
    C, H, W = num_bins, height, width
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    t_first, t_last = _masked_first_last(t, valid)
    dt = t_last - t_first
    dt = jnp.where(dt > 0, dt, 1.0)
    t_norm = (C - 1) * (t.astype(jnp.float32) - t_first) / dt

    # Truncation toward zero, matching torch ``.int()`` (representations.py:27-29).
    x0 = x.astype(jnp.int32)
    y0 = y.astype(jnp.int32)
    t0 = t_norm.astype(jnp.int32)

    value = 2.0 * p.astype(jnp.float32) - 1.0

    total = jnp.zeros((C * H * W,), jnp.float32)
    for xlim in (x0, x0 + 1):
        wx = 1.0 - jnp.abs(xlim.astype(jnp.float32) - x)
        in_x = (xlim >= 0) & (xlim < W)
        for ylim in (y0, y0 + 1):
            wy = 1.0 - jnp.abs(ylim.astype(jnp.float32) - y)
            in_y = (ylim >= 0) & (ylim < H)
            for tlim in (t0, t0 + 1):
                wt = 1.0 - jnp.abs(tlim.astype(jnp.float32) - t_norm)
                mask = valid & in_x & in_y & (tlim >= 0) & (tlim < C)
                idx = (tlim * H + ylim) * W + xlim
                total = total + _scatter_add(C * H * W, idx, value * wx * wy * wt, mask)

    grid = total.reshape(C, H, W)
    if normalize:
        grid = normalize_nonzero(grid, unbiased=True)
    return grid


@functools.partial(
    jax.jit,
    static_argnames=("num_bins", "height", "width", "separate_pol", "normalize"),
)
def voxel_grid_bilinear_t(
    x: Array,
    y: Array,
    p: Array,
    t: Array,
    valid: Array,
    *,
    num_bins: int,
    height: int,
    width: int,
    separate_pol: bool = True,
    normalize: bool = False,
) -> Array:
    """Voxel grid with bilinear temporal binning, per-polarity (DDD17 semantics).

    ``p`` may be {0, 1} or {-1, 1}; zeros are mapped to -1 as in
    ``data_util.py:79``. Returns ``[2*num_bins, H, W]`` (pos then neg) when
    ``separate_pol`` else the signed difference ``[num_bins, H, W]``.
    """
    C, H, W = num_bins, height, width
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)

    t_first, t_last = _masked_first_last(t, valid)
    dt_total = t_last - t_first
    dt_total = jnp.where(dt_total == 0, 1.0, dt_total)
    ts = (C - 1) * (t.astype(jnp.float32) - t_first) / dt_total

    pol = p.astype(jnp.float32)
    pol = jnp.where(pol == 0, -1.0, pol)
    is_pos = pol == 1.0

    tis = ts.astype(jnp.int32)  # ts >= 0 for valid events, so trunc == floor
    dts = ts - tis.astype(jnp.float32)
    vals_left = jnp.abs(pol) * (1.0 - dts)
    vals_right = jnp.abs(pol) * dts

    in_bounds = (
        valid & (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (ts >= 0) & (ts < C)
    )
    idx_left = (tis * H + yi) * W + xi
    idx_right = ((tis + 1) * H + yi) * W + xi
    left_ok = in_bounds & (tis < C)
    right_ok = in_bounds & (tis + 1 < C)

    def accum(sel: Array) -> Array:
        out = _scatter_add(C * H * W, idx_left, vals_left, left_ok & sel)
        out = out + _scatter_add(C * H * W, idx_right, vals_right, right_ok & sel)
        return out.reshape(C, H, W)

    pos = accum(is_pos)
    neg = accum(~is_pos)

    grid = jnp.concatenate([pos, neg], axis=0) if separate_pol else pos - neg
    if normalize:
        grid = normalize_nonzero(grid, unbiased=False)
    return grid


@functools.partial(jax.jit, static_argnames=("height", "width"))
def event_histogram(
    x: Array, y: Array, p: Array, valid: Array, *, height: int, width: int
) -> Array:
    """2-channel (neg, pos) event-count histogram (data_util.py:17-35)."""
    H, W = height, width
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    pol = p.astype(jnp.float32)
    pol = jnp.where(pol == 0, -1.0, pol)
    in_bounds = valid & (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    idx = yi * W + xi
    ones = jnp.ones_like(pol)
    pos = _scatter_add(H * W, idx, ones, in_bounds & (pol == 1.0))
    neg = _scatter_add(H * W, idx, ones, in_bounds & (pol != 1.0))
    return jnp.stack([neg, pos], axis=0).reshape(2, H, W)


def normalize_nonzero(grid: Array, *, unbiased: bool) -> Array:
    """Standardize the nonzero entries of ``grid`` in place (zeros untouched).

    ``unbiased=True`` matches torch ``Tensor.std()`` (ddof=1, DSEC flavor,
    representations.py:45-53); ``unbiased=False`` matches the DDD17 flavor
    ``sqrt(E[x^2] - E[x]^2)`` (data_util.py:38-48).
    """
    nz = grid != 0
    cnt = jnp.sum(nz)
    cnt_safe = jnp.maximum(cnt, 1)
    total = jnp.sum(jnp.where(nz, grid, 0.0))
    mean = total / cnt_safe
    if unbiased:
        var = jnp.sum(jnp.where(nz, (grid - mean) ** 2, 0.0)) / jnp.maximum(cnt - 1, 1)
    else:
        sq = jnp.sum(jnp.where(nz, grid * grid, 0.0)) / cnt_safe
        var = sq - mean * mean
    std = jnp.sqrt(var)
    centered = jnp.where(std > 0, (grid - mean) / std, grid - mean)
    out = jnp.where(nz, centered, grid)
    # Degenerate empty grid: leave untouched.
    return jnp.where(cnt > 0, out, grid)


@functools.partial(
    jax.jit,
    static_argnames=("num_windows", "num_bins", "height", "width", "normalize"),
)
def voxelize_windows_trilinear(
    x: Array,
    y: Array,
    p: Array,
    t: Array,
    valid: Array,
    *,
    num_windows: int,
    num_bins: int,
    height: int,
    width: int,
    normalize: bool = False,
) -> Array:
    """Voxelize a padded event stream split into equal temporal windows.

    Mirrors the reference inner loop ``sequence_ov.py:302-305`` (20 windows of
    ``N/20`` events, each voxelized independently) as one fused vmap — the
    per-window 8-thread joblib fan-out becomes a single device launch.

    Inputs are ``[num_windows * K]`` flat arrays. Returns
    ``[num_windows * num_bins, H, W]``.
    """
    n = x.shape[0]
    assert n % num_windows == 0, (n, num_windows)
    k = n // num_windows

    def one(args):
        xw, yw, pw, tw, vw = args
        return voxel_grid_trilinear(
            xw, yw, pw, tw, vw,
            num_bins=num_bins, height=height, width=width, normalize=normalize,
        )

    grids = jax.vmap(one)(
        tuple(a.reshape(num_windows, k) for a in (x, y, p, t, valid))
    )
    return grids.reshape(num_windows * num_bins, height, width)
