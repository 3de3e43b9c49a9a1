"""Golden-value tests for event voxelization kernels.

Each device kernel is validated against an independent numpy re-derivation of
the reference semantics (DSEC ``representations.py:15-53``, DDD17
``data_util.py:17-117``) plus tiny hand-computed event sets.
"""
import numpy as np
import pytest

from openess_tpu.ops import (
    event_histogram,
    voxel_grid_bilinear_t,
    voxel_grid_trilinear,
    voxelize_windows_trilinear,
)


# ----------------------------------------------------------------------------
# numpy references (re-derived from the documented torch/np semantics)
# ----------------------------------------------------------------------------

def np_voxel_trilinear(x, y, p, t, C, H, W, normalize=False):
    grid = np.zeros(C * H * W, np.float64)
    t = t.astype(np.float64)
    denom = t[-1] - t[0]
    if denom == 0:
        denom = 1.0
    tn = (C - 1) * (t - t[0]) / denom
    x0 = np.fix(x).astype(np.int64)
    y0 = np.fix(y).astype(np.int64)
    t0 = np.fix(tn).astype(np.int64)
    value = 2.0 * p - 1.0
    for xl in (x0, x0 + 1):
        for yl in (y0, y0 + 1):
            for tl in (t0, t0 + 1):
                mask = (xl < W) & (xl >= 0) & (yl < H) & (yl >= 0) & (tl >= 0) & (tl < C)
                w = value * (1 - np.abs(xl - x)) * (1 - np.abs(yl - y)) * (1 - np.abs(tl - tn))
                np.add.at(grid, ((tl * H + yl) * W + xl)[mask], w[mask])
    grid = grid.reshape(C, H, W)
    if normalize:
        nz = grid != 0
        if nz.sum() > 0:
            mean = grid[nz].mean()
            std = grid[nz].std(ddof=1) if nz.sum() > 1 else 0.0
            if std > 0:
                grid[nz] = (grid[nz] - mean) / std
            else:
                grid[nz] = grid[nz] - mean
    return grid.astype(np.float32)


def np_voxel_bilinear_t(x, y, p, t, C, H, W, separate_pol=True):
    pos = np.zeros(C * H * W, np.float64)
    neg = np.zeros(C * H * W, np.float64)
    t = t.astype(np.float64)
    dT = t[-1] - t[0]
    if dT == 0:
        dT = 1.0
    ts = (C - 1) * (t - t[0]) / dT
    xs = x.astype(np.int64)
    ys = y.astype(np.int64)
    pols = p.astype(np.float64).copy()
    pols[pols == 0] = -1
    tis = ts.astype(np.int64)
    dts = ts - tis
    vl = np.abs(pols) * (1.0 - dts)
    vr = np.abs(pols) * dts
    bounds = (xs < W) & (xs >= 0) & (ys < H) & (ys >= 0) & (ts >= 0) & (ts < C)
    for grid, sel in ((pos, pols == 1), (neg, pols != 1)):
        m = sel & bounds & (tis < C)
        np.add.at(grid, xs[m] + ys[m] * W + tis[m] * W * H, vl[m])
        m = sel & bounds & (tis + 1 < C)
        np.add.at(grid, xs[m] + ys[m] * W + (tis[m] + 1) * W * H, vr[m])
    pos = pos.reshape(C, H, W)
    neg = neg.reshape(C, H, W)
    out = np.concatenate([pos, neg], 0) if separate_pol else pos - neg
    return out.astype(np.float32)


def random_events(rng, n, H, W, fractional):
    if fractional:
        x = rng.uniform(-0.5, W + 0.5, n).astype(np.float32)
        y = rng.uniform(-0.5, H + 0.5, n).astype(np.float32)
    else:
        x = rng.integers(0, W, n).astype(np.float32)
        y = rng.integers(0, H, n).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e6, n)).astype(np.float64)
    return x, y, p, t


# ----------------------------------------------------------------------------
# trilinear (DSEC)
# ----------------------------------------------------------------------------

def test_trilinear_single_event_hand_computed():
    # One positive event at (x=1.5, y=0.5), mid-time. With a single event,
    # t_norm = 0 -> all weight in bin 0, bilinear split over 4 pixels.
    x = np.array([1.5], np.float32)
    y = np.array([0.5], np.float32)
    p = np.array([1.0], np.float32)
    t = np.array([100.0], np.float32)
    valid = np.array([True])
    g = np.asarray(
        voxel_grid_trilinear(x, y, p, t, valid, num_bins=3, height=4, width=4)
    )
    assert g.shape == (3, 4, 4)
    # corners (y,x): (0,1),(0,2),(1,1),(1,2) each weight .25 in t-bin 0 and,
    # since t0=0 and t0+1=1 with weight (1-|1-0|)=0, nothing in bin 1.
    expect = np.zeros((3, 4, 4), np.float32)
    for yy in (0, 1):
        for xx in (1, 2):
            expect[0, yy, xx] = 0.25
    np.testing.assert_allclose(g, expect, atol=1e-6)


def test_trilinear_matches_numpy_reference(rng):
    H, W, C, N = 31, 45, 5, 4000
    x, y, p, t = random_events(rng, N, H, W, fractional=True)
    valid = np.ones(N, bool)
    ours = np.asarray(
        voxel_grid_trilinear(x, y, p, t, valid, num_bins=C, height=H, width=W)
    )
    ref = np_voxel_trilinear(x.astype(np.float64), y.astype(np.float64), p, t, C, H, W)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_trilinear_normalize_matches(rng):
    H, W, C, N = 16, 20, 5, 1500
    x, y, p, t = random_events(rng, N, H, W, fractional=True)
    valid = np.ones(N, bool)
    ours = np.asarray(
        voxel_grid_trilinear(
            x, y, p, t, valid, num_bins=C, height=H, width=W, normalize=True
        )
    )
    ref = np_voxel_trilinear(
        x.astype(np.float64), y.astype(np.float64), p, t, C, H, W, normalize=True
    )
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_trilinear_padding_invariance(rng):
    """Padded (masked) events must not change the result."""
    H, W, C, N = 12, 12, 5, 600
    x, y, p, t = random_events(rng, N, H, W, fractional=True)
    valid = np.ones(N, bool)
    base = np.asarray(
        voxel_grid_trilinear(x, y, p, t, valid, num_bins=C, height=H, width=W)
    )
    pad = 200
    xp = np.concatenate([x, np.zeros(pad, np.float32)])
    yp = np.concatenate([y, np.zeros(pad, np.float32)])
    pp = np.concatenate([p, np.ones(pad, np.float32)])
    tp = np.concatenate([t, np.full(pad, t[-1] + 1e5)])
    vp = np.concatenate([valid, np.zeros(pad, bool)])
    padded = np.asarray(
        voxel_grid_trilinear(xp, yp, pp, tp, vp, num_bins=C, height=H, width=W)
    )
    np.testing.assert_allclose(base, padded, atol=1e-5)


# ----------------------------------------------------------------------------
# bilinear-t (DDD17)
# ----------------------------------------------------------------------------

@pytest.mark.parametrize("separate_pol", [True, False])
def test_bilinear_t_matches_numpy_reference(rng, separate_pol):
    H, W, C, N = 26, 35, 5, 3000
    x, y, p, t = random_events(rng, N, H, W, fractional=False)
    valid = np.ones(N, bool)
    ours = np.asarray(
        voxel_grid_bilinear_t(
            x, y, p, t, valid,
            num_bins=C, height=H, width=W, separate_pol=separate_pol,
        )
    )
    ref = np_voxel_bilinear_t(x, y, p, t, C, H, W, separate_pol=separate_pol)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_bilinear_t_polarity_conventions(rng):
    """p given as {0,1} and as {-1,1} must agree (data_util.py:79 mapping)."""
    H, W, C, N = 10, 10, 3, 400
    x, y, p01, t = random_events(rng, N, H, W, fractional=False)
    valid = np.ones(N, bool)
    pm = np.where(p01 == 0, -1.0, 1.0).astype(np.float32)
    a = np.asarray(
        voxel_grid_bilinear_t(x, y, p01, t, valid, num_bins=C, height=H, width=W)
    )
    b = np.asarray(
        voxel_grid_bilinear_t(x, y, pm, t, valid, num_bins=C, height=H, width=W)
    )
    np.testing.assert_allclose(a, b, atol=1e-6)


# ----------------------------------------------------------------------------
# histogram
# ----------------------------------------------------------------------------

def test_histogram_matches_numpy(rng):
    H, W, N = 19, 23, 2000
    x, y, p, t = random_events(rng, N, H, W, fractional=False)
    valid = np.ones(N, bool)
    ours = np.asarray(event_histogram(x, y, p, valid, height=H, width=W))
    xs = x.astype(np.int64)
    ys = y.astype(np.int64)
    pm = np.where(p == 0, -1, 1)
    pos = np.zeros(H * W, np.float32)
    neg = np.zeros(H * W, np.float32)
    np.add.at(pos, xs[pm == 1] + W * ys[pm == 1], 1)
    np.add.at(neg, xs[pm == -1] + W * ys[pm == -1], 1)
    ref = np.stack([neg, pos]).reshape(2, H, W)
    np.testing.assert_allclose(ours, ref, atol=0)


# ----------------------------------------------------------------------------
# windowed voxelization (the fused 20-window path)
# ----------------------------------------------------------------------------

def test_windows_equals_per_window_calls(rng):
    H, W, C, NW, K = 14, 18, 5, 4, 500
    x, y, p, t = random_events(rng, NW * K, H, W, fractional=True)
    valid = np.ones(NW * K, bool)
    fused = np.asarray(
        voxelize_windows_trilinear(
            x, y, p, t, valid,
            num_windows=NW, num_bins=C, height=H, width=W,
        )
    )
    assert fused.shape == (NW * C, H, W)
    for i in range(NW):
        s = slice(i * K, (i + 1) * K)
        one = np.asarray(
            voxel_grid_trilinear(
                x[s], y[s], p[s], t[s], valid[s], num_bins=C, height=H, width=W
            )
        )
        np.testing.assert_allclose(fused[i * C:(i + 1) * C], one, atol=1e-5)
