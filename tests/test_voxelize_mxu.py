"""Pallas MXU voxelizer vs the bit-exact XLA scatter path (interpret mode on
the CPU test mesh; the compiled kernel is exercised on real TPU by bench.py
and the verify drives)."""
import numpy as np
import pytest

from openess_tpu.ops import voxelize_windows_trilinear
from openess_tpu.ops.voxelize_mxu import voxelize_windows_trilinear_mxu


def _events(rng, n, H, W, lo=-1.0):
    x = rng.uniform(lo, W, n).astype(np.float32)
    y = rng.uniform(lo, H, n).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e6, n)).astype(np.float32)
    return x, y, p, t


def _compare(x, y, p, t, valid, NW, C, H, W, rtol=5e-3):
    ref = np.asarray(voxelize_windows_trilinear(
        x, y, p, t, valid, num_windows=NW, num_bins=C, height=H, width=W))
    got = np.asarray(voxelize_windows_trilinear_mxu(
        x, y, p, t, valid, num_windows=NW, num_bins=C, height=H, width=W,
        interpret=True))
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < rtol, (
        np.abs(got - ref).max(), scale)
    return ref, got


def test_mxu_matches_scatter_dense(rng):
    NW, C, H, W = 2, 3, 24, 256
    n = NW * 700  # non-multiple of the event chunk -> exercises padding
    x, y, p, t = _events(rng, n, H, W)
    t = np.sort(t.reshape(NW, -1), axis=1).reshape(-1)
    valid = rng.random(n) < 0.9
    _compare(x, y, p, t, valid, NW, C, H, W)


def test_mxu_negative_coord_quirk(rng):
    """Reference trunc-toward-zero semantics for fractional negative coords
    (corner pair {0, 1} with a negative weight on corner 1) must match."""
    NW, C, H, W = 1, 2, 16, 128
    n = 64
    x, y, p, t = _events(rng, n, H, W)
    x[:8] = rng.uniform(-0.9, -0.1, 8)  # negative fractional x
    y[8:16] = rng.uniform(-0.9, -0.1, 8)
    valid = np.ones(n, bool)
    _compare(x, y, p, t, valid, NW, C, H, W)


def test_mxu_all_invalid_window(rng):
    NW, C, H, W = 2, 2, 16, 128
    n = NW * 300
    x, y, p, t = _events(rng, n, H, W)
    valid = np.ones(n, bool)
    valid[: n // 2] = False  # window 0 entirely padding
    ref, got = _compare(x, y, p, t, valid, NW, C, H, W)
    assert np.abs(got[:C]).max() == 0.0


def test_mxu_single_event(rng):
    NW, C, H, W = 1, 2, 16, 128
    n = 256
    x, y, p, t = _events(rng, n, H, W)
    valid = np.zeros(n, bool)
    valid[3] = True
    x[3], y[3], p[3] = 10.5, 7.25, 1.0
    ref, got = _compare(x, y, p, t, valid, NW, C, H, W)
    # dt == 0 for a single event -> t_norm = 0, mass = sum of corner weights
    np.testing.assert_allclose(got.sum(), 1.0, atol=5e-3)


@pytest.mark.slow
def test_mxu_dsec_shape(rng):
    NW, C, H, W = 2, 5, 480, 640
    n = NW * 2000
    x, y, p, t = _events(rng, n, H, W)
    t = np.sort(t.reshape(NW, -1), axis=1).reshape(-1)
    valid = np.ones(n, bool)
    _compare(x, y, p, t, valid, NW, C, H, W)


@pytest.mark.parametrize("separate_pol", [True, False])
def test_mxu_bilinear_t_matches_scatter(rng, separate_pol):
    import jax

    from openess_tpu.ops import voxel_grid_bilinear_t
    from openess_tpu.ops.voxelize_mxu import voxelize_windows_bilinear_t_mxu

    NW, C, H, W = 2, 4, 24, 136  # W deliberately not 128-aligned (DDD17: 346)
    n = NW * 500
    x = rng.integers(-2, W + 2, n).astype(np.float32)  # incl. out-of-bounds
    y = rng.integers(-2, H + 2, n).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e6, n).reshape(NW, -1), axis=1).reshape(-1)
    t = t.astype(np.float32)
    valid = rng.random(n) < 0.9

    def one(args):
        return voxel_grid_bilinear_t(
            *args, num_bins=C, height=H, width=W, separate_pol=separate_pol)
    ref = np.asarray(jax.vmap(one)(
        tuple(a.reshape(NW, -1) for a in (x, y, p, t, valid))
    )).reshape(-1, H, W)
    got = np.asarray(voxelize_windows_bilinear_t_mxu(
        x, y, p, t, valid, num_windows=NW, num_bins=C, height=H, width=W,
        separate_pol=separate_pol, interpret=True))
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 5e-3
