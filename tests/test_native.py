"""Native C++ host kernels vs the jit device ops (same golden semantics)."""
import numpy as np
import pytest

from openess_tpu.native import (
    HAVE_NATIVE,
    voxelize_bilinear_t_host,
    voxelize_trilinear_host,
)
from openess_tpu.ops import voxel_grid_bilinear_t, voxel_grid_trilinear

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")


def test_native_trilinear_matches_device_op(rng):
    C, H, W, N = 5, 37, 53, 5000
    x = rng.uniform(-0.5, W + 0.5, N).astype(np.float32)
    y = rng.uniform(-0.5, H + 0.5, N).astype(np.float32)
    p = rng.integers(0, 2, N).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e6, N)).astype(np.float32)
    native = voxelize_trilinear_host(x, y, p, t, C, H, W)
    device = np.asarray(
        voxel_grid_trilinear(
            x, y, p, t, np.ones(N, bool), num_bins=C, height=H, width=W
        )
    )
    np.testing.assert_allclose(native, device, atol=2e-4)


@pytest.mark.parametrize("separate_pol", [True, False])
def test_native_bilinear_t_matches_device_op(rng, separate_pol):
    C, H, W, N = 5, 26, 35, 4000
    x = rng.integers(0, W, N).astype(np.int64)
    y = rng.integers(0, H, N).astype(np.int64)
    p = rng.integers(0, 2, N).astype(np.float32)
    t = np.sort(rng.integers(0, 10**6, N)).astype(np.int64)
    native = voxelize_bilinear_t_host(
        x, y, p, t, C, H, W, separate_pol=separate_pol
    )
    device = np.asarray(
        voxel_grid_bilinear_t(
            x.astype(np.float32), y.astype(np.float32), p,
            t.astype(np.float32), np.ones(N, bool),
            num_bins=C, height=H, width=W, separate_pol=separate_pol,
        )
    )
    np.testing.assert_allclose(native, device, atol=2e-3)
