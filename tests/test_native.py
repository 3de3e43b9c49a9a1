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


def _window_events(rng, n_win, K, H, W, tmax=1e6):
    x = rng.uniform(-0.5, W + 0.5, (n_win, K)).astype(np.float32)
    y = rng.uniform(-0.5, H + 0.5, (n_win, K)).astype(np.float32)
    p = rng.integers(0, 2, (n_win, K)).astype(np.float32)
    t = np.sort(rng.uniform(0, tmax, (n_win, K)), axis=1).astype(np.float32)
    counts = rng.integers(0, K + 1, n_win).astype(np.int64)
    counts[0] = 0        # empty window
    counts[1] = K        # full window
    return x, y, p, t, counts


@pytest.mark.parametrize("norm_mode", [0, 1])
@pytest.mark.parametrize("n_threads", [1, 3])
def test_trilinear_windows_matches_per_window(rng, norm_mode, n_threads):
    from openess_tpu.native import voxelize_trilinear_windows_host

    C, H, W, K, n_win = 5, 30, 42, 600, 7
    crop = 4
    x, y, p, t, counts = _window_events(rng, n_win, K, H, W)
    out = voxelize_trilinear_windows_host(
        x, y, p, t, counts, C, H, W,
        crop_bottom=crop, norm_mode=norm_mode, n_threads=n_threads,
    )
    assert out.shape == (n_win, H - crop, W, C)
    for w in range(n_win):
        n = int(counts[w])
        if n == 0:
            np.testing.assert_array_equal(out[w], 0)
            continue
        g = voxelize_trilinear_host(x[w, :n], y[w, :n], p[w, :n], t[w, :n], C, H, W)
        if norm_mode:
            mask = g != 0
            vals = g[mask]
            g = g.copy()
            g[mask] = (vals - vals.mean()) / vals.std(ddof=1)
        np.testing.assert_allclose(out[w], g[:, : H - crop].transpose(1, 2, 0), atol=1e-5)


@pytest.mark.parametrize("separate_pol", [True, False])
def test_bilinear_t_windows_matches_per_window(rng, separate_pol):
    from openess_tpu.native import voxelize_bilinear_t_windows_host

    C, H, W, K, n_win = 5, 26, 35, 500, 6
    x = rng.integers(0, W, (n_win, K)).astype(np.float32)
    y = rng.integers(0, H, (n_win, K)).astype(np.float32)
    p = rng.integers(0, 2, (n_win, K)).astype(np.float32)
    t = np.sort(rng.integers(0, 10**6, (n_win, K)), axis=1).astype(np.float32)
    counts = rng.integers(1, K + 1, n_win).astype(np.int64)
    out = voxelize_bilinear_t_windows_host(
        x, y, p, t, counts, C, H, W,
        separate_pol=separate_pol, n_threads=2,
    )
    cout = 2 * C if separate_pol else C
    assert out.shape == (n_win, H, W, cout)
    for w in range(n_win):
        n = int(counts[w])
        g = voxelize_bilinear_t_host(
            x[w, :n].astype(np.int64), y[w, :n].astype(np.int64),
            p[w, :n], t[w, :n].astype(np.int64),
            C, H, W, separate_pol=separate_pol,
        )
        np.testing.assert_allclose(out[w], g.transpose(1, 2, 0), atol=1e-5)


@pytest.mark.parametrize("norm_mode", [0, 1])
def test_trilinear_windows_chw_layout_matches_nhwc(rng, norm_mode):
    """layout='chw' (the planar TPU wire format) is exactly the NHWC output
    transposed — both native branches hit the same scatter + normalize."""
    from openess_tpu.native import voxelize_trilinear_windows_host

    C, H, W, K, n_win = 5, 24, 40, 500, 5
    x, y, p, t, counts = _window_events(rng, n_win, K, H, W)
    nhwc = voxelize_trilinear_windows_host(
        x, y, p, t, counts, C, H, W,
        crop_bottom=4, norm_mode=norm_mode, n_threads=2,
    )
    chw = voxelize_trilinear_windows_host(
        x, y, p, t, counts, C, H, W,
        crop_bottom=4, norm_mode=norm_mode, n_threads=2, layout="chw",
    )
    assert chw.shape == (n_win, C, H - 4, W)
    np.testing.assert_array_equal(chw, nhwc.transpose(0, 3, 1, 2))


@pytest.mark.parametrize("separate_pol", [True, False])
def test_bilinear_t_windows_chw_layout_matches_nhwc(rng, separate_pol):
    from openess_tpu.native import voxelize_bilinear_t_windows_host

    C, H, W, K, n_win = 4, 20, 30, 400, 4
    x = rng.integers(0, W, (n_win, K)).astype(np.float32)
    y = rng.integers(0, H, (n_win, K)).astype(np.float32)
    p = rng.integers(0, 2, (n_win, K)).astype(np.float32)
    t = np.sort(rng.integers(0, 10**6, (n_win, K)), axis=1).astype(np.float32)
    counts = rng.integers(1, K + 1, n_win).astype(np.int64)
    nhwc = voxelize_bilinear_t_windows_host(
        x, y, p, t, counts, C, H, W, separate_pol=separate_pol, n_threads=2,
    )
    chw = voxelize_bilinear_t_windows_host(
        x, y, p, t, counts, C, H, W, separate_pol=separate_pol, n_threads=2,
        layout="chw",
    )
    cout = 2 * C if separate_pol else C
    assert chw.shape == (n_win, cout, H, W)
    np.testing.assert_array_equal(chw, nhwc.transpose(0, 3, 1, 2))


@pytest.mark.parametrize("t16", [False, True])
@pytest.mark.parametrize("integer_coords", [False, True])
@pytest.mark.parametrize("n_threads", [1, 3])
def test_chunk_events_windows_matches_numpy(rng, integer_coords, n_threads,
                                            t16):
    """The C++ sorted-chunk wire packer must be bit-identical to the numpy
    reference chunker (quantization, keep-masks, tile sort, chunk cuts) —
    for both the f32 (v1) and uint16-quantized (v2) time wires."""
    from openess_tpu.native import chunk_events_windows_host
    from openess_tpu.ops.voxelize_chunked import chunk_events_batch

    NW, K, H, W = 3, 5000, 72, 130
    x = rng.uniform(-1.5, W + 0.5, (NW, K)).astype(np.float32)
    y = rng.uniform(-1.5, H + 0.5, (NW, K)).astype(np.float32)
    p = rng.integers(0, 2, (NW, K)).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e6, (NW, K)), axis=1)
    valid = rng.random((NW, K)) < 0.9
    valid[1] = False  # empty window

    got = chunk_events_windows_host(
        x, y, p, t, valid, height=H, width=W, chunk=256,
        integer_coords=integer_coords, n_threads=n_threads, trim=False,
        t16=t16,
    )
    ref = chunk_events_batch(
        x, y, p, t, valid, height=H, width=W, chunk=256,
        integer_coords=integer_coords, t16=t16,
    )
    names = ("xq", "yq", "pq", "t_rel", "counts", "tile_r0", "t_range")
    for name, u, v in zip(names, got, ref):
        assert u.shape == v.shape and u.dtype == v.dtype, name
        np.testing.assert_array_equal(u, v, err_msg=name)
    assert got[3].dtype == (np.uint16 if t16 else np.float32)

    # trim=True (production default): the wire's chunk axis shrinks to the
    # bucketed batch-max USED chunk count, and every array bit-matches the
    # untrimmed wire's [:, :nbc] slice (zero padding included)
    trimmed = chunk_events_windows_host(
        x, y, p, t, valid, height=H, width=W, chunk=256,
        integer_coords=integer_coords, n_threads=n_threads, trim=True,
        t16=t16,
    )
    nbc_t = trimmed[0].shape[1]
    used = int((ref[4] > 0).sum(axis=1).max())
    assert used <= nbc_t < ref[0].shape[1], (used, nbc_t, ref[0].shape[1])
    for name, u, v in zip(names[:6], trimmed, ref):
        np.testing.assert_array_equal(u, v[:, :nbc_t], err_msg="trim " + name)
    np.testing.assert_array_equal(trimmed[6], ref[6], err_msg="trim t_range")


def test_chunk_events_reuse_buffers_double_buffered(rng):
    """reuse_buffers=True recycles outputs per (thread, shape) with a
    2-rotation: call N's arrays survive call N+1 and are identical to a
    fresh-buffer run; call N+2 may overwrite them."""
    from openess_tpu.native import HAVE_NATIVE, chunk_events_windows_host

    if not HAVE_NATIVE:
        pytest.skip("native library unavailable")
    NW, K, H, W = 2, 3000, 48, 96
    def make():
        x = rng.uniform(0, W - 1, (NW, K)).astype(np.float32)
        y = rng.uniform(0, H - 1, (NW, K)).astype(np.float32)
        p = rng.integers(0, 2, (NW, K)).astype(np.float32)
        t = np.sort(rng.uniform(0, 1e5, (NW, K)), axis=1)
        v = np.ones((NW, K), bool)
        return x, y, p, t, v

    a1, a2 = make(), make()
    kw = dict(height=H, width=W, chunk=256, n_threads=1)
    w1 = chunk_events_windows_host(*a1, reuse_buffers=True, **kw)
    w2 = chunk_events_windows_host(*a2, reuse_buffers=True, **kw)
    f1 = chunk_events_windows_host(*a1, reuse_buffers=False, **kw)
    f2 = chunk_events_windows_host(*a2, reuse_buffers=False, **kw)
    for u, v in zip(w1, f1):
        np.testing.assert_array_equal(u, v)  # survived one more call
    for u, v in zip(w2, f2):
        np.testing.assert_array_equal(u, v)
    # the two live rotations are distinct buffers
    assert not np.shares_memory(w1[0], w2[0])


@pytest.mark.parametrize("trim", [False, True])
def test_chunk_events_fresh_buffers_never_alias_scratch(rng, trim):
    """reuse_buffers=False must return OWNED arrays: a retained batch's
    counts/tile_r0 may not mutate after later packer calls on the same
    thread (ADVICE r4 high — ascontiguousarray of a full-width slice used
    to return the TLS scratch itself whenever nbc saturated at nbc_cap)."""
    from openess_tpu.native import HAVE_NATIVE, chunk_events_windows_host

    if not HAVE_NATIVE:
        pytest.skip("native library unavailable")
    NW, K, H, W = 2, 3000, 48, 96

    def make():
        x = rng.uniform(0, W - 1, (NW, K)).astype(np.float32)
        y = rng.uniform(0, H - 1, (NW, K)).astype(np.float32)
        p = rng.integers(0, 2, (NW, K)).astype(np.float32)
        t = np.sort(rng.uniform(0, 1e5, (NW, K)), axis=1)
        v = np.ones((NW, K), bool)
        return x, y, p, t, v

    kw = dict(height=H, width=W, chunk=256, n_threads=1, trim=trim)
    a0 = make()
    retained = chunk_events_windows_host(*a0, reuse_buffers=False, **kw)
    snapshot = [np.array(a, copy=True) for a in retained]
    # Two more same-shape calls flip the TLS double buffer all the way around;
    # if any returned array aliased scratch, it would now hold call-3's data.
    chunk_events_windows_host(*make(), reuse_buffers=False, **kw)
    chunk_events_windows_host(*make(), reuse_buffers=False, **kw)
    names = ("xq", "yq", "pq", "t_rel", "counts", "tile_r0", "t_range")
    for name, live, snap in zip(names, retained, snapshot):
        np.testing.assert_array_equal(live, snap, err_msg=name)
