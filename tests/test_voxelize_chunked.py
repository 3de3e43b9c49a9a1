"""Sorted-chunk voxelizer (ops/voxelize_chunked.py) vs the bit-exact XLA
scatter path, on identical dequantized inputs (interpret mode on CPU; the
compiled kernel runs on real TPU via bench.py and the verify drives).
"""
import numpy as np
import pytest

from openess_tpu.ops import voxel_grid_bilinear_t, voxelize_windows_trilinear
from openess_tpu.ops.voxelize_chunked import (
    CHUNK,
    FIXED_POINT,
    chunk_events_batch,
    chunk_events_window,
    num_chunks,
    pad_wire_chunks,
    voxelize_chunked_bilinear_t,
    voxelize_chunked_trilinear,
)


def _events(rng, nw, k, H, W, lo=-1.5):
    x = rng.uniform(lo, W + 0.5, (nw, k)).astype(np.float32)
    y = rng.uniform(lo, H + 0.5, (nw, k)).astype(np.float32)
    p = rng.integers(0, 2, (nw, k)).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e6, (nw, k)), axis=1).astype(np.float32)
    valid = rng.random((nw, k)) < 0.9
    return x, y, p, t, valid


def _dequant(q):
    return q.astype(np.float32) / FIXED_POINT


def test_quantization_preserves_corner_pair():
    """The wire quantization must never move a coord across a
    trunc-toward-zero boundary: the reference weight function is
    DISCONTINUOUS at negative integers (torch .int() flips the corner pair
    there), so e.g. x=-0.9901 rounding to -1.0 would misplace ~a full event
    weight at the border column (caught by a real-TPU verify drive)."""
    H, W, chunk = 48, 96, 64
    # coords straddling every discontinuity class, incl. exact integers
    xs = np.array(
        [-1.9999, -1.0001, -1.0, -0.9901, -0.9999, -0.0001, 0.0,
         0.9999, 1.0001, 94.9999, 95.0001], np.float32,
    )
    k = xs.size
    y = np.full((k,), 7.3, np.float32)
    p = np.ones((k,), np.float32)
    t = np.linspace(0.0, 1e5, k).astype(np.float32)
    xq, yq, pq, tr, counts, r0s, t_range = chunk_events_window(
        xs, y, p, t, np.ones(k, bool), height=H, width=W, chunk=chunk
    )
    got = np.sort(
        np.concatenate(
            [_dequant(xq[ci, : counts[ci]]) for ci in range(len(counts))]
        )
    )
    # the chunker's keep rule: any corner of {x0, x0+1} inside [0, W)
    orig = np.sort(xs[(xs > -2.0) & (xs < W)])
    assert got.size == orig.size, (got.size, orig.size)
    # corner identity: trunc of every dequantized coord == trunc of original
    np.testing.assert_array_equal(np.trunc(got), np.trunc(orig))
    # and the coord error is bounded by the 1/32-px clamp
    assert np.abs(got - orig).max() <= 1.0 / FIXED_POINT + 1e-6


def test_chunker_invariants(rng):
    H, W, k = 48, 96, 3000
    x, y, p, t, valid = _events(rng, 1, k, H, W)
    chunk = 256
    xq, yq, pq, tr, counts, r0s, t_range = chunk_events_window(
        x[0], y[0], p[0], t[0], valid[0], height=H, width=W, chunk=chunk
    )
    nbc = num_chunks(k, H, width=W, chunk=chunk)
    assert xq.shape == (nbc, chunk)
    assert counts.sum() <= valid[0].sum()
    # every chunk's events live in one 16-row tile with x corners inside the
    # kernel's [c0, c0+256) lane block; (row tile, c0) monotone across chunks
    segs = []
    for ci in range(nbc):
        n = counts[ci]
        if n == 0:
            continue
        r0 = int(r0s[ci]) & 0xFFFF
        c0 = int(r0s[ci]) >> 16
        assert r0 % 16 == 0 and c0 % 128 == 0
        yd = _dequant(yq[ci, :n])
        y0 = np.trunc(yd).astype(int)
        assert (np.clip(y0, 0, H - 1) // 16 == r0 // 16).all()
        assert (y0 >= r0 - 1).all() and (y0 <= r0 + 15).all()
        x0 = np.trunc(_dequant(xq[ci, :n])).astype(int)
        assert (x0 >= c0 - 1).all() and (x0 + 1 <= c0 + 255).all()
        segs.append((r0 // 16) * (W + 256) + c0)
    assert (np.diff(segs) >= 0).all()
    # no event lost: total kept events = in-frame-corner events (mirror the
    # corner-pair-preserving quantization: fraction rounded rel. to trunc,
    # clamped to +/-31/32)
    def _quant(a):
        af = a.astype(np.float64)
        a0 = np.trunc(af)
        fq = np.clip(np.round((af - a0) * FIXED_POINT),
                     -(FIXED_POINT - 1), FIXED_POINT - 1)
        return a0 * FIXED_POINT + fq

    yq_all = _quant(y[0])
    xq_all = _quant(x[0])
    expect = (
        valid[0]
        & (yq_all > -2 * FIXED_POINT) & (yq_all < H * FIXED_POINT)
        & (xq_all > -2 * FIXED_POINT) & (xq_all < W * FIXED_POINT)
    ).sum()
    assert counts.sum() == expect


def _compare_tri(x, y, p, t, valid, C, H, W, chunk, rtol=5e-3):
    nw = x.shape[0]
    xq, yq, pq, tr, counts, r0s, t_range = chunk_events_batch(
        x, y, p, t, valid, height=H, width=W, chunk=chunk
    )
    got = np.asarray(
        voxelize_chunked_trilinear(
            xq, yq, pq, tr, counts, r0s, t_range,
            num_bins=C, height=H, width=W, interpret=True,
        )
    )
    # reference on the SAME dequantized coords (and the chunker's exact
    # keep-semantics are corner-equivalent to the scatter masks)
    def _deq(a):
        af = a.astype(np.float64)
        a0 = np.trunc(af)
        fq = np.clip(np.round((af - a0) * FIXED_POINT),
                     -(FIXED_POINT - 1), FIXED_POINT - 1)
        return ((a0 * FIXED_POINT + fq) / FIXED_POINT).astype(np.float32)

    ref = np.stack([
        np.asarray(
            voxelize_windows_trilinear(
                _deq(x[w]), _deq(y[w]),
                p[w], t[w], valid[w],
                num_windows=1, num_bins=C, height=H, width=W,
            )
        )
        for w in range(nw)
    ]).reshape(nw, C, H, W)
    scale = np.abs(ref).max() + 1e-9
    err = np.abs(got - ref).max() / scale
    assert err < rtol, err
    return got


def test_chunked_trilinear_matches_scatter(rng):
    C, H, W = 5, 48, 96
    x, y, p, t, valid = _events(rng, 2, 4000, H, W)
    _compare_tri(x, y, p, t, valid, C, H, W, chunk=256)


def test_chunked_trilinear_nondivisible_dims(rng):
    C, H, W = 3, 37, 130  # H % 16 != 0, W % 128 != 0
    x, y, p, t, valid = _events(rng, 2, 1500, H, W)
    _compare_tri(x, y, p, t, valid, C, H, W, chunk=128)


def test_chunked_trilinear_dense_single_tile(rng):
    """All events in one tile: exercises the capacity-cut path."""
    C, H, W = 5, 64, 128
    nw, k = 1, 2000
    x = rng.uniform(0, W - 1, (nw, k)).astype(np.float32)
    y = rng.uniform(17, 30, (nw, k)).astype(np.float32)  # tile 1 only
    p = rng.integers(0, 2, (nw, k)).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e5, (nw, k)), axis=1).astype(np.float32)
    valid = np.ones((nw, k), bool)
    got = _compare_tri(x, y, p, t, valid, C, H, W, chunk=256)
    assert np.abs(got[0, :, :16]).max() == 0  # nothing outside the tile rows
    assert np.abs(got[0, :, 32:]).max() == 0


def test_chunked_trilinear_multi_xtile_boundary(rng):
    """W spanning 3 column tiles with events piled on the 128/256 column
    boundaries: the x-corner pair must spill into the neighbor tile's lane
    block, not get dropped."""
    C, H, W = 4, 32, 300
    nw, k = 1, 3000
    x = np.concatenate([
        rng.uniform(126.2, 129.8, (nw, k // 3)),
        rng.uniform(254.2, 257.8, (nw, k // 3)),
        rng.uniform(-1.5, W + 0.5, (nw, k - 2 * (k // 3))),
    ], axis=1).astype(np.float32)
    y = rng.uniform(-1.5, H + 0.5, (nw, k)).astype(np.float32)
    p = rng.integers(0, 2, (nw, k)).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e6, (nw, k)), axis=1).astype(np.float32)
    valid = np.ones((nw, k), bool)
    _compare_tri(x, y, p, t, valid, C, H, W, chunk=256)


def test_chunked_trilinear_empty_window(rng):
    C, H, W = 2, 32, 128
    x, y, p, t, valid = _events(rng, 2, 500, H, W)
    valid[0] = False
    got = _compare_tri(x, y, p, t, valid, C, H, W, chunk=128)
    assert np.abs(got[0]).max() == 0


def test_chunked_bilinear_t_matches_scatter(rng):
    C, H, W = 5, 40, 130
    nw, k = 2, 3000
    x = rng.integers(-3, W + 3, (nw, k)).astype(np.float32)
    y = rng.integers(-3, H + 3, (nw, k)).astype(np.float32)
    p = rng.integers(0, 2, (nw, k)).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e6, (nw, k)), axis=1).astype(np.float32)
    valid = rng.random((nw, k)) < 0.9

    for sep in (True, False):
        xq, yq, pq, tr, counts, r0s, t_range = chunk_events_batch(
            x, y, p, t, valid, height=H, width=W, chunk=256,
            integer_coords=True,
        )
        got = np.asarray(
            voxelize_chunked_bilinear_t(
                xq, yq, pq, tr, counts, r0s, t_range,
                num_bins=C, height=H, width=W, separate_pol=sep,
                interpret=True,
            )
        )
        ref = np.stack([
            np.asarray(
                voxel_grid_bilinear_t(
                    x[w], y[w], p[w], t[w], valid[w],
                    num_bins=C, height=H, width=W, separate_pol=sep,
                )
            )
            for w in range(nw)
        ])
        scale = np.abs(ref).max() + 1e-9
        err = np.abs(got - ref).max() / scale
        assert err < 5e-3, (sep, err)


def test_t16_time_quantization_error_bound(rng):
    """Wire v2 (t16=True): the uint16 relative time must dequantize to
    within t_range/131070 of the exact f32 relative time — the round-half-
    even bound the wire format documents (two orders below the reference's
    ~64 µs f32 ulp on absolute µs timestamps,
    DSEC/dataset/representations.py:24)."""
    H, W, k = 48, 96, 4000
    x = rng.uniform(0, W - 1, (k,)).astype(np.float32)
    y = rng.uniform(0, H - 1, (k,)).astype(np.float32)
    p = rng.integers(0, 2, (k,)).astype(np.float32)
    t = np.sort(rng.uniform(1e9, 1e9 + 5e4, (k,)))  # absolute µs, 50 ms
    v = np.ones((k,), bool)
    f32 = chunk_events_window(x, y, p, t, v, height=H, width=W, t16=False)
    u16 = chunk_events_window(x, y, p, t, v, height=H, width=W, t16=True)
    assert u16[3].dtype == np.uint16 and f32[3].dtype == np.float32
    # identical layout: only the time payload differs
    for i in (0, 1, 2, 4, 5, 6):
        np.testing.assert_array_equal(u16[i], f32[i])
    t_range = float(f32[6])
    counts = f32[4]
    for ci in range(len(counts)):
        n = counts[ci]
        deq = u16[3][ci, :n].astype(np.float64) * (t_range / 65535.0)
        err = np.abs(deq - f32[3][ci, :n].astype(np.float64)).max() if n else 0
        # half-quantum + a few f32 ulps (tscale division + product round)
        assert err <= t_range * (0.5 / 65535.0 + 2.0**-22), err


def test_chunked_trilinear_t16_matches_f32_wire(rng):
    """The voxel grid built from the 7 B/event v2 wire must match the 9 B
    v1 wire's grid to the time-quantization bound: the trilinear t-weight is
    linear in normalized time, so per-event weight error ≤ (C-1)/131070;
    the 5e-3 tolerance is the kernel's own bf16-accumulation noise floor
    (same bound as the chunked-vs-scatter comparisons above)."""
    C, H, W = 5, 48, 96
    x, y, p, t, valid = _events(rng, 2, 4000, H, W)
    grids = {}
    for t16 in (False, True):
        xq, yq, pq, tr, counts, r0s, t_range = chunk_events_batch(
            x, y, p, t, valid, height=H, width=W, chunk=256, t16=t16
        )
        grids[t16] = np.asarray(
            voxelize_chunked_trilinear(
                xq, yq, pq, tr, counts, r0s, t_range,
                num_bins=C, height=H, width=W, interpret=True,
            )
        )
    scale = np.abs(grids[False]).max() + 1e-9
    err = np.abs(grids[True] - grids[False]).max() / scale
    assert err < 5e-3, err


def test_chunked_trilinear_normalize(rng):
    C, H, W = 3, 32, 128
    x, y, p, t, valid = _events(rng, 1, 1000, H, W)
    xq, yq, pq, tr, counts, r0s, t_range = chunk_events_batch(
        x, y, p, t, valid, height=H, width=W, chunk=256
    )
    got = np.asarray(
        voxelize_chunked_trilinear(
            xq, yq, pq, tr, counts, r0s, t_range,
            num_bins=C, height=H, width=W, normalize=True, interpret=True,
        )
    )[0]
    nz = got[got != 0]
    assert abs(nz.mean()) < 1e-2
    assert abs(nz.std() - 1.0) < 5e-2


def test_pad_wire_chunks_pins_shape_bit_identically(rng):
    """Streaming wire-width pinning (tools/serve_stream.py): zero-padding a
    trimmed wire's chunk axis must not change the voxelized grid at all —
    padded chunks have counts == 0 and are masked exactly like a trimmed
    wire's own zero tail."""
    H, W, C, k = 64, 96, 5, 4000
    x, y, p, t, valid = _events(rng, 1, k, H, W)
    wire = chunk_events_batch(x, y, p, t, valid, height=H, width=W, t16=True)
    nbc = wire[0].shape[1]

    base = np.asarray(
        voxelize_chunked_trilinear(
            *wire, num_bins=C, height=H, width=W, interpret=True,
        )
    )
    padded = pad_wire_chunks(wire, nbc + 3)
    assert padded[0].shape[1] == nbc + 3
    # per-window scalars (t_range, ndim 1) ride through untouched
    assert padded[6].shape == wire[6].shape
    assert np.all(padded[4][:, nbc:] == 0)  # counts of padded chunks
    got = np.asarray(
        voxelize_chunked_trilinear(
            *padded, num_bins=C, height=H, width=W, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, base)

    # no-op when the wire already has >= nbc chunks (same objects back)
    same = pad_wire_chunks(wire, nbc)
    assert same[0] is wire[0]
