#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: voxelization throughput (events/s) on a DSEC-shaped sample
(20 windows x 100k events -> 100x480x640 grid), the north-star kernel.
``vs_baseline`` is the ratio against the reference-style numpy ``np.add.at``
voxelizer measured on this same host (the reference has no published
throughput numbers — BASELINE.md).

Extra context metrics (seg forward img/s, e2vid path samples/s) ride in the
same JSON object.

Timing note: device completion is forced via scalar fetch (float(...)) —
block_until_ready() does not block through the axon TPU relay.
"""
import json
import time

import numpy as np


def numpy_baseline_voxelize(x, y, p, t, C, H, W):
    tn = (C - 1) * (t - t[0]) / max(t[-1] - t[0], 1e-9)
    x0 = np.fix(x).astype(np.int64)
    y0 = np.fix(y).astype(np.int64)
    t0 = np.fix(tn).astype(np.int64)
    val = 2 * p - 1
    grid = np.zeros(C * H * W, np.float32)
    for xl in (x0, x0 + 1):
        for yl in (y0, y0 + 1):
            for tl in (t0, t0 + 1):
                m = (xl < W) & (xl >= 0) & (yl < H) & (yl >= 0) & (tl >= 0) & (tl < C)
                w = val * (1 - np.abs(xl - x)) * (1 - np.abs(yl - y)) * (1 - np.abs(tl - tn))
                np.add.at(grid, ((tl * H + yl) * W + xl)[m], w[m])
    return grid


def main():
    import jax
    import jax.numpy as jnp

    from openess_tpu.models import DeepLabV3TextSeg, E2VIDReconstructor, SemSegE2VID
    from openess_tpu.ops import voxelize_windows_trilinear

    rng = np.random.default_rng(0)
    NW, K, C, H, W = 20, 100_000, 5, 480, 640
    N = NW * K
    x = rng.uniform(0, W - 1, N).astype(np.float32)
    y = rng.uniform(0, H - 1, N).astype(np.float32)
    p = rng.integers(0, 2, N).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e6, N)).astype(np.float32)
    valid = np.ones(N, bool)

    # --- numpy reference baseline (single window slice, scaled) ---
    nb = 200_000
    t0 = time.perf_counter()
    numpy_baseline_voxelize(x[:nb], y[:nb], p[:nb], t[:nb], C, H, W)
    np_rate = nb / (time.perf_counter() - t0)

    # --- device voxelization ---
    args = [jax.device_put(a) for a in (x, y, p, t, valid)]

    @jax.jit
    def vox(x, y, p, t, v):
        g = voxelize_windows_trilinear(
            x, y, p, t, v, num_windows=NW, num_bins=C, height=H, width=W
        )
        return jnp.sum(jnp.abs(g))

    float(vox(*args))  # warmup
    times = []
    for _ in range(3):
        s = time.perf_counter()
        float(vox(*args))
        times.append(time.perf_counter() - s)
    dev_rate = N / min(times)

    # --- native C++ host voxelizer (the data-plane path) ---
    from openess_tpu.native import HAVE_NATIVE, voxelize_trilinear_host

    native_rate = 0.0
    if HAVE_NATIVE:
        times = []
        for _ in range(3):
            s = time.perf_counter()
            for wi in range(NW):
                sl = slice(wi * K, (wi + 1) * K)
                voxelize_trilinear_host(x[sl], y[sl], p[sl], t[sl], C, H, W)
            times.append(time.perf_counter() - s)
        native_rate = N / min(times)
    pipeline_rate = max(native_rate, dev_rate)

    # --- seg student forward, bf16 ---
    B, SH, SW, NC = 8, 440, 640, 11
    model = DeepLabV3TextSeg(num_classes=NC, output_stride=16, dtype=jnp.bfloat16)
    xb = jax.device_put(rng.uniform(size=(B, SH, SW, 3)).astype(np.float32))
    text = jnp.asarray(rng.normal(0, 0.01, (NC, 512)), jnp.float32)
    params = model.init(jax.random.key(0), xb[:1], text)

    @jax.jit
    def seg(params, xb):
        logits, _ = model.apply(params, xb, text)
        return jnp.sum(logits.astype(jnp.float32))

    float(seg(params, xb))
    times = []
    for _ in range(3):
        s = time.perf_counter()
        float(seg(params, xb))
        times.append(time.perf_counter() - s)
    seg_rate = B / min(times)

    # --- e2vid event path (20-window scan + head), bf16 ---
    recon = E2VIDReconstructor(dtype=jnp.bfloat16)
    head = SemSegE2VID(num_classes=NC, dtype=jnp.bfloat16)
    wins = jax.device_put(rng.normal(size=(2, NW, SH, SW, 5)).astype(np.float32))
    rp = recon.init(jax.random.key(0), wins[:1, :2])
    lat0 = {
        "2": jnp.zeros((1, SH // 2, SW // 2, 64), jnp.bfloat16),
        "4": jnp.zeros((1, SH // 4, SW // 4, 128), jnp.bfloat16),
        "8": jnp.zeros((1, SH // 8, SW // 8, 256), jnp.bfloat16),
    }
    hp = head.init(jax.random.key(1), lat0, text)

    @jax.jit
    def epath(rp, hp, wins):
        _, latent = recon.apply(rp, wins)
        logits, _ = head.apply(hp, {k: latent[k] for k in ("2", "4", "8")}, text)
        return jnp.sum(logits.astype(jnp.float32))

    float(epath(rp, hp, wins))
    times = []
    for _ in range(3):
        s = time.perf_counter()
        float(epath(rp, hp, wins))
        times.append(time.perf_counter() - s)
    epath_rate = 2 / min(times)

    print(
        json.dumps(
            {
                "metric": "voxelize_throughput",
                "value": round(pipeline_rate, 0),
                "unit": "events/s",
                "vs_baseline": round(pipeline_rate / np_rate, 2),
                "extra": {
                    "numpy_baseline_events_per_s": round(np_rate, 0),
                    "native_host_events_per_s": round(native_rate, 0),
                    "tpu_scatter_events_per_s": round(dev_rate, 0),
                    "seg_fwd_img_per_s_bf16_440x640": round(seg_rate, 1),
                    "e2vid20_path_samples_per_s": round(epath_rate, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
