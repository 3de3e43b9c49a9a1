#!/usr/bin/env python
"""Real-time streaming segmentation server demo: events in, labels out.

The reference's only inference entry replays the FULL 20-window event
history per prediction (``test.py:42-47`` + ``base_trainer_ov.py:402-471``).
This tool drives the TPU-native streaming path instead — carried ConvLSTM
state, ONE window of compute per frame:

  host: pack the window's raw events onto the sorted-chunk wire (C++)
  chip: voxelize (Pallas) -> E2VID window -> SemSegE2VID head -> argmax

and reports the achieved serving rate against a target label rate
(DSEC-Semantic labels arrive at ~20 Hz/camera), i.e. the north star's
"full-rate seg forward" as a runnable artifact rather than a bench number.

Input: a ``.txt``/``.zip`` event stream (``t x y pol`` rows, one header
line — the e2vid reader contract, ``e2vid/utils/event_readers.py``) cut
into fixed-count windows, or ``--synthetic N`` random windows. ``--streams
S`` serves S concurrent copies of the stream batched into one step call
(state pins the batch size, so S is fixed at startup — matching
``tools/export_model.py --streaming --batch_size S`` artifacts).

Usage:
  python tools/serve_stream.py --settings_file configs/<cfg>.yaml \
      [--checkpoint <orbax model-only epoch dir>] [--artifact model.jexp] \
      [--events events.zip | --synthetic 40] [--window_events 100000] \
      [--streams S] [--rate_hz 20] [--out_dir preds/]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def event_window_source(args, sensor_h, sensor_w):
    """Yield (x, y, p, t) float windows of ``--window_events`` events."""
    if args.events:
        from openess_tpu.data.event_file_readers import (
            fixed_size_event_windows,
        )

        for win in fixed_size_event_windows(args.events, args.window_events):
            t, x, y, p = (win[:, i] for i in range(4))
            yield x, y, p, t
        return
    rng = np.random.default_rng(0)
    k = args.window_events
    for i in range(args.synthetic):
        yield (
            rng.uniform(0, sensor_w - 1, k),
            rng.uniform(0, sensor_h - 1, k),
            rng.integers(0, 2, k).astype(np.float64),
            np.sort(rng.uniform(50e3 * i, 50e3 * (i + 1), k)),
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings_file", required=True)
    ap.add_argument("--checkpoint", default="",
                    help="orbax model-only checkpoint dir (epoch_N)")
    ap.add_argument("--artifact", default="",
                    help="serve a tools/export_model.py --streaming .jexp "
                         "artifact instead of live jit (its batch size must "
                         "equal --streams)")
    ap.add_argument("--events", default="",
                    help=".txt/.zip event stream (t x y pol, header line)")
    ap.add_argument("--synthetic", type=int, default=20,
                    help="serve N synthetic windows when no --events")
    ap.add_argument("--window_events", type=int, default=100_000)
    ap.add_argument("--streams", type=int, default=1,
                    help="concurrent stream copies batched per step call")
    ap.add_argument("--rate_hz", type=float, default=20.0,
                    help="target per-stream label rate (DSEC ~20 Hz)")
    ap.add_argument("--sensor_size", default="",
                    help="H,W of the event sensor before crop (default: "
                         "DSEC 480,640 for 440-row configs, else img_size)")
    ap.add_argument("--out_dir", default="",
                    help="write per-window colorized prediction PNGs here")
    ap.add_argument("--max_windows", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openess_tpu.config.settings import load_settings
    from openess_tpu.data.device_voxelize import (
        pack_wire_batch,
        voxelize_wire,
    )
    from openess_tpu.native import chunk_events_windows_host
    from openess_tpu.training.build import VOXEL_OPTIONS, build_models

    s = load_settings(args.settings_file)
    if s.config_option not in VOXEL_OPTIONS:
        raise SystemExit("streaming serving requires a voxel config_option")
    S = args.streams
    h, w = (int(v) for v in s.img_size_b)
    # pack at the SENSOR size; voxelize_wire applies the dataset's post-ops
    # (DSEC 40-row crop / DDD17 resize+crop) exactly as the train/eval path
    integer_coords = False
    if args.sensor_size:
        sh, sw = (int(v) for v in args.sensor_size.split(","))
    elif s.dataset_name_b == "DSEC_events":
        sh, sw = 480, 640
    elif s.dataset_name_b == "DDD17_events":
        from openess_tpu.data.ddd17 import HEIGHT, WIDTH

        sh, sw = HEIGHT, WIDTH
        integer_coords = True
    else:
        sh, sw = h, w

    @jax.jit
    def voxelize(batch):
        return voxelize_wire(s, batch)[:, 0]  # [S, 1, C, H, W] -> [S, ...]

    if args.artifact:
        from jax import export as jexport

        from openess_tpu.models.e2vid import initial_stream_state

        restored = jexport.deserialize(open(args.artifact, "rb").read())
        win_aval = restored.in_avals[-1]
        if win_aval.shape[0] != S:
            raise SystemExit(
                f"artifact batch {win_aval.shape[0]} != --streams {S}"
            )
        # the carry pytree structure is initial_stream_state's (the export
        # contract, tools/export_model.py); dtype from the artifact's avals
        carry = initial_stream_state(
            S, h, w, dtype=restored.in_avals[0].dtype
        )

        def step(carry, batch):
            carry, pred, _ = restored.call(carry, voxelize(batch))
            return carry, pred
    else:
        import dataclasses

        from openess_tpu.models.e2vid import (
            E2VIDStreamingStep,
            initial_stream_state,
        )
        from openess_tpu.training.checkpoint import load_model_only
        from openess_tpu.training.steps import StepBuilder

        s.batch_size_b = S
        mset = build_models(s, seed=0)
        if args.checkpoint:
            p, bs = load_model_only(
                args.checkpoint, mset.params, mset.batch_stats
            )
            mset = dataclasses.replace(mset, params=p, batch_stats=bs)
        sb = StepBuilder(s, mset)
        dt = jnp.bfloat16 if s.compute_dtype == "bfloat16" else jnp.float32
        stream = E2VIDStreamingStep(
            num_bins=s.input_channels_b, normalize=True, dtype=dt,
            latent_only=True,
        )
        params, bstats = mset.params, mset.batch_stats

        @jax.jit  # voxelize fused in: ONE dispatch round-trip per window
        def step(carry, batch):
            window = voxelize_wire(s, batch)[:, 0]
            st, latent, _ = stream.apply(
                {"params": params["front_sensor_b"]}, carry, window
            )
            (logits, _), _ = sb._apply(
                "back_end", params, bstats, latent, mset.text_embeddings,
                train=False,
            )
            # uint8 label map: 4x less D2H wire than int32 (num_classes
            # <= 255 always holds for the DSEC-11 / DDD17-6 label spaces)
            return tuple(st), jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        carry = tuple(initial_stream_state(S, h, w, dtype=dt))

    budget_ms = 1e3 / args.rate_hz
    lat, phases, n = [], [], 0
    # Pin the wire's chunk-axis width across windows: a per-window bucketed
    # trim would change the wire SHAPE whenever event density shifts,
    # forcing a jit retrace of step/voxelize mid-stream — each retrace blows
    # the real-time budget this tool measures (ADVICE r4). The pin grows
    # monotonically (one retrace per new density high-water mark, then
    # stable); sparser windows are zero-padded up to it (zero counts are
    # masked chunks in the voxelizer).
    pinned_nbc = 0
    pending = None  # window n-1's labels, still on device (double buffer)

    def emit(pred_np, idx):
        if not args.out_dir:
            return
        from openess_tpu.utils.viz import colorize_semseg, save_png

        os.makedirs(args.out_dir, exist_ok=True)
        rgb = colorize_semseg(
            pred_np[0], s.semseg_color_map, s.semseg_ignore_label
        )
        save_png(os.path.join(args.out_dir, f"pred_{idx:06d}.png"), rgb)

    for x, y, p, t in event_window_source(args, sh, sw):
        t0 = time.perf_counter()
        xs = np.broadcast_to(x.astype(np.float32), (S, x.size))
        ys = np.broadcast_to(y.astype(np.float32), (S, y.size))
        ps = np.broadcast_to(p.astype(np.float32), (S, p.size))
        ts = np.broadcast_to(t.astype(np.float64), (S, t.size))
        va = np.ones((S, x.size), bool)
        wire = chunk_events_windows_host(
            xs, ys, ps, ts, va, height=sh, width=sw, n_threads=1,
            integer_coords=integer_coords, t16=s.wire_t16,
        )
        from openess_tpu.ops.voxelize_chunked import pad_wire_chunks

        pinned_nbc = max(pinned_nbc, wire[0].shape[1])
        wire = pad_wire_chunks(wire, pinned_nbc)
        t1 = time.perf_counter()
        dev = {
            k: jax.device_put(v)
            for k, v in pack_wire_batch(wire, S, 1).items()
        }
        t2 = time.perf_counter()
        # double-buffered serving: window n-1's step was dispatched last
        # iteration and computed WHILE this window was packed + uploaded, so
        # fetching its labels now pays only the transfer, not the compute.
        # The fetch goes BEFORE this window's dispatch: the transport
        # processes requests in order, so fetch-after-dispatch would queue
        # behind window n's full compute. Labels arrive one window late,
        # well inside any real-time budget.
        if pending is not None:
            if args.out_dir:
                emit(np.asarray(pending), n - 1)
            else:
                # no consumer: sync on a device-side scalar (8 B fetch)
                # instead of shipping a label map nobody reads — the labels
                # are ready on-device for a real consumer either way
                float(jnp.sum(pending))
        carry, pred = step(carry, dev)
        # label maps ride D2H as uint8 (<=19 classes): 4x less transfer
        # than the step's int32 argmax — on this relay that's the
        # difference between fitting the 20 Hz budget and not
        pending = pred.astype(jnp.uint8)
        t3 = time.perf_counter()
        ms = (t3 - t0) * 1e3
        if n > 0:  # first call pays compile; not a serving-rate sample
            lat.append(ms)
            phases.append(((t1 - t0) * 1e3, (t2 - t1) * 1e3, (t3 - t2) * 1e3))
        n += 1
        if args.max_windows and n >= args.max_windows:
            break
    if pending is not None:  # drain the last in-flight window
        emit(np.asarray(pending), n - 1)

    if not lat:
        raise SystemExit("need >= 2 windows to measure the serving rate")
    lat = np.array(lat)
    p50, p95 = np.percentile(lat, 50), np.percentile(lat, 95)
    rate = 1e3 / p50
    pk, pu, pc = np.median(np.array(phases), axis=0)
    print(f"served {n} windows x {S} stream(s): "
          f"p50 {p50:.1f} ms  p95 {p95:.1f} ms per window "
          f"(pack {pk:.1f} + wire-upload {pu:.1f} "
          f"+ prev-fetch+dispatch {pc:.1f})")
    print(f"per-stream rate {rate:.1f} windows/s "
          f"({S * rate:.1f}/chip aggregate); target {args.rate_hz:.0f} Hz "
          f"({budget_ms:.0f} ms budget) -> real-time margin "
          f"{budget_ms / p50:.2f}x "
          f"{'OK' if p50 <= budget_ms else 'UNDER-RATE'}")


if __name__ == "__main__":
    main()
