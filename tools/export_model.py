#!/usr/bin/env python
"""AOT-export the inference step as a serialized ``jax.export`` artifact.

Serving deployment path the torch reference has no analog for: the full
seg forward (event voxel windows -> E2VID scan -> SemSegE2VID head ->
argmax, or frame/recon -> DeepLabV3 -> argmax) is traced ONCE, lowered to
StableHLO with the weights embedded as constants, and serialized to a
single file. A server process then deserializes and calls it without any
Python model code, flax, or checkpoint plumbing — and with compile-once
startup semantics (reference inference entry: ``test.py:42-47`` +
``base_trainer_ov.py:402-471``, which re-builds the whole trainer instead).

Input contract (static shapes, chosen at export time):
  voxel options (recon2voxel / frame2voxel): ``event`` [B, T, C, H, W] f32
    — the planar voxel-grid wire format (tpu: wire_format: grid). The
    raw-event wire's chunk count is data-dependent, so serving feeds grids
    (host packer or upstream voxelizer).
  frame2recon: ``recon`` [B, H, W, 3] f32 in [0, 1].
Output: ``(pred [B, H, W] int32, logits [B, H, W, num_classes])``.

``--streaming`` (voxel options) instead exports the real-time serving step
``(states, window [B, C, H, W] f32) -> (states, pred, logits)``: the caller
holds the ConvLSTM states between calls (zeros at stream start, shapes in
the artifact's ``in_avals``), paying ONE window of compute per frame
instead of replaying the T-window history.

Usage:
  python tools/export_model.py --settings_file configs/<cfg>.yaml \
      --output /path/model.jexp [--checkpoint <orbax model-only dir>] \
      [--batch_size N] [--selfcheck]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def build_infer_fn(s, mset):
    """Closure (inputs) -> (pred, logits) with weights baked in."""
    import jax
    import jax.numpy as jnp

    from openess_tpu.training.build import VOXEL_OPTIONS
    from openess_tpu.training.steps import StepBuilder

    sb = StepBuilder(s, mset)
    params, bstats = mset.params, mset.batch_stats

    if s.config_option in VOXEL_OPTIONS:
        def infer(event):
            logits, _ = sb._event_path(
                params, bstats, {"event": event}, False, None
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), logits

        h, w = s.img_size_b
        spec = jax.ShapeDtypeStruct(
            (s.batch_size_b, s.nr_events_data_b, s.input_channels_b, h, w),
            jnp.float32,
        )
    else:
        def infer(recon):
            logits, _, _ = sb._deeplab(
                "model_recon", params, bstats, recon, False, None
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), logits

        h, w = s.img_size_b
        spec = jax.ShapeDtypeStruct((s.batch_size_b, h, w, 3), jnp.float32)
    return infer, spec


def build_streaming_fn(s, mset):
    """Closure ``(carry, window) -> (carry, pred, logits)`` for real-time
    serving: ONE planar ``[B, bins, H, W]`` voxel window per call, the
    ConvLSTM states carried by the caller (zeros at stream start — the
    artifact's ``in_avals`` spell out the carry pytree). Pays one window of
    compute per frame instead of replaying the full T-window history."""
    import jax
    import jax.numpy as jnp

    from openess_tpu.models.e2vid import (
        E2VIDStreamingStep,
        initial_stream_state,
    )
    from openess_tpu.training.steps import StepBuilder

    sb = StepBuilder(s, mset)
    params, bstats = mset.params, mset.batch_stats
    dt = jnp.bfloat16 if s.compute_dtype == "bfloat16" else jnp.float32
    stream = E2VIDStreamingStep(
        num_bins=s.input_channels_b, normalize=True, dtype=dt,
        latent_only=True,
    )
    h, w = s.img_size_b

    def infer(states, window):
        states, latent, _ = stream.apply(
            {"params": params["front_sensor_b"]}, states, window
        )
        (logits, _), _ = sb._apply(
            "back_end", params, bstats, latent, sb.mset.text_embeddings,
            train=False,
        )
        return states, jnp.argmax(logits, axis=-1).astype(jnp.int32), logits

    carry0 = initial_stream_state(s.batch_size_b, h, w, dtype=dt)
    win_spec = jax.ShapeDtypeStruct(
        (s.batch_size_b, s.input_channels_b, h, w), jnp.float32
    )
    return infer, (jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), carry0
    ), win_spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings_file", required=True)
    ap.add_argument("--output", required=True, help="artifact path (.jexp)")
    ap.add_argument("--checkpoint", default="",
                    help="orbax model-only checkpoint dir (epoch_N) to embed")
    ap.add_argument("--batch_size", type=int, default=0,
                    help="override the config batch size for the artifact")
    ap.add_argument("--poly_batch", action="store_true",
                    help="export with a SYMBOLIC batch dimension (jax.export "
                         "shape polymorphism): one artifact serves any batch "
                         "size")
    ap.add_argument("--streaming", action="store_true",
                    help="export the STREAMING serving step (voxel options "
                         "only): (carry, window[B, bins, H, W]) -> (carry, "
                         "pred, logits), one window of compute per frame "
                         "with caller-carried ConvLSTM state")
    ap.add_argument("--selfcheck", action="store_true",
                    help="deserialize and diff vs the live jit on random "
                         "inputs before writing")
    args = ap.parse_args()

    import jax
    from jax import export as jexport

    from openess_tpu.config.settings import load_settings
    from openess_tpu.training.build import build_models
    from openess_tpu.training.checkpoint import load_model_only

    s = load_settings(args.settings_file)
    if args.batch_size:
        s.batch_size_b = args.batch_size
    mset = build_models(s, seed=0)
    if args.checkpoint:
        import dataclasses

        p, bs = load_model_only(args.checkpoint, mset.params, mset.batch_stats)
        mset = dataclasses.replace(mset, params=p, batch_stats=bs)

    if args.streaming:
        from openess_tpu.training.build import VOXEL_OPTIONS

        if s.config_option not in VOXEL_OPTIONS:
            raise SystemExit("--streaming requires a voxel config_option")
        if args.poly_batch:
            raise SystemExit("--streaming and --poly_batch are exclusive "
                             "(the carried state pins the batch size)")
        infer, (carry_spec, win_spec) = build_streaming_fn(s, mset)
        exported = jexport.export(jax.jit(infer))(carry_spec, win_spec)
        blob = exported.serialize()
        if args.selfcheck:
            carry = jax.tree.map(
                lambda a: np.zeros(a.shape, a.dtype), carry_spec
            )
            x = np.random.default_rng(0).normal(
                0, 0.5, win_spec.shape
            ).astype(np.float32)
            restored = jexport.deserialize(blob)
            live, art = carry, carry
            for _ in range(3):  # carry round-trips through the artifact
                live, pred_live, logits_live = jax.jit(infer)(live, x)
                art, pred_art, logits_art = restored.call(art, x)
            np.testing.assert_array_equal(
                np.asarray(pred_live), np.asarray(pred_art)
            )
            np.testing.assert_allclose(
                np.asarray(logits_live, np.float32),
                np.asarray(logits_art, np.float32), atol=1e-5,
            )
            for a, b in zip(jax.tree.leaves(live), jax.tree.leaves(art)):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    atol=1e-5,
                )
            print("selfcheck OK: streaming artifact matches live jit")
        spec = win_spec
    else:
        infer, spec = build_infer_fn(s, mset)
        if args.poly_batch:
            b = jexport.symbolic_shape("b")[0]
            spec = jax.ShapeDtypeStruct((b,) + tuple(spec.shape[1:]), spec.dtype)
        exported = jexport.export(jax.jit(infer))(spec)
        blob = exported.serialize()

        if args.selfcheck:
            shape = tuple(
                2 if jexport.is_symbolic_dim(d) else d for d in spec.shape
            )
            x = np.random.default_rng(0).normal(0, 0.5, shape).astype(np.float32)
            pred_live, logits_live = jax.jit(infer)(x)
            restored = jexport.deserialize(blob)
            pred_art, logits_art = restored.call(x)
            np.testing.assert_array_equal(np.asarray(pred_live), np.asarray(pred_art))
            np.testing.assert_allclose(
                np.asarray(logits_live), np.asarray(logits_art), atol=1e-5
            )
            print("selfcheck OK: artifact matches live jit")

    with open(args.output, "wb") as f:
        f.write(blob)
    print(
        f"exported {args.output}: {len(blob) / 1e6:.1f} MB, "
        f"platforms={exported.platforms}, input={tuple(spec.shape)}, "
        f"in_avals={[str(a) for a in exported.in_avals]}"
    )


if __name__ == "__main__":
    main()
