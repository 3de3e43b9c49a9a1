#!/usr/bin/env python
"""MFU ledger evidence probe (docs/ROOFLINE.md attribution rows).

Re-measures, on the real chip, the pieces of the flagship pretrain step
that the ROOFLINE attribution table bounds:

1. ``fold_bn``'s step delta: the full train step with
   ``tpu: teacher_fold_bn/student_fold_bn`` ON vs OFF.
2. The frozen-teacher row: its forward walled alone, plus XLA
   ``cost_analysis`` FLOPs/bytes giving the analytic MXU and HBM floors.
3. The backward+optimizer row: the residual between the full step and a
   losses-forward-only jit of ``StepBuilder.compute_losses`` (no grad).

All timings are scalar-fetch (``float(...)`` per call — through the axon
relay ``block_until_ready`` does not actually block); the relay's fixed
~29-30 ms fetch floor rides every number, so only DIFFERENCES between
same-shaped runs are floor-free. Prints one result dict.

r5 measured (TPU v5e, idle host): step 518.0 (fold OFF) -> 509.8 ms (ON);
teacher fwd 104.5 ms walled = 6.61 TF / 41.7 GB accessed (HBM floor
50.9 ms at 819 GB/s -> 68 % of the HBM roofline); fwd-only 436.2 ms ->
backward+optimizer residual 73.6 ms.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, n=5):
    fn()  # warm (first call may compile)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def build(settings_file, fold):
    import jax.numpy as jnp

    from openess_tpu.config.settings import load_settings
    from openess_tpu.training.build import build_models, trainable_labels
    from openess_tpu.training.optim import make_optimizer
    from openess_tpu.training.steps import StepBuilder, TrainState

    s = load_settings(settings_file)
    s.teacher_fold_bn = fold
    s.student_fold_bn = fold
    mset = build_models(s, seed=0)
    labels = trainable_labels(mset, s)
    tx = make_optimizer(s, labels, steps_per_epoch=100)
    sb = StepBuilder(s, mset, tx)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=mset.params,
                       batch_stats=mset.batch_stats,
                       opt_state=tx.init(mset.params))
    return s, sb, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--settings_file",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs/pretrain/DSEC/frame2voxel_fcclip_slic.yaml",
        ),
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B  # the bench builders make the real-shaped host batch

    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
    s0, _, _ = build(args.settings_file, True)
    host_batch = B.make_host_batch(rng, s0, s0.batch_size_b)
    batch = {k: jax.device_put(v) for k, v in host_batch.items()}
    key, ep = jax.random.key(0), jnp.asarray(0)

    results = {}
    for fold in (True, False):
        s_f, sb_f, state_f = build(args.settings_file, fold)

        # teacher fwd alone FIRST: the train step donates (deletes) params
        from openess_tpu.models.image_teacher import DilationFeatureExtractor

        teacher = DilationFeatureExtractor(
            output_stride=int(s_f.teacher_os), fold_bn=fold,
            dtype=jnp.bfloat16,
        )
        tp = jax.device_get(state_f.params["model_frame"])
        tb = jax.device_get((state_f.batch_stats or {}).get("model_frame"))
        var = {"params": jax.device_put(tp)}
        if tb:
            var["batch_stats"] = jax.device_put(tb)

        @jax.jit
        def teacher_fwd(v, img):
            out = teacher.apply(v, img.astype(jnp.bfloat16), train=False)
            feat = out[0] if isinstance(out, tuple) else out
            return jnp.sum(feat.astype(jnp.float32))

        frame = batch["frame"]
        ms_t = timed(lambda: float(teacher_fwd(var, frame)))
        results[f"teacher_fwd_ms_fold_{fold}"] = round(ms_t, 1)
        try:
            ca = teacher_fwd.lower(var, frame).compile().cost_analysis()
            results[f"teacher_flops_fold_{fold}"] = ca.get("flops")
            results[f"teacher_bytes_fold_{fold}"] = ca.get("bytes accessed")
        except Exception as e:  # older jax: cost_analysis shape differs
            print("teacher cost_analysis unavailable:", e, flush=True)
        print(f"fold_bn={fold}: teacher fwd (walled) {ms_t:.1f} ms",
              flush=True)

        step = sb_f.make_train_step()
        holder = {"st": state_f}

        def run_step():
            st2, losses = step(holder["st"], batch, key, ep)
            holder["st"] = st2
            float(losses["total_loss"])

        ms = timed(run_step)
        results[f"step_ms_fold_{fold}"] = round(ms, 1)
        print(f"fold_bn={fold}: step {ms:.1f} ms", flush=True)

        sb_cl = sb_f

        @jax.jit
        def fwd_only(params, bstats, b, k):
            t_loss, _, _ = sb_cl.compute_losses(params, bstats, b, k, ep)
            return t_loss

        st = holder["st"]
        ms_f = timed(lambda: float(fwd_only(st.params, st.batch_stats,
                                            batch, key)))
        results[f"fwd_only_ms_fold_{fold}"] = round(ms_f, 1)
        results[f"bwd_opt_residual_ms_fold_{fold}"] = round(ms - ms_f, 1)
        print(f"fold_bn={fold}: fwd-only {ms_f:.1f} ms "
              f"(bwd+opt residual {ms - ms_f:.1f} ms)", flush=True)

    print(results)


if __name__ == "__main__":
    main()
