"""Mesh-scaling MECHANISM evidence (VERDICT r2 Next #8): beyond numerics
equivalence (test_parallel.py), assert the sharding actually divides work —
channel-TP cuts per-device FLOPs, and the compiled modules contain the
expected collectives (TP: all-gather/all-reduce on activations; spatial:
halo exchanges). Compile-only on the virtual 8-device CPU mesh: no
execution, so no collective-rendezvous flakiness.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openess_tpu.config.settings import Settings
from openess_tpu.data.synthetic import SyntheticESS
from openess_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_params_tp,
)
from openess_tpu.training.build import build_models

H, W, C = 32, 64, 6

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def _forward_compiled(data_ax, model_ax, spatial=False):
    s = Settings()
    s.dataset_name_b = "synthetic_events"
    s.img_size_b = (H, W)
    s.semseg_num_classes = C
    s.nr_events_data_b = 2
    s.compute_dtype = "float32"
    s.if_supervised_only = True
    s.config_option = "frame2recon"
    s.data_augmentation_train = False
    s.__post_init__()
    mset = build_models(s, seed=0)
    mesh = make_mesh(data_ax, model_ax)
    params = shard_params_tp(mset.params, mesh)
    bstats = replicate(mset.batch_stats, mesh)
    ds = SyntheticESS(num_samples=4, height=H, width=W, num_classes=C,
                      num_windows=2)
    batch = shard_batch(ds.voxelized_batch([0, 1, 2, 3]), mesh,
                        spatial=spatial)
    module = mset.modules["model_recon"]
    text = mset.text_embeddings

    @jax.jit
    def fwd(params, bstats, x):
        (logits, feats), _ = module.apply(
            {"params": params["model_recon"],
             "batch_stats": bstats["model_recon"]},
            x, text, train=False,
        ), None
        return jnp.argmax(logits, axis=-1)

    compiled = fwd.lower(params, bstats, batch["recon"]).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    hlo = compiled.as_text()
    counts = {
        c: len(re.findall(rf"\b{c}(?:-start)?\b", hlo)) for c in COLLECTIVES
    }
    return flops, counts


def test_channel_tp_divides_per_device_flops():
    """At fixed data=2, adding model=2 channel-TP must substantially cut
    per-device forward FLOPs (the >=256-wide backbone/ASPP/classifier
    kernels — the bulk of the compute — shard on the model axis)."""
    flops_dp, counts_dp = _forward_compiled(2, 1)
    flops_tp, counts_tp = _forward_compiled(2, 2)
    assert flops_dp > 0 and flops_tp > 0
    ratio = flops_tp / flops_dp
    # ideal 0.5 for fully-sharded compute; narrow stem/head layers stay
    # replicated, so allow overhead — but it must be a real division of work
    assert ratio < 0.75, (flops_tp, flops_dp, ratio)
    # pure DP forward needs no cross-device communication...
    assert sum(counts_dp.values()) == 0, counts_dp
    # ...channel-TP must insert activation collectives
    assert sum(counts_tp.values()) > 0, counts_tp
    print(f"per-device flops: dp={flops_dp:.3e} tp={flops_tp:.3e} "
          f"ratio={ratio:.2f}; tp collectives={counts_tp}")


def test_spatial_partitioning_inserts_halo_exchange():
    """Height-sharding the activations makes GSPMD insert halo exchanges
    (collective-permute) for the conv windows."""
    flops_dp, _ = _forward_compiled(2, 1)
    flops_sp, counts_sp = _forward_compiled(2, 2, spatial=True)
    assert counts_sp["collective-permute"] > 0, counts_sp
    # spatial mode splits compute too (halo overlap adds a little back)
    assert flops_sp < 0.8 * flops_dp, (flops_sp, flops_dp)
    print(f"spatial collectives={counts_sp} flops ratio="
          f"{flops_sp / flops_dp:.2f}")
