"""Optimizers: per-model AdamW groups + epoch-wise cosine annealing.

Mirrors the reference's dict of ``torch.optim.AdamW`` per model
(pretrain_trainer.py:211-274) with one ``CosineAnnealingLR(T_max=num_epochs)``
per optimizer stepped each epoch (base_trainer_ov.py:68-75), expressed as a
single ``optax.multi_transform`` over a labeled parameter tree. Frozen leaves
get ``optax.set_to_zero`` (no moment buffers, no updates).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax

from openess_tpu.config.settings import Settings


def epoch_cosine_schedule(lr0: float, steps_per_epoch: int, num_epochs: int):
    """torch CosineAnnealingLR stepped per-epoch: lr constant within an epoch."""

    def sched(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), num_epochs)
        return lr0 * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / num_epochs))

    return sched


def make_optimizer(s: Settings, labels, steps_per_epoch: int):
    def group(lr0):
        return optax.adamw(
            epoch_cosine_schedule(lr0, steps_per_epoch, s.num_epochs),
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=s.weight_decay,  # torch AdamW applies wd to all params
        )

    transforms = {
        "recon": group(s.lr_recon),
        "frame": group(s.lr_frame),
        "voxel": group(s.lr_voxel),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, labels)
