"""Trainer: epoch loop, validation, checkpointing (reference:
training/base_trainer_ov.py:358-471) around the functional step core.

Unlike the reference's class-per-workload hierarchy, one Trainer serves all
five workloads — the behavioral differences live entirely in
``StepBuilder.compute_losses`` (steps.py), selected by the Settings.
"""
from __future__ import annotations

import logging
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openess_tpu.config.settings import Settings
from openess_tpu.metrics import MetricsSemseg
from openess_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_params_tp,
)
from openess_tpu.training import checkpoint as ckpt
from openess_tpu.training.build import build_models, trainable_labels
from openess_tpu.training.optim import make_optimizer
from openess_tpu.training.steps import StepBuilder, TrainState

log = logging.getLogger("openess_tpu")


class Trainer:
    def __init__(
        self,
        settings: Settings,
        dataset_train,
        dataset_val=None,
        mesh=None,
        seed: Optional[int] = None,
    ):
        self.s = settings
        self.train_data = dataset_train
        self.val_data = dataset_val
        seed = settings.seed if seed is None else seed
        self.rng = jax.random.key(seed)
        self.np_rng = np.random.default_rng(seed)

        self.mesh = mesh if mesh is not None else make_mesh(
            data=settings.mesh_data, model=settings.mesh_model
        )

        self.mset = build_models(settings, seed=seed)
        labels = trainable_labels(self.mset, settings)
        self.steps_per_epoch = max(
            1, len(dataset_train) // settings.batch_size_b
        )
        self.tx = make_optimizer(settings, labels, self.steps_per_epoch)
        self.sb = StepBuilder(settings, self.mset, self.tx, mesh=self.mesh)
        self.train_step = self.sb.make_train_step()
        self.eval_step = self.sb.make_eval_step()

        params = self.mset.params
        batch_stats = self.mset.batch_stats
        if settings.load_pretrained_weights and settings.pretrained_file:
            params, batch_stats = ckpt.load_pretrained_params(
                settings.pretrained_file, params, batch_stats,
                exclude_substrings=("linear_probe",),
            )
            log.info("loaded pretrained weights from %s", settings.pretrained_file)

        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )
        self.epoch = 0
        if settings.resume_training and settings.resume_ckpt_file:
            state, self.epoch = ckpt.restore_checkpoint(
                settings.resume_ckpt_file, state,
                restore_optimizer=settings.resume_restore_optimizer,
            )
            log.info("resumed from %s at epoch %d", settings.resume_ckpt_file, self.epoch)
        if settings.tp_mode == "channel" and self.mesh.shape["model"] > 1:
            # TP: wide kernels (and their optimizer moments — same dict
            # paths inside the adam state) shard on the model axis
            self.state = TrainState(
                step=replicate(state.step, self.mesh),
                params=shard_params_tp(state.params, self.mesh),
                batch_stats=replicate(state.batch_stats, self.mesh),
                opt_state=shard_params_tp(state.opt_state, self.mesh),
            )
        else:
            self.state = replicate(state, self.mesh)

        self.metrics = MetricsSemseg(
            settings.semseg_num_classes,
            settings.semseg_ignore_label,
            settings.semseg_class_names,
        )

    # ------------------------------------------------------------------

    def _batches(self, dataset, train: bool):
        from openess_tpu.data.pipeline import PrefetchLoader

        spatial = (
            self.s.tp_mode == "spatial" and self.mesh.shape["model"] > 1
        )
        loader = PrefetchLoader(
            dataset, self.s.batch_size_b,
            shuffle=train, rng=self.np_rng,
            put_fn=lambda b: shard_batch(b, self.mesh, spatial=spatial),
            num_workers=self.s.num_cpu_workers,
            # reference validates with drop_last=False (base_trainer_ov.py:
            # 180,272); the padded final batch keeps shapes static and the
            # `valid` mask keeps the metrics exact
            drop_last=train, pad_last=not train,
        )
        yield from loader

    def train_epoch(self) -> dict:
        # Every batch's losses accumulate on-device (no per-step host sync);
        # one fetch at epoch end gives true epoch averages.
        sums, count = None, 0
        t0 = time.time()
        for bi, batch in enumerate(self._batches(self.train_data, train=True)):
            self.state, losses = self.train_step(
                self.state, batch, self.rng, jnp.asarray(self.epoch)
            )
            count += 1
            sums = losses if sums is None else jax.tree.map(
                jnp.add, sums, losses
            )
            if (bi + 1) % 20 == 0 or bi == 0:
                log.info(
                    "epoch %d batch %d: %s",
                    self.epoch, bi,
                    {k: round(float(v), 4) for k, v in losses.items()},
                )
        dt = time.time() - t0
        log.info(
            "epoch %d done: %d steps in %.1fs (%.2f steps/s)",
            self.epoch, count, dt, count / max(dt, 1e-9),
        )
        if sums is None:
            return {}
        return {k: float(v) / count for k, v in sums.items()}

    def val_epoch(self) -> dict:
        if self.val_data is None:
            return {}
        self.metrics.reset()
        first_batch = None
        for batch in self._batches(self.val_data, train=False):
            if first_batch is None:
                first_batch = batch
            pred, _ = self.eval_step(
                self.state.params, self.state.batch_stats, batch
            )
            label = np.asarray(batch["label"])
            if "valid" in batch:  # mask padded samples out of the confusion
                valid = np.asarray(batch["valid"]).astype(bool)
                label = np.where(
                    valid[:, None, None], label, self.s.semseg_ignore_label
                )
            self.metrics.update_batch(np.asarray(pred), label)
        summary = self.metrics.get_metrics_summary()
        log.info(
            "epoch %d val: mIoU %.2f acc %.2f",
            self.epoch, summary["miou"], summary["acc"],
        )
        if self.s.vis_dir and first_batch is not None:
            try:
                self._write_visuals(first_batch, summary)
            except Exception:  # viz must never kill a run
                log.exception("visualization failed")
        return summary

    def _write_visuals(self, batch, summary) -> None:
        """Per-val-epoch qualitative dumps into ``vis_dir``: confusion-matrix
        plots (viz_utils.py:76-103, 148-176), colorized pred/GT panels,
        event previews, and the PCA latent-space map
        (base_trainer_ov.py:547-565)."""
        import os

        from openess_tpu.utils import viz

        d, e = self.s.vis_dir, self.epoch
        cm = np.asarray(summary["cm"])
        viz.confusion_matrix_png(cm, os.path.join(d, f"confusion_e{e:03d}.png"))
        viz.confusion_matrix_png(
            cm, os.path.join(d, f"confusion_norm_e{e:03d}.png"),
            normalize=True, class_names=self.s.semseg_class_names,
        )

        if not hasattr(self, "_viz_step"):
            self._viz_step = self.sb.make_viz_step()
        pred, feats = self._viz_step(
            self.state.params, self.state.batch_stats, batch
        )
        pred, feats = np.asarray(pred), np.asarray(feats)
        labels = np.asarray(batch["label"])
        n = min(4, pred.shape[0])
        cmap = self.s.semseg_color_map
        panels = np.stack(
            [viz.colorize_semseg(pred[i], cmap, self.s.semseg_ignore_label)
             for i in range(n)]
            + [viz.colorize_semseg(labels[i], cmap, self.s.semseg_ignore_label)
               for i in range(n)]
        )
        viz.save_png(
            os.path.join(d, f"semseg_pred_gt_e{e:03d}.png"),
            viz.image_grid(panels, nrow=n),
        )
        from openess_tpu.data.device_voxelize import has_wire, voxelize_wire

        if "event" in batch or has_wire(batch):
            if "event" in batch:
                ev = np.asarray(batch["event"][:n])  # planar [n, T, C, H, W]
            else:  # raw wire: voxelize the preview samples on device
                ev = np.asarray(
                    voxelize_wire(
                        self.s, {k: v[:n] for k, v in batch.items()
                                 if k.startswith("ev_")}
                    )
                )
            if self.s.event_representation_b == "histogram":
                # channels are (neg, pos) counts; event_image's separate_pol
                # path expects (pos..., neg...), so flip the channel order
                evs = np.stack([
                    viz.event_image(ev[i].sum(0)[::-1], separate_pol=True)
                    for i in range(n)
                ])
            else:
                # separate-pol voxel grids are (pos bins..., neg bins...) with
                # all-nonnegative values — render each half in its own color
                evs = np.stack([
                    viz.event_image(
                        ev[i].sum(0), separate_pol=self.s.separate_pol_b
                    )
                    for i in range(n)
                ])
            viz.save_png(
                os.path.join(d, f"event_preview_e{e:03d}.png"),
                viz.image_grid(evs, nrow=n),
            )
        viz.save_png(
            os.path.join(d, f"pca_latent_e{e:03d}.png"),
            viz.image_grid(viz.pca_rgb(feats[:n]), nrow=n),
        )

    def _maybe_checkpoint(self):
        if self.s.save_checkpoint and self.s.ckpt_dir:
            ckpt.save_checkpoint(
                self.s.ckpt_dir, jax.device_get(self.state), self.epoch
            )

    def training(self) -> dict:
        """Epoch loop with periodic validation (base_trainer_ov.py:358-378)."""
        best = {}
        for e in range(self.epoch, self.s.num_epochs):
            self.epoch = e
            self.train_epoch()
            if (e + 1) % self.s.val_epoch_step == 0:
                summary = self.val_epoch()
                if summary and summary.get("miou", 0) >= best.get("miou", -1):
                    best = summary
                self._maybe_checkpoint()
        return best

    def pretraining(self) -> None:
        """No-validation loop (base_trainer_ov.py:380-399)."""
        for e in range(self.epoch, self.s.num_epochs):
            self.epoch = e
            self.train_epoch()
            if (e + 1) % self.s.val_epoch_step == 0:
                self._maybe_checkpoint()

    def val_epochs(self) -> dict:
        """test.py entry: single validation sweep over the val set."""
        return self.val_epoch()
