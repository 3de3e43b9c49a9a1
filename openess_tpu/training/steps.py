"""Functional training core: one jit-compiled step per workload.

Replaces the reference's five trainer classes' ``train_step/task_train_step``
(pretrain_trainer.py:324-534, finetune_trainer.py:280-400,
sup_only_trainer.py:334-393, linear_probe_trainer.py, openess_trainer.py:
330-535) with a single ``make_train_step(settings)`` whose branch structure
is resolved at trace time from (task, config_option).

Batch dict convention (device arrays, NHWC except events):
  ev_*        raw-event sorted-chunk wire (data/device_voxelize.py) —
              the production default; the step voxelizes on-device
              (before augmentation, so paired flips hit the grid)
  event       [B, T, bins, H, W]   pre-voxelized windows (grid wire),
                                   planar TPU wire format: the tiled minor
                                   dims of the entry buffer are (H, W), so
                                   XLA pads nothing (a bins-minor layout
                                   pads 5 -> 128 lanes, 25x HBM). Moved to
                                   NHWC on device at the top of the event
                                   path.
  frame/recon [B, H, W, 3]         in [0, 1]
  label/pl/superpixel [B, H, W]    int32
  sam_feat    [B, h, w, 256]       optional SAM teacher features
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from openess_tpu.config.settings import Settings
from openess_tpu.data.augment import augment_batch
from openess_tpu.losses import cosine_distill, nce_loss, task_loss
from openess_tpu.ops.resize import resize_bilinear
from openess_tpu.ops.segment_pool import segment_mean_pool, segment_mean_pool_pallas
from openess_tpu.training.build import VOXEL_OPTIONS, ModelSet

Array = Any


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def _pool(feats, seg, segments_per_image, use_pallas):
    if use_pallas:
        # hwb pixel order: segment means are pixel-order-invariant, and
        # flattening H-major lets XLA bitcast the conv-layout feature maps
        # into the kernel instead of relayout-copying them (ROOFLINE.md)
        return segment_mean_pool_pallas(
            feats, seg, segments_per_image=segments_per_image,
            pixel_order="hwb",
        )[0]
    return segment_mean_pool(feats, seg, segments_per_image=segments_per_image)[0]


class StepBuilder:
    """Builds jitted train/eval steps for a configured workload."""

    def __init__(self, settings: Settings, mset: ModelSet, tx=None,
                 mesh=None):
        self.s = settings
        self.mset = mset
        self.tx = tx
        # multi-device mesh: the raw-wire voxelizer runs under shard_map so
        # GSPMD never has to partition the Mosaic custom call itself
        self.mesh = mesh
        self.use_pallas_pool = jax.default_backend() not in ("cpu",)

    # ---------------- forward helpers ----------------

    def _apply(self, name, params, bstats, *args, train, rng=None):
        module = self.mset.modules[name]
        variables = {"params": params[name]}
        has_bs = name in (bstats or {})
        if has_bs:
            variables["batch_stats"] = bstats[name]
        kwargs = {}
        if self.mset.roles[name] in ("deeplab", "teacher"):
            kwargs["train"] = train
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if train and has_bs:
            out, mut = module.apply(
                variables, *args, mutable=["batch_stats"], rngs=rngs, **kwargs
            )
            return out, mut["batch_stats"]
        return module.apply(variables, *args, rngs=rngs, **kwargs), None

    def _deeplab(self, name, params, bstats, x, train, rng):
        (logits, feats), new_bs = self._apply(
            name, params, bstats, x, self.mset.text_embeddings,
            train=train, rng=rng,
        )
        return logits, feats, new_bs

    def _teacher(self, name, params, bstats, x):
        # frozen-encoder teacher always runs in inference BN mode
        feats, _ = self._apply(name, params, bstats, x, train=False)
        return feats

    def _windows(self, batch):
        """Voxel windows [B, T, bins, H, W]: either the host-built grid wire
        or, on the production raw-event wire, voxelized on-device here —
        INSIDE the jitted step, so the Pallas kernel fuses into the graph."""
        if "event" in batch:
            return batch["event"]
        from openess_tpu.data.device_voxelize import voxelize_wire

        return voxelize_wire(self.s, batch, mesh=self.mesh)

    def _event_path(self, params, bstats, batch, train, rng):
        """E2VID scan -> (detached) latent -> SemSegE2VID head.

        The detach matches pretrain_trainer.py:551-552 / finetune_trainer.py:
        375-377 — gradients never reach E2VID through the latent. Exception:
        ``unfrozen_e2vid`` fine-tuning keeps the latent differentiable so the
        E2VID params the reference adds to the voxel optimizer
        (finetune_trainer.py:207-214) actually receive gradients.
        """
        # windows arrive in the planar [B, T, bins, H, W] wire format; the
        # E2VID scan transposes to NHWC per step (planar_input=True) so no
        # full-size bins-minor buffer is ever materialized
        windows = self._windows(batch)
        (_, latent), _ = self._apply(
            "front_sensor_b", params, bstats, windows, train=False
        )
        e2vid_trains = (
            train and self.s.unfrozen_e2vid and self.s.if_finetuning
        )
        if not e2vid_trains:
            latent = {
                k: jax.lax.stop_gradient(latent[k]) for k in ("2", "4", "8")
            }
        (logits, feat256), _ = self._apply(
            "back_end", params, bstats, latent, self.mset.text_embeddings,
            train=train, rng=rng,
        )
        # head outputs are at window resolution == input resolution
        return logits, feat256

    # ---------------- loss dispatch ----------------

    def compute_losses(self, params, bstats, batch, rng, epoch):
        s, task, opt = self.s, self.mset.task, self.s.config_option
        losses = {}
        new_bstats = dict(bstats)
        t_loss = jnp.asarray(0.0, jnp.float32)
        rng_d1, rng_d2 = jax.random.split(rng)

        def tloss(logits, target):
            return (
                task_loss(
                    logits, target,
                    num_classes=s.semseg_num_classes,
                    ignore_index=s.semseg_ignore_label,
                    losses=tuple(s.task_loss),
                )
                * s.weight_task_loss
            )

        def contrastive(feat_student, feat_teacher, sp_size):
            k = _pool(feat_student, batch["superpixel"], sp_size, self.use_pallas_pool)
            q = _pool(feat_teacher, batch["superpixel"], sp_size, self.use_pallas_pool)
            return nce_loss(k, q, temperature=0.07)

        def switchable_pl(logits, pl):
            if s.if_switchable_train:
                own = jnp.argmax(jax.lax.stop_gradient(logits), axis=-1)
                return jnp.where(epoch >= 5, own, pl)
            return pl

        if task == "pretrain":
            if opt == "frame2recon":
                feat_frame = self._teacher("model_frame", params, bstats, batch["frame"])
                logits_recon, feat_recon, bs = self._deeplab(
                    "model_recon", params, bstats, batch["recon"], True, rng_d1
                )
                if bs is not None:
                    new_bstats["model_recon"] = bs
                if s.if_spatial_contrastive:
                    l = contrastive(feat_recon, feat_frame, s.superpixel_size)
                    losses["contrastive_nce_loss"] = l
                    t_loss += l
                if s.if_dense_clip_supervision:
                    pl = switchable_pl(logits_recon, batch["pl"])
                    l = tloss(logits_recon, pl)
                    losses["dense_clip_loss"] = l
                    t_loss += l
                if s.if_sam_distillation:
                    h, w = feat_recon.shape[1:3]
                    m = max(h, w)
                    sam = resize_bilinear(
                        batch["sam_feat"], out_h=m, out_w=m, align_corners=False
                    )[:, :h, :w]
                    l = cosine_distill(sam, feat_recon, axis=-1)
                    losses["sam_distillation_loss"] = l
                    t_loss += l
            elif opt in VOXEL_OPTIONS:
                tname = "model_recon" if opt == "recon2voxel" else "model_frame"
                timg = batch["recon" if opt == "recon2voxel" else "frame"]
                feat_teacher = self._teacher(tname, params, bstats, timg)
                logits_voxel, feat_voxel = self._event_path(
                    params, bstats, batch, True, rng_d1
                )
                if s.if_spatial_contrastive:
                    l = contrastive(feat_voxel, feat_teacher, s.superpixel_size)
                    losses["contrastive_nce_loss"] = l
                    t_loss += l
                if s.if_dense_clip_supervision:
                    pl = switchable_pl(logits_voxel, batch["pl"])
                    l_dense = tloss(logits_voxel, pl)
                    losses["dense_clip_loss"] = l_dense
                    t_loss += l_dense
            else:
                raise NotImplementedError(opt)

        elif task in ("finetune", "linear_probe", "sup_only"):
            if opt in VOXEL_OPTIONS:
                logits, _ = self._event_path(params, bstats, batch, True, rng_d1)
            else:
                logits, _, bs = self._deeplab(
                    "model_recon", params, bstats, batch["recon"], True, rng_d1
                )
                if bs is not None:
                    new_bstats["model_recon"] = bs
            l = tloss(logits, batch["label"])
            losses["semseg_loss"] = l
            t_loss += l

        elif task == "openess":
            if opt in VOXEL_OPTIONS:
                rname = "model_recon" if opt == "recon2voxel" else "model_frame"
                rimg = batch["recon" if opt == "recon2voxel" else "frame"]
                logits_recon, feat_recon, bs = self._deeplab(
                    rname, params, bstats, rimg, True, rng_d1
                )
                if bs is not None:
                    new_bstats[rname] = bs
                l = tloss(logits_recon, batch["pl"])
                losses["semseg_recon_loss"] = l
                t_loss += l
                logits_voxel, feat_voxel = self._event_path(
                    params, bstats, batch, True, rng_d2
                )
                l = tloss(logits_voxel, batch["pl"])
                losses["semseg_sensor_b_loss"] = l
                t_loss += l
                l = jnp.mean(jnp.abs(feat_recon - feat_voxel))
                losses["cons_feat_loss"] = l
                t_loss += l
                l = cosine_distill(logits_recon, logits_voxel, axis=-1)
                losses["cons_pred_loss"] = l
                t_loss += l
                if s.if_spatial_contrastive:
                    # reference hardcodes 50 (recon2voxel) / 30 (frame2voxel)
                    sp = 50 if opt == "recon2voxel" else 30
                    l = contrastive(feat_voxel, feat_recon, sp)
                    losses["contrastive_nce_loss"] = l
                    t_loss += l
            elif opt == "frame2recon":
                # joint frame+recon deeplabs (openess_trainer.py:478-530)
                logits_frame, feat_frame, bs = self._deeplab(
                    "model_frame", params, bstats, batch["frame"], True, rng_d1
                )
                if bs is not None:
                    new_bstats["model_frame"] = bs
                l = tloss(logits_frame, batch["pl"])
                losses["semseg_frame_loss"] = l
                t_loss += l
                logits_recon, feat_recon, bs = self._deeplab(
                    "model_recon", params, bstats, batch["recon"], True, rng_d2
                )
                if bs is not None:
                    new_bstats["model_recon"] = bs
                l = tloss(logits_recon, batch["pl"])
                losses["semseg_recon_loss"] = l
                t_loss += l
                l = jnp.mean(jnp.abs(feat_frame - feat_recon))
                losses["cons_feat_loss"] = l
                t_loss += l
                l = cosine_distill(logits_frame, logits_recon, axis=-1)
                losses["cons_pred_loss"] = l
                t_loss += l
                if s.if_spatial_contrastive:
                    l = contrastive(feat_recon, feat_frame, 30)
                    losses["contrastive_nce_loss"] = l
                    t_loss += l
            else:
                raise NotImplementedError(opt)
        else:
            raise NotImplementedError(task)

        losses["total_loss"] = t_loss
        return t_loss, losses, new_bstats

    # ---------------- steps ----------------

    def make_train_step(self):
        s = self.s
        tx = self.tx

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng, epoch):
            rng_aug, rng_loss = jax.random.split(jax.random.fold_in(rng, state.step))
            if s.config_option in VOXEL_OPTIONS and "event" not in batch:
                # raw-event wire: voxelize on-device BEFORE augmentation so
                # the paired flip applies to the grid exactly as in the
                # reference (sequence_ov.py:362-440)
                batch = {
                    k: v for k, v in batch.items() if not k.startswith("ev_")
                } | {"event": self._windows(batch)}
            if s.data_augmentation_train:
                batch_aug = augment_batch(rng_aug, batch)
            else:
                batch_aug = batch

            def loss_fn(params):
                loss, losses, new_bs = self.compute_losses(
                    params, state.batch_stats, batch_aug, rng_loss, epoch
                )
                return loss, (losses, new_bs)

            (loss, (losses, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            )
            return new_state, losses

        return train_step

    def make_viz_step(self):
        """Prediction + 256-d latent features for the qualitative val-time
        visualizations (confusion plots, PCA latent maps — the reference's
        ``visualizeConfusionMatrix`` / ``computePCA`` hooks)."""
        opt = self.s.config_option

        @jax.jit
        def viz_step(params, batch_stats, batch):
            if opt in VOXEL_OPTIONS:
                logits, feats = self._event_path(
                    params, batch_stats, batch, False, None
                )
            else:
                logits, feats, _ = self._deeplab(
                    "model_recon", params, batch_stats, batch["recon"], False, None
                )
            return jnp.argmax(logits, axis=-1), feats

        return viz_step

    def make_eval_step(self):
        s = self.s
        opt = s.config_option

        @jax.jit
        def eval_step(params, batch_stats, batch):
            if opt in VOXEL_OPTIONS:
                logits, _ = self._event_path(
                    params, batch_stats, batch, False, None
                )
            else:
                logits, _, _ = self._deeplab(
                    "model_recon", params, batch_stats, batch["recon"], False, None
                )
            loss = task_loss(
                logits, batch["label"],
                num_classes=s.semseg_num_classes,
                ignore_index=s.semseg_ignore_label,
                losses=tuple(s.task_loss),
            )
            return jnp.argmax(logits, axis=-1), loss

        return eval_step
