"""Model-set construction per workload (replaces the reference's five
near-duplicate ``buildModels`` methods: pretrain_trainer.py:107-208,
finetune_trainer.py:102-198, openess_trainer.py:104-230, ...).

One function maps (task, config_option) to named modules with roles:

================  ==========================================================
name              role
================  ==========================================================
model_recon       DeepLabV3 student on recon images, OR (in *2voxel
                  pretrain) the frozen-encoder frame teacher applied to recon
model_frame       frame teacher (pretrain) or DeepLabV3 on frames (UDA)
front_sensor_b    E2VID reconstructor (frozen; latent detached — the
                  reference never propagates gradients into it, see
                  pretrain_trainer.py:551-552 and the inverted-condition
                  optimizer wiring at :226-231)
back_end          SemSegE2VID head over E2VID latents
================  ==========================================================

Optimizer-group labels mirror the reference's per-model AdamW dict
(optimizer_recon / optimizer_frame / optimizer_voxel).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from openess_tpu.config.settings import Settings
from openess_tpu.models import (
    DeepLabV3TextSeg,
    DilationFeatureExtractor,
    E2VIDReconstructor,
    SemSegE2VID,
)

VOXEL_OPTIONS = ("recon2voxel", "frame2voxel")


def task_from_settings(s: Settings) -> str:
    """train.py:36-50 dispatch order."""
    if s.if_supervised_only:
        return "sup_only"
    if s.if_pretraining:
        return "pretrain"
    if s.if_finetuning:
        return "finetune"
    if s.if_linear_probing:
        return "linear_probe"
    return "openess"


@dataclasses.dataclass
class ModelSet:
    modules: dict
    roles: dict            # name -> {'deeplab','teacher','e2vid','semseg_head'}
    groups: dict           # name -> optimizer group ('recon'|'frame'|'voxel')
    params: Any
    batch_stats: Any
    text_embeddings: Any
    task: str


def _dtype(s: Settings):
    return jnp.bfloat16 if s.compute_dtype == "bfloat16" else jnp.float32


def load_text_embeddings(s: Settings, rng: np.random.Generator) -> jnp.ndarray:
    """CLIP text embeddings ``[num_classes, 512]`` (deeplabv3.py:103-111).

    Loads the reference's ``.pth`` buffer when present (torch as pure IO);
    falls back to the random-normal init the reference uses with no path.
    """
    import os

    if s.text_embeddings_path and os.path.isfile(s.text_embeddings_path):
        import torch

        emb = torch.load(s.text_embeddings_path, map_location="cpu")
        emb = np.asarray(emb.float().numpy())
    else:
        emb = rng.normal(0.0, 0.01, (s.semseg_num_classes, 512)).astype(np.float32)
    assert emb.shape[0] == s.semseg_num_classes, emb.shape
    return jnp.asarray(emb)


def build_models(s: Settings, seed: int = 0) -> ModelSet:
    task = task_from_settings(s)
    opt = s.config_option
    dt = _dtype(s)
    nprng = np.random.default_rng(seed)
    text = load_text_embeddings(s, nprng)

    modules: dict[str, nn.Module] = {}
    roles: dict[str, str] = {}
    groups: dict[str, str] = {}

    def add(name, module, role, group):
        modules[name] = module
        roles[name] = role
        groups[name] = group

    deeplab = lambda lp=False: DeepLabV3TextSeg(
        num_classes=s.semseg_num_classes,
        output_stride=s.output_stride,
        linear_probe=lp,
        fold_bn=s.student_fold_bn,  # inference-only (no-op in train mode)
        dtype=dt,
    )
    teacher = lambda: DilationFeatureExtractor(
        dtype=dt, output_stride=s.teacher_os, fold_bn=s.teacher_fold_bn
    )
    e2vid = lambda: E2VIDReconstructor(
        # input_channels_b covers voxel_grid (bins, x2 if separate_pol),
        # histogram (2), ev_segnet (6) representations
        num_bins=s.input_channels_b, normalize=True, dtype=dt,
        planar_input=True,  # batches carry the [B, T, C, H, W] wire format
        # training consumes only the final latent pyramid, never the
        # reconstructed image (finetune_trainer.py:375-377), so skip the
        # UNet decode path — ~45 % of per-window FLOPs — in all T windows
        latent_only=True,
        s2d=s.e2vid_s2d,
        # model parallelism shards the scan activations under GSPMD
        # (channel-TP: gate-conv out channels; spatial: image height),
        # which cannot partition an opaque Pallas call — fall back to the
        # jnp gate path there (XLA partitions its elementwise ops fine)
        fused_gates=s.e2vid_fused_gates and s.mesh_model <= 1,
    )
    head = lambda lp=False: SemSegE2VID(
        input_c=256, num_classes=s.semseg_num_classes, linear_probe=lp, dtype=dt
    )

    lp = s.if_linear_probing
    if task == "pretrain":
        if opt == "frame2recon":
            add("model_recon", deeplab(), "deeplab", "recon")
            add("model_frame", teacher(), "teacher", "frame")
        elif opt == "recon2voxel":
            add("front_sensor_b", e2vid(), "e2vid", "voxel")
            add("back_end", head(), "semseg_head", "voxel")
            add("model_recon", teacher(), "teacher", "recon")
        elif opt == "frame2voxel":
            add("front_sensor_b", e2vid(), "e2vid", "voxel")
            add("back_end", head(), "semseg_head", "voxel")
            add("model_frame", teacher(), "teacher", "frame")
        else:
            raise NotImplementedError(opt)
    elif task in ("finetune", "linear_probe", "sup_only"):
        if opt in VOXEL_OPTIONS:
            add("front_sensor_b", e2vid(), "e2vid", "voxel")
            add("back_end", head(lp), "semseg_head", "voxel")
        else:
            add("model_recon", deeplab(lp), "deeplab", "recon")
    elif task == "openess":
        if opt == "recon2voxel":
            add("front_sensor_b", e2vid(), "e2vid", "voxel")
            add("back_end", head(), "semseg_head", "voxel")
            add("model_recon", deeplab(), "deeplab", "recon")
        elif opt == "frame2voxel":
            add("front_sensor_b", e2vid(), "e2vid", "voxel")
            add("back_end", head(), "semseg_head", "voxel")
            add("model_frame", deeplab(), "deeplab", "frame")
        elif opt == "frame2recon":
            add("model_recon", deeplab(), "deeplab", "recon")
            add("model_frame", deeplab(), "deeplab", "frame")
        else:
            raise NotImplementedError(opt)
    else:
        raise NotImplementedError(task)

    # Initialize all variables with dummy inputs at the configured shapes.
    h, w = int(s.img_size_b[0]), int(s.img_size_b[1])
    key = jax.random.key(seed)
    params, batch_stats = {}, {}
    for name, m in modules.items():
        key, k = jax.random.split(key)
        role = roles[name]
        if role == "e2vid":
            # planar [B, T, C, H, W] wire format (planar_input=True)
            dummy = jnp.zeros((1, 2, s.input_channels_b, h, w), jnp.float32)
            v = m.init(k, dummy)
        elif role == "semseg_head":
            latent = {
                "2": jnp.zeros((1, h // 2, w // 2, 64), jnp.float32),
                "4": jnp.zeros((1, h // 4, w // 4, 128), jnp.float32),
                "8": jnp.zeros((1, h // 8, w // 8, 256), jnp.float32),
            }
            v = m.init(k, latent, text)
        elif role == "deeplab":
            v = m.init(k, jnp.zeros((1, h, w, 3), jnp.float32), text)
        elif role == "teacher":
            v = m.init(k, jnp.zeros((1, h, w, 3), jnp.float32))
        else:
            raise AssertionError(role)
        v = dict(v)
        params[name] = v.pop("params")
        if "batch_stats" in v:
            batch_stats[name] = v.pop("batch_stats")

    return ModelSet(
        modules=modules, roles=roles, groups=groups,
        params=params, batch_stats=batch_stats,
        text_embeddings=text, task=task,
    )


def trainable_labels(mset: ModelSet, s: Settings):
    """Per-leaf optimizer-group labels ('recon'/'frame'/'voxel'/'frozen').

    Frozen subtrees mirror the reference ``requires_grad=False`` wiring:
    teacher encoder (image_model.py:116-117), E2VID always (see module
    docstring), linear-probe freezing (deeplabv3.py:162-170,
    style_networks.py:113-133), frozen_backbone fine-tuning
    (deeplabv3.py:172-177).
    """

    def label(path, _leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        model = keys[0]
        role = mset.roles[model]
        group = mset.groups[model]
        sub = "/".join(keys[1:])
        if role == "e2vid":
            # finetune_trainer.py:207-214 adds E2VID params to the voxel
            # optimizer under unfrozen_e2vid. (In the reference the latents
            # are still detached so those params never see gradients; here
            # the flag is genuinely functional — steps.py skips the detach.)
            if s.unfrozen_e2vid and s.if_finetuning:
                return group
            return "frozen"
        if role == "teacher":
            return "frozen" if sub.startswith("encoder") else group
        if role in ("deeplab", "semseg_head"):
            if s.if_linear_probing:
                return group if "linear_probe" in sub else "frozen"
            if role == "deeplab" and s.if_finetuning and s.frozen_backbone:
                return "frozen" if sub.startswith("backbone") else group
            return group
        return group

    return jax.tree_util.tree_map_with_path(label, mset.params)
