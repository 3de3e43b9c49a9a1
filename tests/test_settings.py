"""Settings: parse the repo's own config matrix 1:1; when the reference
mount is present, additionally check field-fidelity of every translated YAML
against the reference-parsed original."""
import dataclasses
import glob
import os

import pytest

from openess_tpu.config.settings import load_settings
from openess_tpu.training.build import build_models, task_from_settings

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPO_CONFIGS = sorted(
    p
    for p in glob.glob(os.path.join(HERE, "configs", "**", "*.yaml"), recursive=True)
    if "synthetic" not in p
)
REF_ROOT = "/root/reference/config"


def _rel(p):
    return os.path.relpath(p, os.path.join(HERE, "configs"))


def test_repo_config_matrix_complete():
    assert len(REPO_CONFIGS) == 36, REPO_CONFIGS
    rels = {_rel(p) for p in REPO_CONFIGS}
    # the reference matrix: {pretrain, linear_probe} x {DSEC, DDD17} x
    # {frame2recon, frame2voxel} x {sam, slic} + finetunes x label ratios
    for task in ("pretrain", "linear_probe"):
        for ds in ("DSEC", "DDD17"):
            for opt in ("frame2recon", "frame2voxel"):
                for sp in ("sam", "slic"):
                    assert f"{task}/{ds}/{opt}_fcclip_{sp}.yaml" in rels
    for ds in ("DSEC", "DDD17"):
        for sp in ("sam", "slic"):
            for ratio in (1, 5, 10, 20, 100):
                assert f"finetunes/{ds}/{sp}/frame2recon_fcclip_{sp}_{ratio}.yaml" in rels


@pytest.mark.parametrize("path", REPO_CONFIGS, ids=_rel)
def test_parse_repo_yaml(path):
    s = load_settings(path, generate_log=False)
    assert s.semseg_num_classes in (6, 11, 19)
    assert s.config_option in (
        "frame2recon", "recon2voxel", "frame2voxel", "recon_only"
    )
    assert task_from_settings(s) in (
        "pretrain", "finetune", "linear_probe", "sup_only", "openess"
    )
    assert s.batch_size_b > 0 and s.num_epochs > 0
    assert len(s.semseg_class_names) == s.semseg_num_classes
    if s.event_representation_b == "voxel_grid":
        assert s.input_channels_b == s.nr_temporal_bins_b * (
            2 if s.separate_pol_b else 1
        )
    assert s.compute_dtype == "bfloat16"  # tpu: section honored


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="reference mount absent")
@pytest.mark.parametrize("path", REPO_CONFIGS, ids=_rel)
def test_translated_yaml_matches_reference(path):
    ref_path = os.path.join(REF_ROOT, _rel(path))
    a = load_settings(path, generate_log=False)
    b = load_settings(ref_path, generate_log=False)
    skip = {
        "compute_dtype", "mesh_data", "mesh_model",  # tpu extras
        "ckpt_dir", "vis_dir", "logger",  # log-dir derived
        "semseg_color_map",  # ndarray, derived from semseg_num_classes
    }
    for f in dataclasses.fields(a):
        if f.name in skip:
            continue
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if isinstance(va, (list, tuple)):
            va, vb = tuple(va), tuple(vb)
        assert va == vb, (f.name, va, vb)


def test_pretrain_yaml_field_fidelity():
    s = load_settings(
        os.path.join(HERE, "configs/pretrain/DSEC/frame2recon_fcclip_sam.yaml"),
        generate_log=False,
    )
    assert s.dataset_name_b == "DSEC_events"
    assert tuple(s.img_size_b) == (440, 640)
    assert s.nr_events_data_b == 20
    assert s.nr_events_window_b == 100000
    assert s.semseg_num_classes == 11
    assert s.if_pretraining and not s.if_finetuning
    assert s.config_option == "frame2recon"
    assert s.superpixel_sources == "sp_sam_rgb"
    assert s.pl_sources == "pl_fcclip_rgb"
    assert s.superpixel_size == 100
    assert s.skip_ratio == 1
    assert s.lr_recon == 5e-4 and s.lr_frame == 5e-4
    assert tuple(s.task_loss) == ("dice", "cross_entropy")
    assert task_from_settings(s) == "pretrain"


def test_finetune_yaml_field_fidelity():
    s = load_settings(
        os.path.join(
            HERE, "configs/finetunes/DSEC/sam/frame2recon_fcclip_sam_10.yaml"
        ),
        generate_log=False,
    )
    assert s.if_finetuning and not s.if_pretraining
    assert s.skip_ratio == 10
    assert s.num_epochs == 100
    assert s.lr_recon == 1e-5
    assert s.unfrozen_e2vid is True
    assert s.load_pretrained_weights is True
    assert s.num_cpu_workers == 4
    assert task_from_settings(s) == "finetune"


# one config per (task x option x dataset) cell of the matrix
_BUILD_CELLS = [
    "pretrain/DSEC/frame2recon_fcclip_sam.yaml",
    "pretrain/DSEC/frame2voxel_fcclip_slic.yaml",
    "pretrain/DDD17/frame2recon_fcclip_slic.yaml",
    "pretrain/DDD17/frame2voxel_fcclip_sam.yaml",
    "linear_probe/DSEC/frame2recon_fcclip_sam.yaml",
    "linear_probe/DSEC/frame2voxel_fcclip_sam.yaml",
    "linear_probe/DDD17/frame2recon_fcclip_slic.yaml",
    "linear_probe/DDD17/frame2voxel_fcclip_slic.yaml",
    "finetunes/DSEC/sam/frame2recon_fcclip_sam_100.yaml",
    "finetunes/DDD17/slic/frame2recon_fcclip_slic_1.yaml",
]


@pytest.mark.parametrize("rel", _BUILD_CELLS)
def test_build_models_from_config(rel):
    s = load_settings(os.path.join(HERE, "configs", rel), generate_log=False)
    # shrink for CPU test speed; build structure is shape-independent
    s.img_size_b = (64, 96)
    s.compute_dtype = "float32"
    s.nr_events_data_b = 2
    s.__post_init__()
    mset = build_models(s, seed=0)
    assert mset.params
    # NOTE two reference config quirks, mirrored faithfully:
    # (a) most shipped linear_probe YAMLs leave clip.if_pretraining=True and
    #     train.py:36-50 checks it FIRST, so they dispatch to pretrain;
    # (b) linear_probe/DSEC/frame2recon_fcclip_sam.yaml has
    #     if_linear_probing un-indented OUT of the clip section (and
    #     if_pretraining False), so the reference parser sees all flags
    #     False and dispatches to the UDA (openess) trainer.
    task = task_from_settings(s)
    assert task == mset.task
    if task in ("pretrain", "openess"):
        if s.config_option == "frame2recon":
            assert set(mset.modules) == {"model_recon", "model_frame"}
        else:
            assert "front_sensor_b" in mset.modules and "back_end" in mset.modules
    elif s.config_option in ("recon2voxel", "frame2voxel"):
        assert set(mset.modules) == {"front_sensor_b", "back_end"}
    else:
        assert set(mset.modules) == {"model_recon"}
    if rel == "linear_probe/DSEC/frame2recon_fcclip_sam.yaml":
        assert task == "openess"  # quirk (b)
    elif "linear_probe" in rel:
        assert task == "pretrain"  # quirk (a)


def test_build_linear_probe_when_pretraining_disabled():
    # DDD17 frame2recon linear-probe config has if_linear_probing correctly
    # inside clip; flipping if_pretraining off is what a user must do to
    # actually linear-probe (see quirks above)
    s = load_settings(
        os.path.join(HERE, "configs/linear_probe/DDD17/frame2recon_fcclip_sam.yaml"),
        generate_log=False,
    )
    s.if_pretraining = False
    s.img_size_b = (64, 96)
    s.compute_dtype = "float32"
    s.__post_init__()
    assert task_from_settings(s) == "linear_probe"
    mset = build_models(s, seed=0)
    assert set(mset.modules) == {"model_recon"}
    assert "linear_probe" in mset.params["model_recon"]


def test_tpu_section_knobs(tmp_path):
    import yaml

    from openess_tpu.config.settings import load_settings

    cfg = {
        "dataset": {"name_b": "DSEC_events",
                    "DSEC_events": {"shape": [440, 640]}},
        "task": {"semseg_num_classes": 11},
        "dir": {"log": str(tmp_path)},
        "optim": {"batch_size_b": 4},
        "clip": {"config_option": "frame2voxel", "if_pretraining": True},
        "tpu": {"compute_dtype": "bfloat16", "mesh_data": 2, "mesh_model": 4,
                "tp_mode": "spatial", "teacher_os": 8},
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    s = load_settings(str(p))
    assert s.mesh_data == 2 and s.mesh_model == 4
    assert s.tp_mode == "spatial" and s.teacher_os == 8

    # defaults
    cfg.pop("tpu")
    p.write_text(yaml.safe_dump(cfg))
    s = load_settings(str(p))
    assert s.tp_mode == "channel" and s.teacher_os == 4


@pytest.mark.slow
def test_repo_config_matrix_models_build_abstract():
    """Every shipped config's model set must BUILD at its real image size —
    abstractly, via jax.eval_shape, so the whole 36-config matrix is
    init-shape-checked in one test without any compute. (The DDD17 matrix
    half once crashed at init because img_size_b carried the raw sensor
    width 346 while the loader delivers 352 — this pins the fix for every
    config.)"""
    import glob

    import jax

    from openess_tpu.training.build import build_models

    cfgs = sorted(glob.glob("/root/repo/configs/**/*.yaml", recursive=True))
    assert len(cfgs) >= 36
    for path in cfgs:
        s = load_settings(path)
        shapes = jax.eval_shape(lambda: build_models(s, seed=0).params)
        assert shapes, path
        for name, tree in shapes.items():
            assert jax.tree.leaves(tree), (path, name)


def test_ddd17_img_size_matches_loader_constants(tmp_path):
    """settings' DDD17 delivered shape is pinned to the loader constants
    (data/ddd17.py) so the two can never drift apart silently."""
    import warnings

    import yaml as _yaml

    from openess_tpu.data import ddd17

    cfg = os.path.join(
        HERE, "configs", "pretrain", "DDD17", "frame2voxel_fcclip_slic.yaml"
    )
    s = load_settings(cfg)
    assert tuple(s.img_size_b) == (
        ddd17.HEIGHT - ddd17.CROP_BOTTOM,
        ddd17.RESIZE_W,
    )

    # a custom (non-reference) yaml shape is overridden WITH a warning
    raw = _yaml.safe_load(open(cfg))
    raw["dataset"]["DDD17_events"]["shape"] = [100, 100]
    p = tmp_path / "custom_shape.yaml"
    p.write_text(_yaml.safe_dump(raw))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s2 = load_settings(str(p))
    assert tuple(s2.img_size_b) == (200, 352)
    assert any("ignored" in str(x.message) for x in w)
