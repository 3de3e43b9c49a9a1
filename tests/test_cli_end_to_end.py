"""End-to-end CLI run on an on-disk replica DSEC tree: train.py (event path,
pretrain losses, checkpointing) then test.py-style eval through the Trainer.

This is the closest runnable analog of a real DSEC run in this environment
(SURVEY §4c: tiny-synthetic end-to-end with loss decrease + mIoU)."""
import json
import subprocess
import sys

import numpy as np
import pytest
import yaml

from openess_tpu.data.fixtures import write_dsec_sequence


@pytest.fixture(scope="module")
def dsec_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec_cli")
    rng = np.random.default_rng(11)
    write_dsec_sequence(root / "train" / "zurich_city_00_a", rng)
    write_dsec_sequence(root / "test" / "zurich_city_13_a", rng)
    return root


def _pretrain_cfg(dsec_tree, tmp_path):
    return {
        "dataset": {
            "name_b": "DSEC_events",
            "DSEC_events": {
                "dataset_path": str(dsec_tree),
                "shape": [440, 640],
                "nr_events_data": 2,
                "fixed_duration": False,
                "delta_t_per_data": 50,
                "require_paired_data_train": False,
                "require_paired_data_val": False,
                "nr_events_window": 500,
                "event_representation": "voxel_grid",
                "nr_temporal_bins": 5,
                "separate_pol": False,
                "normalize_event": False,
            },
        },
        "task": {"semseg_num_classes": 11},
        "dir": {"log": str(tmp_path / "log")},
        "model": {
            "model_name": "open_ess",
            "skip_connect_encoder": True,
            "skip_connect_task": True,
            "skip_connect_task_type": "concat",
            "data_augmentation_train": True,
            "train_on_event_labels": False,
            "unfrozen_e2vid": False,
        },
        "optim": {
            "batch_size_b": 2,
            "lr_voxel": 5e-4, "lr_recon": 5e-4, "lr_frame": 5e-4,
            "lr_decay": 0.9, "num_epochs": 1, "val_epoch_step": 1,
            "weight_task_loss": 1,
            "task_loss": ["dice", "cross_entropy"],
        },
        "checkpoint": {
            "save_checkpoint": True, "resume_training": False,
            "load_pretrained_weights": False,
            "resume_file": "", "pretrained_file": "",
        },
        "hardware": {"num_cpu_workers": 1},
        "clip": {
            "skip_ratio": 1,
            "text_embeddings_path": "", "maskclip_checkpoint": "",
            "visual_projs_path": "", "output_stride": 16,
            "pre_trained_backbone": "",
            "config_option": "recon2voxel",
            "if_supervised_only": False,
            "if_pretraining": True,
            "superpixel_sources": "sp_sam_rgb",
            "superpixel_size": 20,
            "if_spatial_contrastive": True,
            "image_weights": "dino",
            "if_dense_clip_supervision": True,
            "pl_sources": "pl_fcclip_rgb",
            "if_sam_distillation": False,
            "if_finetuning": False, "load_pretrained_weights": False,
            "if_switchable_train": False, "pretrained_file": "",
        },
        "tpu": {"compute_dtype": "float32", "mesh_data": 1, "mesh_model": 1},
    }


@pytest.mark.slow
def test_train_cli_recon2voxel_pretrain(dsec_tree, tmp_path):
    cfg = _pretrain_cfg(dsec_tree, tmp_path)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU relay out of the CLI run
    proc = subprocess.run(
        [sys.executable, "train.py", "--settings_file", str(cfg_path)],
        capture_output=True, text=True, timeout=3300, cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    # a checkpoint dir was produced
    import glob

    cks = glob.glob(str(tmp_path / "log" / "*" / "checkpoints" / "*"))
    assert cks, proc.stdout[-1000:]


@pytest.mark.slow
def test_train_cli_resume(dsec_tree, tmp_path):
    """CLI resume contract (base_trainer_ov.py:34-44): a second train.py run
    with resume_training + resume_file picks up the saved epoch and re-runs
    from it (the reference stores the last COMPLETED epoch and restarts
    there), then continues to num_epochs."""
    import glob
    import os

    cfg = _pretrain_cfg(dsec_tree, tmp_path)
    cfg["optim"]["num_epochs"] = 1
    cfg_path = tmp_path / "cfg_first.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "train.py", "--settings_file", str(cfg_path)],
        capture_output=True, text=True, timeout=3300, cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    ckpt_dirs = glob.glob(str(tmp_path / "log" / "*" / "checkpoints"))
    assert ckpt_dirs and glob.glob(ckpt_dirs[0] + "/*")

    cfg["optim"]["num_epochs"] = 2
    cfg["checkpoint"]["resume_training"] = True
    cfg["checkpoint"]["resume_file"] = ckpt_dirs[0]
    cfg_path2 = tmp_path / "cfg_resume.yaml"
    cfg_path2.write_text(yaml.safe_dump(cfg))
    proc = subprocess.run(
        [sys.executable, "train.py", "--settings_file", str(cfg_path2)],
        capture_output=True, text=True, timeout=3300, cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    logs = sorted(glob.glob(str(tmp_path / "log" / "*" / "running.log")))
    assert len(logs) == 2
    text = open(logs[-1]).read()
    assert "resumed from" in text and "at epoch 0" in text, text[-2000:]
    # reference semantics: epoch 0 re-runs, then epoch 1 — both complete
    assert "epoch 0 done" in text and "epoch 1 done" in text, text[-2000:]


@pytest.mark.slow
def test_train_cli_finetune_writes_visuals(dsec_tree, tmp_path):
    """Finetune CLI run with validation: per-epoch qualitative dumps
    (confusion plots, PCA latents, semseg panels) land in vis_dir."""
    cfg = {
        "dataset": {
            "name_b": "DSEC_events",
            "DSEC_events": {
                "dataset_path": str(dsec_tree),
                "shape": [440, 640],
                "nr_events_data": 2,
                "fixed_duration": False,
                "delta_t_per_data": 50,
                "require_paired_data_train": False,
                "require_paired_data_val": False,
                "nr_events_window": 500,
                "event_representation": "voxel_grid",
                "nr_temporal_bins": 5,
                "separate_pol": False,
                "normalize_event": False,
            },
        },
        "task": {"semseg_num_classes": 11},
        "dir": {"log": str(tmp_path / "log")},
        "model": {
            "model_name": "open_ess",
            "skip_connect_encoder": True,
            "skip_connect_task": True,
            "skip_connect_task_type": "concat",
            "data_augmentation_train": False,
            "train_on_event_labels": False,
            "unfrozen_e2vid": False,
        },
        "optim": {
            "batch_size_b": 2,
            "lr_voxel": 5e-4, "lr_recon": 5e-4, "lr_frame": 5e-4,
            "lr_decay": 0.9, "num_epochs": 1, "val_epoch_step": 1,
            "weight_task_loss": 1,
            "task_loss": ["dice", "cross_entropy"],
        },
        "checkpoint": {
            "save_checkpoint": False, "resume_training": False,
            "load_pretrained_weights": False,
            "resume_file": "", "pretrained_file": "",
        },
        "hardware": {"num_cpu_workers": 1},
        "clip": {
            "skip_ratio": 1,
            "text_embeddings_path": "", "maskclip_checkpoint": "",
            "visual_projs_path": "", "output_stride": 16,
            "pre_trained_backbone": "",
            "config_option": "recon2voxel",
            "if_supervised_only": False,
            "if_pretraining": False,
            "superpixel_sources": "sp_sam_rgb",
            "superpixel_size": 20,
            "if_spatial_contrastive": False,
            "image_weights": "dino",
            "if_dense_clip_supervision": False,
            "pl_sources": "pl_fcclip_rgb",
            "if_sam_distillation": False,
            "if_finetuning": True, "load_pretrained_weights": False,
            "if_switchable_train": False, "pretrained_file": "",
        },
        "tpu": {"compute_dtype": "float32", "mesh_data": 1, "mesh_model": 1},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    import glob
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "train.py", "--settings_file", str(cfg_path)],
        capture_output=True, text=True, timeout=3300, cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    vis = glob.glob(str(tmp_path / "log" / "*" / "visualization" / "*.png"))
    names = {os.path.basename(v) for v in vis}
    for expect in (
        "confusion_e000.png", "confusion_norm_e000.png",
        "semseg_pred_gt_e000.png", "event_preview_e000.png",
        "pca_latent_e000.png",
    ):
        assert expect in names, names


@pytest.mark.slow
def test_export_model_cli(dsec_tree, tmp_path):
    """tools/export_model.py: AOT-export the inference step, selfcheck the
    deserialized artifact against the live jit, write the blob."""
    import os

    cfg = _pretrain_cfg(dsec_tree, tmp_path)
    cfg["dataset"]["DSEC_events"]["shape"] = [64, 96]
    cfg["optim"]["batch_size_b"] = 1
    cfg_path = tmp_path / "cfg_export.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "model.jexp"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "tools/export_model.py", "--settings_file",
         str(cfg_path), "--output", str(out), "--selfcheck", "--poly_batch"],
        capture_output=True, text=True, timeout=900, cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "selfcheck OK" in proc.stdout
    assert out.stat().st_size > 1_000_000  # weights embedded

    # the artifact round-trips standalone (no flax/model code needed) and
    # the symbolic batch dim serves any batch size
    from jax import export as jexport

    restored = jexport.deserialize(bytearray(out.read_bytes()))
    for b in (1, 3):
        x = np.random.default_rng(0).normal(0, 0.5, (b, 2, 5, 64, 96)).astype(
            np.float32
        )
        pred, logits = restored.call(x)
        assert pred.shape == (b, 64, 96) and logits.shape[-1] == 11


def test_generate_superpixels_slic_cli(tmp_path):
    """tools/generate_superpixels_slic.py: DSEC tree walk -> sp_slic_rgb
    id-map PNGs with the reference naming contract (*_slic_<n>.png)."""
    import os

    from PIL import Image

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "train" / "seq_a" / "images_aligned" / "left"
    img_dir.mkdir(parents=True)
    for i in range(2):
        arr = np.zeros((48, 64, 3), np.uint8)
        arr[:24] = rng.integers(100, 200, 3)   # two clear regions
        arr[24:] = rng.integers(0, 80, 3)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.png")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "tools/generate_superpixels_slic.py",
         "--dataset", "dsec", "--root", str(tmp_path), "--n_segments", "8"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    out = sorted((tmp_path / "train" / "seq_a" / "sp_slic_rgb" / "left").glob("*.png"))
    assert [p.name for p in out] == ["000000_slic_8.png", "000001_slic_8.png"]
    seg = np.asarray(Image.open(out[0]))
    assert seg.shape == (48, 64) and seg.min() == 0 and 2 <= seg.max() + 1 <= 8


@pytest.mark.slow
def test_train_cli_ddd17_sup_only(tmp_path):
    """DDD17 CLI end-to-end (the DSEC e2e's twin for C8): memmap events +
    index maps + PNG side channels -> train.py sup_only recon2voxel ->
    checkpoint + val metrics. Exercises the 352-resize/60-row-crop path and
    the separate-pol bilinear-t voxelizer through the real CLI."""
    import glob
    import os

    from openess_tpu.data.fixtures import write_ddd17_dir

    rng = np.random.default_rng(13)
    root = tmp_path / "ddd17"
    for i in range(6):  # reference split: train=[0,2,3,4,5], valid=[1]
        write_ddd17_dir(root / f"dir{i}", rng)

    cfg = {
        "dataset": {
            "name_b": "DDD17_events",
            "DDD17_events": {
                "dataset_path": str(root),
                "split_train": "train",
                "shape": [200, 346],
                "nr_events_data": 2,
                "fixed_duration": False,
                "delta_t_per_data": 50,
                "require_paired_data_train": False,
                "require_paired_data_val": False,
                "nr_events_window": 400,
                "event_representation": "voxel_grid",
                "nr_temporal_bins": 5,
                "separate_pol": True,
                "normalize_event": False,
            },
        },
        "task": {"semseg_num_classes": 6},
        "dir": {"log": str(tmp_path / "log")},
        "model": {
            "model_name": "open_ess",
            "skip_connect_encoder": True,
            "skip_connect_task": True,
            "skip_connect_task_type": "concat",
            "data_augmentation_train": True,
            "train_on_event_labels": False,
            "unfrozen_e2vid": False,
        },
        "optim": {
            "batch_size_b": 2,
            "lr_voxel": 5e-4, "lr_recon": 5e-4, "lr_frame": 5e-4,
            "lr_decay": 0.9, "num_epochs": 1, "val_epoch_step": 1,
            "weight_task_loss": 1,
            "task_loss": ["dice", "cross_entropy"],
        },
        "checkpoint": {
            "save_checkpoint": True, "resume_training": False,
            "load_pretrained_weights": False,
            "resume_file": "", "pretrained_file": "",
        },
        "hardware": {"num_cpu_workers": 1},
        "clip": {
            "skip_ratio": 1,
            "text_embeddings_path": "", "maskclip_checkpoint": "",
            "visual_projs_path": "", "output_stride": 16,
            "pre_trained_backbone": "",
            "config_option": "recon2voxel",
            "if_supervised_only": True,
            "if_pretraining": False,
            "superpixel_sources": "", "superpixel_size": 20,
            "if_spatial_contrastive": False,
            "image_weights": "dino",
            "if_dense_clip_supervision": False,
            "pl_sources": "",
            "if_sam_distillation": False,
            "if_finetuning": False, "load_pretrained_weights": False,
            "if_switchable_train": False, "pretrained_file": "",
        },
        "tpu": {"compute_dtype": "float32", "mesh_data": 1, "mesh_model": 1},
    }
    cfg_path = tmp_path / "cfg_ddd17.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "train.py", "--settings_file", str(cfg_path)],
        capture_output=True, text=True, timeout=3300, cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    cks = glob.glob(str(tmp_path / "log" / "*" / "checkpoints" / "*"))
    assert cks, proc.stdout[-1000:]
    logs = glob.glob(str(tmp_path / "log" / "*" / "running.log"))
    text = open(logs[0]).read()
    assert "epoch 0 done" in text, text[-2000:]
    assert "miou" in text.lower(), text[-2000:]


def test_eval_annotation_free_scores_every_val_sample(dsec_tree, tmp_path,
                                                      monkeypatch, capsys):
    """tools/eval_annotation_free.py with a stubbed teacher: the printed acc
    must equal the all-val-pixel fraction computed directly from the dataset
    — proving the padded final batch scores every sample exactly once
    (6 val samples at B4 -> 4+2)."""
    import sys as _sys

    import tools.eval_annotation_free as ev
    from openess_tpu.config.settings import load_settings
    from openess_tpu.data.loaders import build_datasets

    cfg = _pretrain_cfg(dsec_tree, tmp_path)
    cfg["optim"]["batch_size_b"] = 4
    cfg_path = tmp_path / "eval_cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    batch_sizes = []

    def stub_build(s):
        def infer(img):
            batch_sizes.append(int(img.shape[0]))
            import jax.numpy as jnp

            return jnp.zeros(img.shape[:3], jnp.int32)  # predict class 0

        return infer

    monkeypatch.setattr(ev, "build_maskclip_infer", stub_build)
    monkeypatch.setattr(
        _sys, "argv",
        ["eval", "--settings_file", str(cfg_path), "--source", "recon"],
    )
    ev.main()
    out = capsys.readouterr().out

    s = load_settings(str(cfg_path), generate_log=False)
    _, val_ds = build_datasets(s)
    n = len(val_ds)
    assert n == 6 and batch_sizes == [4, 4]  # tail padded, not dropped
    labels = np.concatenate(
        [val_ds.get_batch([i])["label"] for i in range(n)]
    )
    valid = labels != s.semseg_ignore_label
    want_acc = 100.0 * float((labels[valid] == 0).mean())
    got = eval(out.strip().splitlines()[-1])  # the printed summary dict
    # the tool prints percentages rounded to 2 decimals
    assert abs(got["acc"] - want_acc) < 0.006


def test_generate_superpixels_sam_cli(tmp_path, monkeypatch):
    """tools/generate_superpixels_sam.py: both dataset path contracts, the
    stubbed SAM backend (a fake segment_anything exercising the real
    masks_to_id_map area-sort/overwrite), the slic fallback backend, and
    resume-by-files."""
    import sys as _sys
    import types

    from PIL import Image

    import tools.generate_superpixels_sam as sp

    rng = np.random.default_rng(0)

    # --- DSEC tree, fake SAM backend ---
    img_dir = tmp_path / "dsec" / "train" / "seq_a" / "images_aligned" / "left"
    img_dir.mkdir(parents=True)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        ).save(img_dir / f"{i:06d}.png")

    class FakeGen:
        def __init__(self, sam):
            pass

        def generate(self, img):
            h, w = img.shape[:2]
            big = np.zeros((h, w), bool); big[:, : w // 2] = True
            small = np.zeros((h, w), bool); small[:8, :8] = True
            # area-ascending order on purpose: the tool must sort desc so
            # the small mask overwrites the big one
            return [
                {"area": int(small.sum()), "segmentation": small},
                {"area": int(big.sum()), "segmentation": big},
            ]

    fake = types.ModuleType("segment_anything")
    fake.SamAutomaticMaskGenerator = FakeGen
    fake.sam_model_registry = {"vit_h": lambda checkpoint: object()}
    monkeypatch.setitem(_sys.modules, "segment_anything", fake)
    monkeypatch.setattr(
        _sys, "argv",
        ["sp", "--dataset", "dsec", "--root", str(tmp_path / "dsec"),
         "--backend", "sam", "--sam_checkpoint", "x"],
    )
    sp.main()
    out = sorted(
        (tmp_path / "dsec" / "train" / "seq_a" / "sp_sam_rgb" / "left").glob("*.png")
    )
    assert [p.name for p in out] == ["000000.png", "000001.png"]
    ids = np.asarray(Image.open(out[0]))
    assert ids.shape == (48, 64)
    assert ids[0, 0] == 2  # small mask (id 2) overwrote the big one (id 1)
    assert ids[40, 0] == 1 and ids[0, 63] == 0  # big-mask rest / background

    # resume-by-files: tamper one output, re-run, it must be left alone
    Image.fromarray(np.full((4, 4), 7, np.uint8)).save(out[0])
    sp.main()
    assert np.asarray(Image.open(out[0])).shape == (4, 4)

    # --- DDD17 tree, slic fallback backend ---
    d_img = tmp_path / "ddd17" / "dir0" / "images_aligned"
    d_img.mkdir(parents=True)
    arr = np.zeros((40, 60, 3), np.uint8)
    arr[:20] = 180
    Image.fromarray(arr).save(d_img / "img_00000001.png")
    monkeypatch.setattr(
        _sys, "argv",
        ["sp", "--dataset", "ddd17", "--root", str(tmp_path / "ddd17"),
         "--backend", "slic", "--n_segments", "8"],
    )
    sp.main()
    seg = np.asarray(Image.open(
        tmp_path / "ddd17" / "dir0" / "superpixels_sam" / "img_00000001.png"
    ))
    assert seg.shape == (40, 60) and seg.min() == 0 and 2 <= seg.max() + 1 <= 8


def test_export_model_streaming_cli(dsec_tree, tmp_path):
    """tools/export_model.py --streaming: the real-time serving artifact
    (carry, window) -> (carry, pred, logits), selfchecked, and a T-step
    stream through the standalone artifact matches the batch artifact's
    prediction on the same windows."""
    import os

    cfg = _pretrain_cfg(dsec_tree, tmp_path)
    cfg["dataset"]["DSEC_events"]["shape"] = [64, 96]
    cfg["optim"]["batch_size_b"] = 1
    cfg_path = tmp_path / "cfg_stream.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    outs = {}
    for mode, extra in (("batch", []), ("stream", ["--streaming"])):
        out = tmp_path / f"model_{mode}.jexp"
        proc = subprocess.run(
            [sys.executable, "tools/export_model.py", "--settings_file",
             str(cfg_path), "--output", str(out), "--selfcheck", *extra],
            capture_output=True, text=True, timeout=900, cwd="/root/repo",
            env=env,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "selfcheck OK" in proc.stdout
        outs[mode] = out

    from jax import export as jexport

    batch_fn = jexport.deserialize(bytearray(outs["batch"].read_bytes()))
    stream_fn = jexport.deserialize(bytearray(outs["stream"].read_bytes()))

    T = 2
    rng = np.random.default_rng(0)
    windows = rng.normal(0, 0.5, (1, T, 5, 64, 96)).astype(np.float32)
    windows[windows < 0.2] = 0.0
    pred_batch, logits_batch = batch_fn.call(windows)

    import jax

    from openess_tpu.models.e2vid import initial_stream_state

    states = jax.tree.map(
        np.asarray, initial_stream_state(1, 64, 96)
    )  # zeros, matching the artifact's carry avals
    for t in range(T):
        states, pred_stream, logits_stream = stream_fn.call(
            states, windows[:, t]
        )
    # two differently-compiled programs: logits agree to numeric noise, so
    # argmax may flip on near-ties — require near-total agreement, not
    # bitwise equality
    agree = (np.asarray(pred_batch) == np.asarray(pred_stream)).mean()
    assert agree > 0.999, agree
    np.testing.assert_allclose(
        np.asarray(logits_batch, np.float32),
        np.asarray(logits_stream, np.float32), atol=1e-4,
    )


def test_serve_stream_cli(tmp_path):
    """tools/serve_stream.py: the runnable real-time serving demo — synthetic
    event windows through pack -> on-device voxelize (voxelize_wire) ->
    streaming step -> rate report + colorized prediction PNGs; then the same
    loop through an exported --streaming artifact."""
    import os

    cfg = yaml.safe_load(open("configs/synthetic_sup_only.yaml"))
    cfg["clip"]["config_option"] = "frame2voxel"
    cfg["optim"]["batch_size_b"] = 1
    cfg_path = tmp_path / "cfg_serve.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    out_dir = tmp_path / "preds"
    proc = subprocess.run(
        [sys.executable, "tools/serve_stream.py", "--settings_file",
         str(cfg_path), "--synthetic", "3", "--window_events", "2000",
         "--out_dir", str(out_dir)],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "per-stream rate" in proc.stdout and "windows/s" in proc.stdout
    pngs = sorted(out_dir.glob("pred_*.png"))
    assert len(pngs) == 3
    from PIL import Image

    assert np.asarray(Image.open(pngs[0])).shape == (64, 96, 3)

    # artifact-served variant: export then serve the .jexp
    art = tmp_path / "serve.jexp"
    proc = subprocess.run(
        [sys.executable, "tools/export_model.py", "--settings_file",
         str(cfg_path), "--output", str(art), "--streaming"],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    proc = subprocess.run(
        [sys.executable, "tools/serve_stream.py", "--settings_file",
         str(cfg_path), "--artifact", str(art), "--synthetic", "3",
         "--window_events", "2000"],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "per-stream rate" in proc.stdout
