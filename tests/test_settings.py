"""Settings must parse the reference's own YAML files 1:1."""
import glob

import pytest

from openess_tpu.config.settings import load_settings
from openess_tpu.training.build import task_from_settings

REF_CONFIGS = sorted(glob.glob("/root/reference/config/**/*.yaml", recursive=True))


def test_reference_configs_found():
    assert len(REF_CONFIGS) >= 30, REF_CONFIGS


@pytest.mark.parametrize("path", REF_CONFIGS, ids=lambda p: p.split("config/")[-1])
def test_parse_reference_yaml(path):
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


def test_pretrain_yaml_field_fidelity():
    s = load_settings(
        "/root/reference/config/pretrain/DSEC/frame2recon_fcclip_sam.yaml",
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
