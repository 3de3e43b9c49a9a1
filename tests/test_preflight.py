"""tools/preflight.py: real-asset validators must PASS on faithful replicas
of the released formats (built from the reference's own torch modules /
the repo's on-disk fixtures) and FAIL loudly on corrupted ones.
"""
import gzip
import subprocess
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tools")

import preflight  # noqa: E402  (tools/preflight.py)


def test_e2vid_preflight_pass_and_fail(tmp_path):
    # the released file stores {'state_dict': ..., 'arch', 'model'}
    # (e2vid/utils/loading_utils.py:5-33); build one from the reference's
    # own UNetRecurrent at the released lightweight hyperparameters
    from tests.test_torch_parity import _load, REF

    _load("refe2vid.model.submodules", f"{REF}/e2vid/model/submodules.py",
          f"{REF}/e2vid/model")
    unet_mod = _load("refe2vid.model.unet", f"{REF}/e2vid/model/unet.py",
                     f"{REF}/e2vid/model")
    net = unet_mod.UNetRecurrent(
        num_input_channels=5, num_output_channels=1, skip_type="sum",
        recurrent_block_type="convlstm", activation="sigmoid",
        num_encoders=3, base_num_channels=32, num_residual_blocks=2,
        norm=None, use_upsample_conv=False,
    )
    sd = {"unetrecurrent." + k: v for k, v in net.state_dict().items()}
    good = tmp_path / "E2VID_lightweight.pth.tar"
    torch.save({"state_dict": sd, "arch": "unet.UNetRecurrent"}, good)
    msg = preflight.check_e2vid(str(good))
    assert "shapes exact" in msg

    # corrupt one shape -> FAIL with the offending param named
    bad_sd = dict(sd)
    k = "unetrecurrent.head.conv2d.weight"
    bad_sd[k] = torch.zeros(16, 5, 5, 5)
    bad = tmp_path / "bad.pth.tar"
    torch.save({"state_dict": bad_sd}, bad)
    with pytest.raises(ValueError, match="head"):
        preflight.check_e2vid(str(bad))

    # drop a key -> converter KeyError propagates
    del bad_sd[k]
    torch.save({"state_dict": bad_sd}, bad)
    with pytest.raises(KeyError):
        preflight.check_e2vid(str(bad))


def test_dino_preflight(tmp_path):
    from tests.test_torch_parity import _load, REF

    rmod = _load("refmodels._resnet", f"{REF}/models/_resnet.py",
                 f"{REF}/models")
    # pretrained='' skips the reference's imagenet download (zero egress)
    sd = rmod.resnet50(pretrained="").state_dict()  # torchvision layout
    good = tmp_path / "dino_resnet50_pretrain.pth"
    torch.save(sd, good)
    assert "exact" in preflight.check_dino(str(good))

    sd2 = dict(sd)
    sd2["layer1.0.conv1.weight"] = torch.zeros(64, 64, 3, 3)
    bad = tmp_path / "bad.pth"
    torch.save(sd2, bad)
    with pytest.raises(ValueError, match="layer1"):
        preflight.check_dino(str(bad))


def test_bpe_preflight(tmp_path):
    # a full-size synthetic merge table yields the documented 49406/49407
    # sot/eot ids (vocab = 256 bytes x2 + merges + 2 specials)
    n = 49152 - 256 - 2
    pairs = [f"tok{i} tok{i}b" for i in range(n)]
    good = tmp_path / "bpe.txt.gz"
    with gzip.open(good, "wt", encoding="utf-8") as f:
        f.write("#version\n" + "\n".join(pairs) + "\n")
    assert "49406/49407" in preflight.check_bpe(str(good))

    short = tmp_path / "short.txt.gz"
    with gzip.open(short, "wt", encoding="utf-8") as f:
        f.write("#version\n" + "\n".join(pairs[:100]) + "\n")
    with pytest.raises(ValueError, match="merge lines"):
        preflight.check_bpe(str(short))


def test_text_and_openess_ckpt_preflight(tmp_path):
    tp = tmp_path / "text.pth"
    torch.save(torch.zeros(11, 512), tp)
    assert "11 classes" in preflight.check_text(str(tp))
    torch.save(torch.zeros(11, 77), tp)
    with pytest.raises(ValueError, match="512"):
        preflight.check_text(str(tp))

    cp = tmp_path / "Epoch_0.pt"
    torch.save({"optimizer": {}}, cp)
    with pytest.raises(ValueError, match="saver.py"):
        preflight.check_openess_ckpt(str(cp))


def test_dataset_root_preflight(tmp_path):
    from openess_tpu.data.dsec import TRAIN_SEQUENCES, VAL_SEQUENCES
    from openess_tpu.data.fixtures import write_dsec_sequence, write_ddd17_dir

    rng = np.random.default_rng(0)
    root = tmp_path / "DSEC"
    write_dsec_sequence(root / "train" / TRAIN_SEQUENCES[0], rng)
    write_dsec_sequence(root / "test" / VAL_SEQUENCES[0], rng)
    assert "2 sequences" in preflight.check_dsec_root(str(root), 11)
    # a missing events.h5 must be named
    (root / "train" / TRAIN_SEQUENCES[0] / "events" / "left"
     / "events.h5").unlink()
    with pytest.raises(ValueError, match="events.h5"):
        preflight.check_dsec_root(str(root), 11)

    droot = tmp_path / "DDD17"
    for i in range(6):
        write_ddd17_dir(droot / f"dir{i}", rng, n_imgs=3, n_events=2000)
    assert "6 recording dirs" in preflight.check_ddd17_root(str(droot))
    with pytest.raises(ValueError, match="dir"):
        preflight.check_ddd17_root(str(tmp_path))  # no dir*/ here


def test_preflight_cli_smoke(tmp_path):
    """End-to-end CLI: one passing + one failing asset -> exit 1, both
    lines printed."""
    tp = tmp_path / "text.pth"
    torch.save(torch.zeros(6, 512), tp)
    bad = tmp_path / "bad.pth"
    torch.save(torch.zeros(3, 3), bad)
    r = subprocess.run(
        [sys.executable, "tools/preflight.py", "--text", str(tp),
         "--openess_ckpt", str(bad)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 1, r.stdout + r.stderr
    assert "PASS  text_embeddings" in r.stdout
    assert "FAIL  openess_ckpt" in r.stdout
