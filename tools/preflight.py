#!/usr/bin/env python
"""Real-assets preflight: validate every downloaded external asset BEFORE
any long run (REPRODUCE.md step 0).

One command, per-asset PASS/FAIL. Checkpoints are validated by running the
ACTUAL converters (``openess_tpu.models.torch_convert`` /
``models.fcclip.manifest``) against the file and shape-comparing the result
with the flax models' own ``jax.eval_shape`` parameter trees — so PASS
means "the conversion pipeline consumes this file and emits the exact
parameter tree the models expect", not just "the file opens". Dataset
roots are validated against the on-disk trees the loaders read
(``data/dsec.py`` / ``data/ddd17.py``, same layout as the reference's
``docs/GET_STARTED.md``).

Usage (pass any subset; each provided asset prints PASS or FAIL):
  python tools/preflight.py \
      [--fcclip fcclip_cocopan.pth] [--bpe bpe_simple_vocab_16e6.txt.gz] \
      [--e2vid E2VID_lightweight.pth.tar] [--dino dino_resnet50_pretrain.pth] \
      [--maskclip_backbone ViT16_clip_backbone.pth] \
      [--maskclip_weights ViT16_clip_weights.pth] \
      [--text dsec_11_classes.pth] [--sam sam_vit_h_4b8939.pth] \
      [--openess_ckpt Epoch_29.pt] \
      [--dsec_root /data/DSEC] [--ddd17_root /data/DDD17] \
      [--num_classes 11]

Exit code 0 iff every provided asset passes.
"""
import argparse
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _TrackedDict(dict):
    """Records key reads so converter consumption can be audited."""

    def __init__(self, sd):
        super().__init__(sd)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        has = super().__contains__(k)
        if has:
            self.read.add(k)
        return has


def _torch_load(path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _shape_diff(got_tree, want_tree, prefix=""):
    """Recursive {name: shape} comparison of a converted numpy tree vs a
    jax.eval_shape tree. Returns a list of problem strings."""
    problems = []
    gk, wk = set(got_tree), set(want_tree)
    for k in sorted(wk - gk):
        problems.append(f"missing param {prefix}{k}")
    for k in sorted(gk - wk):
        problems.append(f"unexpected param {prefix}{k}")
    for k in sorted(gk & wk):
        g, w = got_tree[k], want_tree[k]
        if isinstance(w, dict):
            if not isinstance(g, dict):
                problems.append(f"{prefix}{k}: leaf where subtree expected")
            else:
                problems += _shape_diff(g, w, prefix + k + "/")
        else:
            gs, ws = tuple(np.shape(g)), tuple(w.shape)
            if gs != ws:
                problems.append(f"{prefix}{k}: got {gs} want {ws}")
    return problems


def _eval_params(model, *args, **kwargs):
    import jax

    tree = jax.eval_shape(lambda: model.init(jax.random.key(0), *args,
                                             **kwargs))
    return tree["params"]


def check_fcclip(path):
    from openess_tpu.models.fcclip.manifest import validate_state_dict

    ckpt = _torch_load(path)
    sd = ckpt.get("model", ckpt)
    validate_state_dict(sd)
    return f"{len(sd)} keys match the released fcclip_cocopan manifest"


def check_bpe(path):
    with gzip.open(path, "rt", encoding="utf-8") as f:
        merges = f.read().split("\n")
    n_need = 49152 - 256 - 2  # tokenizer.py:71 consumes merges[1:48895]
    if len(merges) - 1 < n_need:
        raise ValueError(
            f"only {len(merges) - 1} merge lines; need >= {n_need}"
        )
    bad = [m for m in merges[1:n_need + 1] if len(m.split()) != 2]
    if bad:
        raise ValueError(f"{len(bad)} malformed merge lines, e.g. {bad[0]!r}")
    # full tokenizer build + the documented id contract (fcclip.py:26-41)
    from openess_tpu.models.fcclip.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer(path)
    sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
    if (sot, eot) != (49406, 49407):
        raise ValueError(f"sot/eot ids {(sot, eot)} != (49406, 49407)")
    return f"{n_need} merges, vocab {len(tok.encoder)}, sot/eot 49406/49407"


def check_e2vid(path):
    import jax.numpy as jnp

    from openess_tpu.models.e2vid import UNetRecurrent
    from openess_tpu.models.torch_convert import convert_e2vid

    raw = _torch_load(path)
    sd = raw.get("state_dict", raw)
    # strip the module prefix up front so the converter reads the tracked
    # dict directly (it only rebuilds when prefixed keys remain)
    pre = "unetrecurrent."
    sd = {k[len(pre):] if k.startswith(pre) else k: v for k, v in sd.items()}
    tracked = _TrackedDict(sd)
    params = convert_e2vid(tracked)
    unused = sorted(set(sd) - tracked.read)
    if unused:
        raise ValueError(f"{len(unused)} unconsumed keys: {unused[:6]}...")
    want = _eval_params(UNetRecurrent(), jnp.zeros((1, 32, 32, 5)))
    problems = _shape_diff(params, want)
    if problems:
        raise ValueError(f"{len(problems)} tree mismatches: {problems[:6]}")
    return f"all {len(sd)} keys consumed; flax tree shapes exact"


def check_dino(path):
    import jax.numpy as jnp

    from openess_tpu.models.resnet import ResNet50
    from openess_tpu.models.torch_convert import convert_resnet50

    raw = _torch_load(path)
    sd = raw.get("state_dict", raw)
    tracked = _TrackedDict(sd)
    params, stats = convert_resnet50(tracked)
    # fc head and bn num_batches_tracked buffers are legitimately unused
    unused = sorted(
        k for k in set(sd) - tracked.read
        if not (k.startswith("fc.") or k.endswith("num_batches_tracked"))
    )
    if unused:
        raise ValueError(f"{len(unused)} unconsumed keys: {unused[:6]}...")
    model = ResNet50(replace_stride_with_dilation=(True, True, True))
    import jax

    tree = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    )
    problems = _shape_diff(params, tree["params"])
    problems += _shape_diff(stats, tree["batch_stats"], "batch_stats/")
    if problems:
        raise ValueError(f"{len(problems)} tree mismatches: {problems[:6]}")
    return "resnet50 encoder tree shapes exact"


def check_maskclip(backbone_path, weights_path, num_classes):
    import jax.numpy as jnp

    from openess_tpu.models.maskclip import MaskClipFeatureExtractor
    from openess_tpu.models.torch_convert import convert_maskclip

    bsd = _torch_load(backbone_path)
    bsd = bsd.get("state_dict", bsd)
    wsd = _torch_load(weights_path)
    wsd = wsd.get("state_dict", wsd)
    if "proj" not in wsd or "weight" not in wsd["proj"]:
        raise ValueError("weights file lacks the visual proj "
                         "{'proj': {'weight': ...}} entry")
    params = convert_maskclip(bsd, wsd)
    model = MaskClipFeatureExtractor(num_classes=num_classes)
    want = _eval_params(
        model, jnp.zeros((1, 64, 64, 3)), jnp.zeros((num_classes, 512))
    )
    problems = _shape_diff(params, want)
    if problems:
        raise ValueError(f"{len(problems)} tree mismatches: {problems[:6]}")
    return "ViT-B/16 + proj tree shapes exact"


def check_text(path):
    t = _torch_load(path)
    if isinstance(t, dict):  # some releases wrap the tensor
        t = next(iter(t.values()))
    arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    if arr.ndim != 2 or arr.shape[1] != 512:
        raise ValueError(f"expected [num_classes, 512], got {arr.shape}")
    return f"text embeddings {arr.shape[0]} classes x 512"


def check_sam(path):
    sd = _torch_load(path)
    sd = sd.get("state_dict", sd)
    for prefix in ("image_encoder.", "prompt_encoder.", "mask_decoder."):
        if not any(k.startswith(prefix) for k in sd):
            raise ValueError(f"no keys under {prefix}")
    pe = sd.get("image_encoder.patch_embed.proj.weight")
    if pe is None or tuple(pe.shape) != (1280, 3, 16, 16):
        raise ValueError(
            "image_encoder.patch_embed.proj.weight is "
            f"{None if pe is None else tuple(pe.shape)}, want (1280, 3, 16, "
            "16) — is this sam_vit_h_4b8939.pth?"
        )
    return f"vit_h structure OK ({len(sd)} keys)"


def check_openess_ckpt(path):
    from openess_tpu.models.torch_convert import convert_openess_checkpoint

    ckpt = _torch_load(path)
    known = {"front_sensor_b", "model_recon", "model_frame", "back_end"}
    found = sorted(known & set(ckpt))
    if not found:
        raise ValueError(
            f"no per-model state dicts (saver.py layout) in {sorted(ckpt)[:8]}"
        )
    params, stats, text = convert_openess_checkpoint(ckpt)
    return (f"converted models: {', '.join(found)}"
            + (f"; text embeddings {np.shape(text)}" if text is not None
               else ""))


def check_dsec_root(root, num_classes):
    from openess_tpu.data.dsec import TRAIN_SEQUENCES, VAL_SEQUENCES

    problems = []
    n_seq = 0
    for split, names in (("train", TRAIN_SEQUENCES), ("test", VAL_SEQUENCES)):
        base = os.path.join(root, split)
        if not os.path.isdir(base):
            problems.append(f"missing {base}/")
            continue
        children = sorted(os.listdir(base))
        hits = [c for c in children if any(n in c for n in names)]
        if not hits:
            problems.append(f"no {split} sequences matching the namelist "
                            f"under {base}")
        for c in hits:
            seq = os.path.join(base, c)
            for rel in (
                "semantic/semantic_timestamps.txt",
                f"semantic/left/{num_classes}classes",
                "events/left/events.h5",
                "events/left/rectify_map.h5",
            ):
                if not os.path.exists(os.path.join(seq, rel)):
                    problems.append(f"{c}: missing {rel}")
            n_seq += 1
    if problems:
        raise ValueError("; ".join(problems[:8]))
    return f"{n_seq} sequences, full tree present"


def check_ddd17_root(root):
    import glob as _glob

    dirs = sorted(_glob.glob(os.path.join(root, "dir*")))
    if len(dirs) < 6:
        raise ValueError(f"found {len(dirs)} dir*/ (need 6: "
                         "ddd17_events_loader.py split table)")
    problems = []
    for d in dirs:
        for rel in ("events.dat.t", "events.dat.xyp",
                    "index/index_50ms.npy", "segmentation_masks"):
            if not os.path.exists(os.path.join(d, rel)):
                problems.append(f"{os.path.basename(d)}: missing {rel}")
        tp = os.path.join(d, "events.dat.t")
        if os.path.exists(tp) and os.path.getsize(tp) % 8:
            problems.append(f"{os.path.basename(d)}: events.dat.t size not "
                            "a multiple of int64")
    if problems:
        raise ValueError("; ".join(problems[:8]))
    return f"{len(dirs)} recording dirs, full tree present"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fcclip")
    ap.add_argument("--bpe")
    ap.add_argument("--e2vid")
    ap.add_argument("--dino")
    ap.add_argument("--maskclip_backbone")
    ap.add_argument("--maskclip_weights")
    ap.add_argument("--text")
    ap.add_argument("--sam")
    ap.add_argument("--openess_ckpt")
    ap.add_argument("--dsec_root")
    ap.add_argument("--ddd17_root")
    ap.add_argument("--num_classes", type=int, default=11,
                    help="label-space size for DSEC tree / maskclip checks")
    args = ap.parse_args()

    checks = []
    if args.fcclip:
        checks.append(("fcclip", lambda: check_fcclip(args.fcclip)))
    if args.bpe:
        checks.append(("bpe_vocab", lambda: check_bpe(args.bpe)))
    if args.e2vid:
        checks.append(("e2vid", lambda: check_e2vid(args.e2vid)))
    if args.dino:
        checks.append(("dino_r50", lambda: check_dino(args.dino)))
    if args.maskclip_backbone or args.maskclip_weights:
        if not (args.maskclip_backbone and args.maskclip_weights):
            ap.error("--maskclip_backbone and --maskclip_weights go together")
        checks.append(("maskclip", lambda: check_maskclip(
            args.maskclip_backbone, args.maskclip_weights, args.num_classes)))
    if args.text:
        checks.append(("text_embeddings", lambda: check_text(args.text)))
    if args.sam:
        checks.append(("sam", lambda: check_sam(args.sam)))
    if args.openess_ckpt:
        checks.append(("openess_ckpt",
                       lambda: check_openess_ckpt(args.openess_ckpt)))
    if args.dsec_root:
        checks.append(("dsec_root", lambda: check_dsec_root(
            args.dsec_root, args.num_classes)))
    if args.ddd17_root:
        checks.append(("ddd17_root", lambda: check_ddd17_root(args.ddd17_root)))

    if not checks:
        ap.error("no assets given — pass at least one (see --help)")

    failed = 0
    for name, fn in checks:
        try:
            msg = fn()
            print(f"PASS  {name:18s} {msg}")
        except Exception as e:  # noqa: BLE001 — report, don't crash the rest
            failed += 1
            print(f"FAIL  {name:18s} {type(e).__name__}: {e}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
