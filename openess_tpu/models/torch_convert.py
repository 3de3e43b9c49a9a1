"""Torch checkpoint -> flax param-tree converters.

The released OpenESS/E2VID/CLIP/DINO weights are torch ``state_dict``s; these
converters remap them onto the NHWC flax modules in ``openess_tpu.models``.
torch is used purely as checkpoint IO.

Layout rules:
- conv weight   torch [O, I, kh, kw]  -> flax [kh, kw, I, O]
- conv-transpose torch [I, O, kh, kw] -> ConvTranspose2dTorch [kh, kw, O, I]
- linear weight torch [O, I]          -> flax [I, O]
- BatchNorm     weight/bias -> scale/bias; running stats -> batch_stats
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def conv_w(t):
    return _np(t).transpose(2, 3, 1, 0)


def convt_w(t):
    return _np(t).transpose(2, 3, 1, 0)  # [I,O,kh,kw] -> [kh,kw,O,I]


def dense_w(t):
    return _np(t).T


def _bn(sd, prefix):
    params = {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}
    stats = {
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }
    return params, stats


# ---------------------------------------------------------------------------
# ResNet-50 (torchvision layout, models/_resnet.py)
# ---------------------------------------------------------------------------

def convert_resnet50(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """state_dict (optionally prefixed, e.g. 'backbone.') -> (params, stats)
    for :class:`openess_tpu.models.resnet.ResNet50`."""
    g = lambda k: sd[prefix + k]
    params: Dict[str, Any] = {"conv1": {"kernel": conv_w(g("conv1.weight"))}}
    bn_p, bn_s = _bn(sd, prefix + "bn1")
    params["bn1"] = bn_p
    stats: Dict[str, Any] = {"bn1": bn_s}

    for li, blocks in zip(range(1, 5), (3, 4, 6, 3)):
        for bi in range(blocks):
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            base = f"layer{li}.{bi}."
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": conv_w(g(base + f"conv{ci}.weight"))}
                p, st = _bn(sd, prefix + base + f"bn{ci}")
                bp[f"bn{ci}"] = p
                bs[f"bn{ci}"] = st
            if prefix + base + "downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": conv_w(g(base + "downsample.0.weight"))
                }
                p, st = _bn(sd, prefix + base + "downsample.1")
                bp["downsample_bn"] = p
                bs["downsample_bn"] = st
            params[f"layer{li}/{bi}"] = bp
            stats[f"layer{li}/{bi}"] = bs
    return params, stats


# ---------------------------------------------------------------------------
# DeepLabV3 student (models/deeplabv3.py layout)
# ---------------------------------------------------------------------------

def convert_deeplab(sd: Dict) -> Tuple[Dict, Dict, np.ndarray]:
    """Full ``deeplabv3_resnet50`` state_dict -> (params, batch_stats,
    text_embeddings) for :class:`DeepLabV3TextSeg`.

    torch module names: ``backbone.*`` (IntermediateLayerGetter over the
    resnet), ``classifier.ASPP.convs.{0..4}`` (+ ``project``),
    ``classifier.classifier.{0,1}`` (512-d conv+BN),
    ``classifier.text_embeddings`` (deeplabv3.py:86-117)."""
    bb_params, bb_stats = convert_resnet50(sd, prefix="backbone.")

    aspp_p: Dict[str, Any] = {}
    aspp_s: Dict[str, Any] = {}
    # convs.0: Sequential(conv, bn); convs.1-3: ASPPConv(conv, bn);
    # convs.4: ASPPPooling(pool, conv, bn)
    for i in range(4):
        aspp_p[f"conv{i}"] = {
            "kernel": conv_w(sd[f"classifier.ASPP.convs.{i}.0.weight"])
        }
        p, st = _bn(sd, f"classifier.ASPP.convs.{i}.1")
        aspp_p[f"bn{i}"] = p
        aspp_s[f"bn{i}"] = st
    aspp_p["conv4"] = {"kernel": conv_w(sd["classifier.ASPP.convs.4.1.weight"])}
    p, st = _bn(sd, "classifier.ASPP.convs.4.2")
    aspp_p["bn4"] = p
    aspp_s["bn4"] = st
    aspp_p["project"] = {"kernel": conv_w(sd["classifier.ASPP.project.0.weight"])}
    p, st = _bn(sd, "classifier.ASPP.project.1")
    aspp_p["project_bn"] = p
    aspp_s["project_bn"] = st

    head_p = {
        "aspp": aspp_p,
        "classifier_conv": {
            "kernel": conv_w(sd["classifier.classifier.0.weight"])
        },
    }
    p, st = _bn(sd, "classifier.classifier.1")
    head_p["classifier_bn"] = p
    head_s = {"aspp": aspp_s, "classifier_bn": st}

    params = {"backbone": bb_params, "classifier": head_p}
    stats = {"backbone": bb_stats, "classifier": head_s}
    if "linear_probe.weight" in sd:
        params["linear_probe"] = {
            "kernel": conv_w(sd["linear_probe.weight"]),
            "bias": _np(sd["linear_probe.bias"]),
        }
    text = _np(sd["classifier.text_embeddings"])
    return params, stats, text


# ---------------------------------------------------------------------------
# E2VID UNetRecurrent (e2vid/model/unet.py layout)
# ---------------------------------------------------------------------------

def convert_e2vid(sd: Dict, prefix: str = "unetrecurrent.") -> Dict:
    """``E2VID_lightweight`` state_dict -> params for
    :class:`openess_tpu.models.e2vid.UNetRecurrent` (3 encoders, 2 resblocks,
    transposed-conv decoders)."""
    if prefix and any(k.startswith(prefix) for k in sd):
        # only rebuild when stripping is actually needed: callers that pass
        # an already-stripped mapping (e.g. tools/preflight.py's
        # consumption-tracking dict) keep their subclass behavior
        sd = {
            k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in sd.items()
        }

    def conv_layer(name):
        out = {"conv2d": {"kernel": conv_w(sd[name + ".conv2d.weight"])}}
        if name + ".conv2d.bias" in sd:
            out["conv2d"]["bias"] = _np(sd[name + ".conv2d.bias"])
        return out

    params: Dict[str, Any] = {"head": conv_layer("head")}
    for i in range(3):
        params[f"encoders_{i}/conv"] = conv_layer(f"encoders.{i}.conv")
        params[f"encoders_{i}/lstm"] = {
            "gates": {
                "kernel": conv_w(sd[f"encoders.{i}.recurrent_block.Gates.weight"]),
                "bias": _np(sd[f"encoders.{i}.recurrent_block.Gates.bias"]),
            }
        }
    for i in range(2):
        params[f"resblocks_{i}"] = {
            "conv1": {
                "kernel": conv_w(sd[f"resblocks.{i}.conv1.weight"]),
                "bias": _np(sd[f"resblocks.{i}.conv1.bias"]),
            },
            "conv2": {
                "kernel": conv_w(sd[f"resblocks.{i}.conv2.weight"]),
                "bias": _np(sd[f"resblocks.{i}.conv2.bias"]),
            },
        }
    for i in range(3):
        params[f"decoders_{i}"] = {
            "kernel": convt_w(sd[f"decoders.{i}.transposed_conv2d.weight"]),
            "bias": _np(sd[f"decoders.{i}.transposed_conv2d.bias"]),
        }
    params["pred"] = conv_layer("pred")
    return params


def load_e2vid_checkpoint(path: str) -> Dict:
    """Load the released ``E2VID_lightweight.pth.tar`` and convert
    (e2vid/utils/loading_utils.py:5-33 stores {'state_dict': ..., 'arch',
    'model'})."""
    import torch

    raw = torch.load(path, map_location="cpu")
    sd = raw.get("state_dict", raw)
    return convert_e2vid(sd)


# ---------------------------------------------------------------------------
# Frame teacher (models/image_model.py DilationFeatureExtractor)
# ---------------------------------------------------------------------------

def convert_dilation_teacher(encoder_sd: Dict, decoder_conv_w=None,
                             decoder_conv_b=None) -> Tuple[Dict, Dict]:
    """(resnet50 encoder state_dict [e.g. released DINO], optional trained
    decoder conv) -> (params, batch_stats) for DilationFeatureExtractor."""
    enc_p, enc_s = convert_resnet50(encoder_sd)
    params: Dict[str, Any] = {"encoder": enc_p}
    if decoder_conv_w is not None:
        params["decoder_conv"] = {"kernel": conv_w(decoder_conv_w)}
        if decoder_conv_b is not None:
            params["decoder_conv"]["bias"] = _np(decoder_conv_b)
    return params, {"encoder": enc_s}


# ---------------------------------------------------------------------------
# MaskCLIP ViT-B/16 (models/maskclip_model.py mmseg layout)
# ---------------------------------------------------------------------------

def convert_maskclip(backbone_sd: Dict, visual_projs: Dict) -> Dict:
    """(ViT16_clip_backbone.pth, ViT16_clip_weights.pth) -> params for
    :class:`MaskClipFeatureExtractor`.

    mmseg names: ``patch_embed.projection``, ``layers.{i}.ln1/ln2``,
    ``layers.{i}.attn.attn.{in_proj_weight,in_proj_bias,out_proj.*}``,
    ``layers.{i}.ffn.layers.0.0`` (fc1) / ``layers.{i}.ffn.layers.1`` (fc2),
    ``norm0`` (pre-LN), ``norm1`` (post-LN), ``cls_token``, ``pos_embed``;
    visual projs: ``{'proj': {'weight': [512, 768(,1,1)]}}``
    (maskclip_model.py:132-148)."""
    sd = {k.replace("backbone.", ""): v for k, v in backbone_sd.items()}

    def ln(name):
        return {"scale": _np(sd[name + ".weight"]), "bias": _np(sd[name + ".bias"])}

    enc: Dict[str, Any] = {
        "patch_embed": {
            "kernel": conv_w(sd["patch_embed.projection.weight"])
        },
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "ln_pre": ln("norm0"),
        "ln_post": ln("norm1"),
    }
    i = 0
    while f"layers.{i}.ln1.weight" in sd:
        base = f"layers.{i}."
        enc[f"layers_{i}"] = {
            "ln1": ln(base + "ln1"),
            "ln2": ln(base + "ln2"),
            "attn": {
                "in_proj": {
                    "kernel": dense_w(sd[base + "attn.attn.in_proj_weight"]),
                    "bias": _np(sd[base + "attn.attn.in_proj_bias"]),
                },
                "out_proj": {
                    "kernel": dense_w(sd[base + "attn.attn.out_proj.weight"]),
                    "bias": _np(sd[base + "attn.attn.out_proj.bias"]),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": dense_w(sd[base + "ffn.layers.0.0.weight"]),
                    "bias": _np(sd[base + "ffn.layers.0.0.bias"]),
                },
                "fc2": {
                    "kernel": dense_w(sd[base + "ffn.layers.1.weight"]),
                    "bias": _np(sd[base + "ffn.layers.1.bias"]),
                },
            },
        }
        i += 1

    proj_w = visual_projs["proj"]["weight"]
    proj_w = _np(proj_w)
    if proj_w.ndim == 4:  # [512, 768, 1, 1]
        proj_w = proj_w[:, :, 0, 0]
    return {"encoder": enc, "proj": {"kernel": proj_w.T}}


# ---------------------------------------------------------------------------
# SemSegE2VID head (models/style_networks.py skip_connect=True path)
# ---------------------------------------------------------------------------

def convert_semseg_e2vid(sd: Dict, prefix: str = "") -> Tuple[Dict, np.ndarray]:
    """SemSegE2VID torch state_dict -> (params, text_embeddings) for
    :class:`openess_tpu.models.semseg_e2vid.SemSegE2VID`.

    Torch layout (style_networks.py:34-72): decoder_scale_1 = Sequential of
    5 INSResBlocks (convs at model.0 / model.3) + one ReLUINSConv2d
    (conv at model.0); decoder_scale_{2,3} = two ReLUINSConv2d each;
    decoder_scale_4 = one; decoder_ch256/ch512 = 1x1 convs at index 0.
    InstanceNorm is affine=False, so norms carry no weights.
    """
    g = lambda k: sd[prefix + k]

    def conv(k):
        return {"kernel": conv_w(g(k + ".weight")), "bias": _np(g(k + ".bias"))}

    params: Dict[str, Any] = {}
    for i in range(5):
        params[f"ds1_res{i}"] = {
            "conv1": conv(f"decoder_scale_1.{i}.model.0"),
            "conv2": conv(f"decoder_scale_1.{i}.model.3"),
        }
    params["ds1_conv"] = {"conv": conv("decoder_scale_1.5.model.0")}
    params["ds2_conv1"] = {"conv": conv("decoder_scale_2.0.model.0")}
    params["ds2_conv2"] = {"conv": conv("decoder_scale_2.1.model.0")}
    params["ds3_conv1"] = {"conv": conv("decoder_scale_3.0.model.0")}
    params["ds3_conv2"] = {"conv": conv("decoder_scale_3.1.model.0")}
    params["ds4_conv"] = {"conv": conv("decoder_scale_4.0.model.0")}
    params["decoder_ch256"] = conv("decoder_ch256.0")
    params["decoder_ch512"] = conv("decoder_ch512.0")
    if prefix + "linear_probe.weight" in sd:
        params["linear_probe"] = conv("linear_probe")
    text = _np(g("text_embeddings")) if prefix + "text_embeddings" in sd else None
    return params, text


def convert_openess_checkpoint(ckpt: Any) -> Tuple[Dict, Dict, Any]:
    """Released OpenESS checkpoint (``Epoch_N.pt`` / ``ckp.pt``,
    utils/saver.py:31-55: a dict of per-model state_dicts keyed
    front_sensor_b / model_recon / back_end) -> (params, batch_stats,
    text_embeddings) in this framework's tree layout — ready to save as an
    orbax ``pretrained_file`` (tools/convert_torch_checkpoints.py).
    """
    if isinstance(ckpt, str):
        import torch

        ckpt = torch.load(ckpt, map_location="cpu")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    text = None
    if "front_sensor_b" in ckpt:
        params["front_sensor_b"] = convert_e2vid(ckpt["front_sensor_b"])
    if "model_recon" in ckpt:
        p, s, text = convert_deeplab(ckpt["model_recon"])
        params["model_recon"] = p
        stats["model_recon"] = s
    if "model_frame" in ckpt:
        p, s, t = convert_deeplab(ckpt["model_frame"])
        params["model_frame"] = p
        stats["model_frame"] = s
        text = text if text is not None else t
    if "back_end" in ckpt:
        p, t = convert_semseg_e2vid(ckpt["back_end"])
        params["back_end"] = p
        text = text if text is not None else t
    return params, stats, text
