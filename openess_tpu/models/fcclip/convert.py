"""Released-checkpoint converter: FC-CLIP torch state_dict -> flax params.

The released ``fcclip_cocopan.pth`` is a detectron2 checkpoint whose
``model`` dict concatenates the open_clip backbone
(``backbone.clip_model.*``), the pixel decoder
(``sem_seg_head.pixel_decoder.*``), the transformer decoder
(``sem_seg_head.predictor.*``) and ``void_embedding``. This maps every
tensor into the :class:`openess_tpu.models.fcclip.meta.FCCLIP` /
:class:`...backbone.CLIPTextEncoder` parameter trees (NCHW->HWIO conv
transposes, [out,in]->[in,out] linear transposes, LN/GN weight->scale).

torch is used purely as checkpoint IO, like models/torch_convert.py.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from openess_tpu.models.fcclip.backbone import (
    CONVNEXT_LARGE_DEPTHS,
)


def _np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def conv_kernel(w):
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def dw_conv_kernel(w):
    # torch depthwise [C, 1, kh, kw] -> flax feature_group_count [kh, kw, 1, C]
    return _np(w).transpose(2, 3, 1, 0)


def dense(w, b=None):
    out = {"kernel": _np(w).T}
    if b is not None:
        out["bias"] = _np(b)
    return out


def norm(w, b):
    return {"scale": _np(w), "bias": _np(b)}


def _torch_mha(sd, prefix):
    return {
        "in_proj_kernel": _np(sd[prefix + ".in_proj_weight"]).T,
        "in_proj_bias": _np(sd[prefix + ".in_proj_bias"]),
        "out_proj": dense(
            sd[prefix + ".out_proj.weight"], sd[prefix + ".out_proj.bias"]
        ),
    }


def convert_visual_trunk(sd: Dict[str, Any], prefix="backbone.clip_model.visual.trunk.",
                         depths=CONVNEXT_LARGE_DEPTHS):
    p: Dict[str, Any] = {
        "stem_conv": {
            "kernel": conv_kernel(sd[prefix + "stem.0.weight"]),
            "bias": _np(sd[prefix + "stem.0.bias"]),
        },
        "stem_norm": norm(sd[prefix + "stem.1.weight"], sd[prefix + "stem.1.bias"]),
    }
    for i, depth in enumerate(depths):
        stage: Dict[str, Any] = {}
        if i > 0:
            stage["downsample_norm"] = norm(
                sd[f"{prefix}stages.{i}.downsample.0.weight"],
                sd[f"{prefix}stages.{i}.downsample.0.bias"],
            )
            stage["downsample_conv"] = {
                "kernel": conv_kernel(sd[f"{prefix}stages.{i}.downsample.1.weight"]),
                "bias": _np(sd[f"{prefix}stages.{i}.downsample.1.bias"]),
            }
        for j in range(depth):
            bp = f"{prefix}stages.{i}.blocks.{j}."
            stage[f"block_{j}"] = {
                "conv_dw": {
                    "kernel": dw_conv_kernel(sd[bp + "conv_dw.weight"]),
                    "bias": _np(sd[bp + "conv_dw.bias"]),
                },
                "norm": norm(sd[bp + "norm.weight"], sd[bp + "norm.bias"]),
                "mlp_fc1": dense(sd[bp + "mlp.fc1.weight"], sd[bp + "mlp.fc1.bias"]),
                "mlp_fc2": dense(sd[bp + "mlp.fc2.weight"], sd[bp + "mlp.fc2.bias"]),
                "gamma": _np(sd[bp + "gamma"]),
            }
        p[f"stage_{i}"] = stage
    return p


def convert_visual_projection(sd: Dict[str, Any]):
    return {
        "trunk_head_norm": norm(
            sd["backbone.clip_model.visual.trunk.head.norm.weight"],
            sd["backbone.clip_model.visual.trunk.head.norm.bias"],
        ),
        "head_fc1": dense(
            sd["backbone.clip_model.visual.head.mlp.fc1.weight"],
            sd["backbone.clip_model.visual.head.mlp.fc1.bias"],
        ),
        "head_fc2": dense(
            sd["backbone.clip_model.visual.head.mlp.fc2.weight"],
            sd["backbone.clip_model.visual.head.mlp.fc2.bias"],
        ),
    }


def convert_text_encoder(sd: Dict[str, Any], layers=16):
    prefix = "backbone.clip_model."
    p: Dict[str, Any] = {
        "token_embedding": _np(sd[prefix + "token_embedding.weight"]),
        "positional_embedding": _np(sd[prefix + "positional_embedding"]),
        "text_projection": _np(sd[prefix + "text_projection"]),
        "ln_final": norm(
            sd[prefix + "ln_final.weight"], sd[prefix + "ln_final.bias"]
        ),
    }
    for i in range(layers):
        bp = f"{prefix}transformer.resblocks.{i}."
        attn = _torch_mha(sd, bp + "attn")
        p[f"block_{i}"] = {
            "ln_1": norm(sd[bp + "ln_1.weight"], sd[bp + "ln_1.bias"]),
            "ln_2": norm(sd[bp + "ln_2.weight"], sd[bp + "ln_2.bias"]),
            "attn": {
                "in_proj": {
                    "kernel": attn["in_proj_kernel"],
                    "bias": attn["in_proj_bias"],
                },
                "out_proj": attn["out_proj"],
            },
            "mlp_fc1": dense(
                sd[bp + "mlp.c_fc.weight"], sd[bp + "mlp.c_fc.bias"]
            ),
            "mlp_fc2": dense(
                sd[bp + "mlp.c_proj.weight"], sd[bp + "mlp.c_proj.bias"]
            ),
        }
    return p


def convert_pixel_decoder(
    sd: Dict[str, Any], prefix="sem_seg_head.pixel_decoder.", enc_layers=6
):
    p: Dict[str, Any] = {}
    for i in range(3):
        p[f"input_proj_{i}"] = {
            "kernel": conv_kernel(sd[f"{prefix}input_proj.{i}.0.weight"]),
            "bias": _np(sd[f"{prefix}input_proj.{i}.0.bias"]),
        }
        p[f"input_proj_{i}_gn"] = norm(
            sd[f"{prefix}input_proj.{i}.1.weight"],
            sd[f"{prefix}input_proj.{i}.1.bias"],
        )
    p["level_embed"] = _np(sd[prefix + "transformer.level_embed"])
    for i in range(enc_layers):
        bp = f"{prefix}transformer.encoder.layers.{i}."
        p[f"encoder_layer_{i}"] = {
            "self_attn": {
                "sampling_offsets": dense(
                    sd[bp + "self_attn.sampling_offsets.weight"],
                    sd[bp + "self_attn.sampling_offsets.bias"],
                ),
                "attention_weights": dense(
                    sd[bp + "self_attn.attention_weights.weight"],
                    sd[bp + "self_attn.attention_weights.bias"],
                ),
                "value_proj": dense(
                    sd[bp + "self_attn.value_proj.weight"],
                    sd[bp + "self_attn.value_proj.bias"],
                ),
                "output_proj": dense(
                    sd[bp + "self_attn.output_proj.weight"],
                    sd[bp + "self_attn.output_proj.bias"],
                ),
            },
            "norm1": norm(sd[bp + "norm1.weight"], sd[bp + "norm1.bias"]),
            "linear1": dense(sd[bp + "linear1.weight"], sd[bp + "linear1.bias"]),
            "linear2": dense(sd[bp + "linear2.weight"], sd[bp + "linear2.bias"]),
            "norm2": norm(sd[bp + "norm2.weight"], sd[bp + "norm2.bias"]),
        }
    p["adapter_1"] = {"kernel": conv_kernel(sd[prefix + "adapter_1.weight"])}
    p["adapter_1_gn"] = norm(
        sd[prefix + "adapter_1.norm.weight"], sd[prefix + "adapter_1.norm.bias"]
    )
    p["layer_1"] = {"kernel": conv_kernel(sd[prefix + "layer_1.weight"])}
    p["layer_1_gn"] = norm(
        sd[prefix + "layer_1.norm.weight"], sd[prefix + "layer_1.norm.bias"]
    )
    p["mask_features"] = {
        "kernel": conv_kernel(sd[prefix + "mask_features.weight"]),
        "bias": _np(sd[prefix + "mask_features.bias"]),
    }
    return p


def convert_transformer_decoder(
    sd: Dict[str, Any], prefix="sem_seg_head.predictor.", dec_layers=9
):
    def mlp(base, n=3):
        return {
            f"layer_{i}": dense(
                sd[f"{base}.layers.{i}.weight"], sd[f"{base}.layers.{i}.bias"]
            )
            for i in range(n)
        }

    p: Dict[str, Any] = {
        "level_embed": _np(sd[prefix + "level_embed.weight"]),
        "query_feat": _np(sd[prefix + "query_feat.weight"]),
        "query_embed": _np(sd[prefix + "query_embed.weight"]),
        "decoder_norm": norm(
            sd[prefix + "decoder_norm.weight"], sd[prefix + "decoder_norm.bias"]
        ),
        "mask_embed": mlp(prefix + "mask_embed"),
        "class_embed": mlp(prefix + "class_embed"),
        "mask_pooling_proj_norm": norm(
            sd[prefix + "_mask_pooling_proj.0.weight"],
            sd[prefix + "_mask_pooling_proj.0.bias"],
        ),
        "mask_pooling_proj_dense": dense(
            sd[prefix + "_mask_pooling_proj.1.weight"],
            sd[prefix + "_mask_pooling_proj.1.bias"],
        ),
        "logit_scale": _np(sd[prefix + "logit_scale"]),
    }
    for i in range(dec_layers):
        p[f"cross_attn_{i}"] = _torch_mha(
            sd, f"{prefix}transformer_cross_attention_layers.{i}.multihead_attn"
        )
        p[f"cross_norm_{i}"] = norm(
            sd[f"{prefix}transformer_cross_attention_layers.{i}.norm.weight"],
            sd[f"{prefix}transformer_cross_attention_layers.{i}.norm.bias"],
        )
        p[f"self_attn_{i}"] = _torch_mha(
            sd, f"{prefix}transformer_self_attention_layers.{i}.self_attn"
        )
        p[f"self_norm_{i}"] = norm(
            sd[f"{prefix}transformer_self_attention_layers.{i}.norm.weight"],
            sd[f"{prefix}transformer_self_attention_layers.{i}.norm.bias"],
        )
        p[f"ffn_linear1_{i}"] = dense(
            sd[f"{prefix}transformer_ffn_layers.{i}.linear1.weight"],
            sd[f"{prefix}transformer_ffn_layers.{i}.linear1.bias"],
        )
        p[f"ffn_linear2_{i}"] = dense(
            sd[f"{prefix}transformer_ffn_layers.{i}.linear2.weight"],
            sd[f"{prefix}transformer_ffn_layers.{i}.linear2.bias"],
        )
        p[f"ffn_norm_{i}"] = norm(
            sd[f"{prefix}transformer_ffn_layers.{i}.norm.weight"],
            sd[f"{prefix}transformer_ffn_layers.{i}.norm.bias"],
        )
    return p


def convert_state_dict(sd: Dict[str, Any]):
    """Released ``model`` state dict -> (fcclip_params, text_encoder_params)
    flax trees. Every inference-path tensor is consumed; the manifest test
    (tests/test_fcclip.py::test_convert_consumes_released_manifest) proves
    completeness against the released key/shape manifest."""
    params = {
        "visual": convert_visual_trunk(sd),
        "visual_proj": convert_visual_projection(sd),
        "pixel_decoder": convert_pixel_decoder(sd),
        "decoder": convert_transformer_decoder(sd),
        "void_embedding": _np(sd["void_embedding.weight"]),
        "clip_logit_scale": _np(sd["backbone.clip_model.logit_scale"]),
    }
    text = convert_text_encoder(sd)
    return params, text


def convert_fcclip_checkpoint(path: str, validate: bool = True):
    """Load the released detectron2 checkpoint and return
    (fcclip_params, text_encoder_params) flax trees.

    ``validate`` checks the file against the released
    ``fcclip_cocopan.pth`` key/shape manifest FIRST, so a wrong or
    corrupted download fails loudly instead of silently mis-converting the
    teacher every pseudo-label depends on."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    if validate:
        from openess_tpu.models.fcclip.manifest import validate_state_dict

        validate_state_dict(sd)
    return convert_state_dict(sd)
