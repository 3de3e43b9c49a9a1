"""FC-CLIP in JAX: the open-vocabulary panoptic teacher behind OpenESS's
annotation-free pseudo-labels (reference: fc-clip/fcclip/*)."""
from openess_tpu.models.fcclip.backbone import (
    CLIPTextEncoder,
    CLIPVisualProjection,
    ConvNeXtCLIPVisual,
)
from openess_tpu.models.fcclip.meta import (
    DSEC_USER_CLASSES,
    FCCLIP,
    VILD_PROMPT,
    fold_template_embeddings,
    prepare_class_names,
)
from openess_tpu.models.fcclip.pixel_decoder import MSDeformAttnPixelDecoder
from openess_tpu.models.fcclip.tokenizer import SimpleTokenizer
from openess_tpu.models.fcclip.transformer_decoder import (
    FCCLIPTransformerDecoder,
    get_classification_logits,
    mask_pooling,
)
from openess_tpu.models.fcclip.convert import convert_fcclip_checkpoint
from openess_tpu.models.fcclip.labeler import (
    USER_TO_DDD17,
    USER_TO_DSEC,
    build_fcclip_labeler,
    maxpool_argmax,
)
from openess_tpu.models.fcclip.inference import (
    instance_inference,
    panoptic_inference,
)

__all__ = [
    "CLIPTextEncoder",
    "CLIPVisualProjection",
    "ConvNeXtCLIPVisual",
    "DSEC_USER_CLASSES",
    "FCCLIP",
    "FCCLIPTransformerDecoder",
    "MSDeformAttnPixelDecoder",
    "SimpleTokenizer",
    "VILD_PROMPT",
    "convert_fcclip_checkpoint",
    "fold_template_embeddings",
    "USER_TO_DDD17",
    "USER_TO_DSEC",
    "build_fcclip_labeler",
    "instance_inference",
    "maxpool_argmax",
    "panoptic_inference",
    "get_classification_logits",
    "mask_pooling",
    "prepare_class_names",
]
