from openess_tpu.models.deeplabv3 import ASPP, DeepLabHead, DeepLabV3TextSeg
from openess_tpu.models.e2vid import (
    ConvLSTMCell,
    E2VIDReconstructor,
    E2VIDStreamingStep,
    UNetRecurrent,
    initial_stream_state,
    normalize_event_window,
)
from openess_tpu.models.image_teacher import (
    DilationFeatureExtractor,
    imagenet_normalize,
)
from openess_tpu.models.resnet import ResNet50
from openess_tpu.models.semseg_e2vid import SemSegE2VID

__all__ = [
    "ASPP",
    "ConvLSTMCell",
    "DeepLabHead",
    "DeepLabV3TextSeg",
    "DilationFeatureExtractor",
    "E2VIDReconstructor",
    "ResNet50",
    "SemSegE2VID",
    "UNetRecurrent",
    "imagenet_normalize",
    "normalize_event_window",
]
