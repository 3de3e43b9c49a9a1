from openess_tpu.training.build import ModelSet, build_models, task_from_settings, trainable_labels
from openess_tpu.training.optim import make_optimizer
from openess_tpu.training.steps import StepBuilder, TrainState
from openess_tpu.training.trainer import Trainer

__all__ = [
    "ModelSet",
    "StepBuilder",
    "TrainState",
    "Trainer",
    "build_models",
    "make_optimizer",
    "task_from_settings",
    "trainable_labels",
]
