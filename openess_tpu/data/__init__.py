from openess_tpu.data.augment import augment_batch
from openess_tpu.data.loaders import build_datasets
from openess_tpu.data.pipeline import PrefetchLoader
from openess_tpu.data.synthetic import SyntheticESS

__all__ = ["PrefetchLoader", "SyntheticESS", "augment_batch", "build_datasets"]
