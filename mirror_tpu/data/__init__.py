from .datasets import PretrainDataset, SubtypingDataset, SurvivalDataset
from .loader import Loader, class_balanced_weights
from .synthetic import make_synthetic_cohort

__all__ = [
    "Loader",
    "PretrainDataset",
    "SubtypingDataset",
    "SurvivalDataset",
    "class_balanced_weights",
    "make_synthetic_cohort",
]
