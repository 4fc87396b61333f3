from .classifier import MIRRORClassifier
from .layers import Mlp, RnaAttention, RnaBlock
from .mirror import MIRROR, MirrorOutput
from .nystrom import NystromAttention, moore_penrose_pinv
from .rna_transformer import TransFormer, TransFormerHybrid
from .transmil import (
    PPEG,
    FeatureTransMIL,
    FeatureTransMILHybrid,
    TransLayer,
)

__all__ = [
    "MIRROR",
    "MIRRORClassifier",
    "MirrorOutput",
    "Mlp",
    "NystromAttention",
    "PPEG",
    "FeatureTransMIL",
    "FeatureTransMILHybrid",
    "RnaAttention",
    "RnaBlock",
    "TransFormer",
    "TransFormerHybrid",
    "TransLayer",
    "moore_penrose_pinv",
]
