from .info_nce import info_nce, local_info_nce
from .mirror_loss import MirrorLossWeights, clip_loss, local_clip_loss, mirror_loss
from .surv import ce_surv_loss, nll_surv_loss

__all__ = [
    "MirrorLossWeights",
    "ce_surv_loss",
    "clip_loss",
    "info_nce",
    "local_clip_loss",
    "local_info_nce",
    "mirror_loss",
    "nll_surv_loss",
]
