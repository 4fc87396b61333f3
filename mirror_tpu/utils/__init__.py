from .logging import setup_default_logging
from .meters import AverageMeter
from .platform import apply_forced_platform
from .seed import random_seed

__all__ = [
    "AverageMeter",
    "apply_forced_platform",
    "random_seed",
    "setup_default_logging",
]
