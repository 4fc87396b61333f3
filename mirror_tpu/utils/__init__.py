from .logging import setup_default_logging
from .meters import AverageMeter
from .seed import random_seed

__all__ = ["AverageMeter", "random_seed", "setup_default_logging"]
