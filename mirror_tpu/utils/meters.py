"""Running-average meters for loss/throughput logging.

Mirrors the role of timm's AverageMeter as used throughout the reference
training loops (e.g. /root/reference/train_mirror.py:1104-1112).
"""


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
