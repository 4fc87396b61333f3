#!/usr/bin/env python
"""Fan 5-fold pretraining jobs over available TPU slots.

Rebuild of /root/reference/tools/pretrain_job_launcher.py:104-147: enqueue
one ``train_mirror.py --config C --fold-nb k`` job per fold and drain them
through the slot pool (sequentially on a single chip).
"""

import argparse
import logging
import sys

from mirror_tpu.tools.launcher import run_jobs

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("pretrain_launcher")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--script", default="train_mirror.py")
    p.add_argument("--slots", nargs="+", default=["0"])
    p.add_argument("--virtual-factor", type=int, default=1)
    p.add_argument("extra", nargs=argparse.REMAINDER,
                   help="extra flags forwarded to the train script")
    a = p.parse_args()

    commands = [
        [sys.executable, a.script, "--config", a.config, "--fold-nb", str(fold)]
        + list(a.extra)
        for fold in range(a.k)
    ]
    codes = run_jobs(commands, slots=a.slots, virtual_factor=a.virtual_factor)
    failed = [i for i, c in enumerate(codes) if c != 0]
    if failed:
        _logger.error("folds failed: %s", failed)
        sys.exit(1)
    _logger.info("all %d folds finished", a.k)


if __name__ == "__main__":
    main()
