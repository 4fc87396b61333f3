#!/usr/bin/env python
"""Fan 5-fold pretraining jobs over available TPU slots, with elastic
restart-on-failure.

Rebuild of /root/reference/tools/pretrain_job_launcher.py:104-147 (enqueue
one ``train_mirror.py --config C --fold-nb k`` job per fold, drain through
the slot pool) plus the torchrun-elastic behavior the reference gets from
its c10d rendezvous (scripts/run_train_mirror.sh:62-68): a failed fold is
retried up to ``--max-retries`` times, resuming from its newest
recovery/last checkpoint when one exists.
"""

import argparse
import glob
import logging
import os
import sys

from mirror_tpu.tools.launcher import run_jobs

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("pretrain_launcher")


def newest_resumable(output_root: str, fold: int):
    """Newest recovery/last checkpoint for the fold, if any."""
    if not output_root:
        return None
    candidates = []
    for name in ("recovery.msgpack", "recovery.orbax",
                 "last.msgpack", "last.orbax"):
        for path in glob.glob(
            # *fold_{fold} (no trailing wildcard): *fold_1* also matches
            # fold_10+ run dirs and could resume from another fold
            os.path.join(output_root, "pretrain", f"*fold_{fold}", name)
        ):
            candidates.append((os.path.getmtime(path), path))
    return max(candidates)[1] if candidates else None


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--script", default="train_mirror.py")
    p.add_argument("--slots", nargs="+", default=["0"])
    p.add_argument("--virtual-factor", type=int, default=1)
    p.add_argument("--max-retries", type=int, default=0,
                   help="retry failed folds, resuming from their newest "
                        "recovery/last checkpoint")
    p.add_argument("--output-root", default="",
                   help="the config's `output` dir (for resume discovery)")
    p.add_argument("extra", nargs=argparse.REMAINDER,
                   help="extra flags forwarded to the train script")
    a = p.parse_args()

    def command(fold, resume=None):
        cmd = [sys.executable, a.script, "--config", a.config,
               "--fold-nb", str(fold)]
        if resume:
            cmd += ["--resume", resume]
        return cmd + list(a.extra)

    pending = list(range(a.k))
    for attempt in range(a.max_retries + 1):
        commands = [
            command(f, newest_resumable(a.output_root, f) if attempt else None)
            for f in pending
        ]
        codes = run_jobs(commands, slots=a.slots, virtual_factor=a.virtual_factor)
        pending = [f for f, c in zip(pending, codes) if c != 0]
        if not pending:
            break
        if attempt < a.max_retries:
            _logger.warning(
                "folds %s failed (attempt %d); retrying with resume", pending,
                attempt + 1,
            )
    if pending:
        _logger.error("folds failed after retries: %s", pending)
        sys.exit(1)
    _logger.info("all %d folds finished", a.k)


if __name__ == "__main__":
    main()
