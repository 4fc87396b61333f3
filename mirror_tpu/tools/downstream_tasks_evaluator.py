#!/usr/bin/env python
"""Evaluate downstream tasks (subtyping/survival x fine-tune/linear-probe/
few-shot) across folds, auto-discovering pretrain checkpoints.

Rebuild of /root/reference/tools/downstream_tasks_evaluator.py:140-263:
for each task config x fold, find the latest timestamped run dir's best
pretrain checkpoint for that fold (ref :114-116,144-154) and launch the
task script with ``--initial-checkpoint`` appended (ref :174-175), fanned
over TPU slots.
"""

import argparse
import glob
import logging
import os
import sys
from typing import Optional

from mirror_tpu.tools.launcher import run_jobs

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("downstream_evaluator")


def find_fold_checkpoint(pretrain_root: str, fold: int) -> Optional[str]:
    """Latest run dir whose name contains ``fold_{fold}``, best checkpoint."""
    run_dirs = sorted(
        d for d in glob.glob(os.path.join(pretrain_root, "*"))
        # exact suffix match: a "fold_1" substring test would also match
        # fold_10+ and silently pick ANOTHER fold's checkpoint (leakage)
        if os.path.isdir(d) and os.path.basename(d).endswith(f"fold_{fold}")
    )
    for d in reversed(run_dirs):
        for name in ("model_best.msgpack", "model_best.orbax",
                     "last.msgpack", "last.orbax"):
            path = os.path.join(d, name)
            if os.path.exists(path):
                return path
    return None


_TASK_SCRIPTS = {
    "subtyping": "train_subtyping.py",
    "survival": "train_survival.py",
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrain-root", required=True,
                   help="dir containing per-fold pretrain run dirs")
    p.add_argument("--task-configs", nargs="+", required=True,
                   help="entries of the form task:config.yaml (task in "
                        "subtyping|survival)")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--slots", nargs="+", default=["0"])
    p.add_argument("--virtual-factor", type=int, default=1)
    p.add_argument("extra", nargs=argparse.REMAINDER)
    a = p.parse_args()

    commands = []
    for entry in a.task_configs:
        task, _, config = entry.partition(":")
        if task not in _TASK_SCRIPTS or not config:
            raise SystemExit(f"bad --task-configs entry: {entry}")
        for fold in range(a.k):
            ckpt = find_fold_checkpoint(a.pretrain_root, fold)
            if ckpt is None:
                _logger.warning("no pretrain checkpoint for fold %d; skipping", fold)
                continue
            commands.append(
                [sys.executable, _TASK_SCRIPTS[task], "--config", config,
                 "--fold-nb", str(fold), "--initial-checkpoint", ckpt]
                + list(a.extra)
            )
    _logger.info("%d jobs queued", len(commands))
    codes = run_jobs(commands, slots=a.slots, virtual_factor=a.virtual_factor)
    failed = [i for i, c in enumerate(codes) if c != 0]
    if failed:
        _logger.error("jobs failed: %s", failed)
        sys.exit(1)
    _logger.info("all jobs finished")


if __name__ == "__main__":
    main()
