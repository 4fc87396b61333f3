#!/usr/bin/env python
"""Aggregate k-fold cross-validation results: mean +- std per metric.

The reference leaves fold aggregation to the user (each run only dumps its
own summary.csv / --result JSON; tools/downstream_tasks_evaluator.py fans out
jobs but never collects). This closes that gap: point it at a task output
root and it reports, per experiment group, the best-epoch metrics of every
fold and their mean +- std — the numbers papers actually quote.
"""

import argparse
import glob
import json
import os
import re
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

HIGHER_IS_BETTER = {"acc", "auc", "f1", "c-index"}


def best_epoch_metrics(summary_csv: str, eval_metric: str) -> Optional[Dict]:
    df = pd.read_csv(summary_csv)
    col = f"eval_{eval_metric}"
    if col not in df.columns or df[col].dropna().empty:
        return None
    idx = (
        df[col].idxmax() if eval_metric in HIGHER_IS_BETTER else df[col].idxmin()
    )
    row = df.loc[idx]
    return {
        c[len("eval_"):]: float(row[c])
        for c in df.columns
        if c.startswith("eval_") and pd.notna(row[c])
    }


def aggregate(task_root: str, eval_metric: str) -> Dict[str, Dict]:
    """Groups run dirs by name-minus-fold; returns {group: {metric: (mean, std, values)}}."""
    groups: Dict[str, List[Dict]] = defaultdict(list)
    for summary in sorted(glob.glob(os.path.join(task_root, "*", "summary.csv"))):
        run_name = os.path.basename(os.path.dirname(summary))
        group = re.sub(r"fold_\d+", "fold*", run_name)
        # timestamped prefix varies per run; strip it for grouping
        group = re.sub(r"^\d{8}-\d{6}-", "", group)
        metrics = best_epoch_metrics(summary, eval_metric)
        if metrics:
            groups[group].append(metrics)
    out = {}
    for group, fold_metrics in groups.items():
        keys = sorted({k for m in fold_metrics for k in m})
        out[group] = {
            k: {
                "mean": float(np.mean([m[k] for m in fold_metrics if k in m])),
                "std": float(np.std([m[k] for m in fold_metrics if k in m])),
                "folds": [m.get(k) for m in fold_metrics],
            }
            for k in keys
        }
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("task_root", help="e.g. out/subtyping")
    p.add_argument("--eval-metric", default="acc",
                   help="metric used to pick each fold's best epoch")
    p.add_argument("--json", action="store_true", help="machine-readable output")
    a = p.parse_args()
    results = aggregate(a.task_root, a.eval_metric)
    if a.json:
        print(json.dumps(results, indent=2))
        return
    for group, metrics in results.items():
        n_folds = max(len(v["folds"]) for v in metrics.values())
        print(f"\n{group}  ({n_folds} folds)")
        for k, v in metrics.items():
            print(f"  {k:24s} {v['mean']:.4f} +- {v['std']:.4f}")


if __name__ == "__main__":
    main()
