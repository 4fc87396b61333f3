"""Fold-aggregation tool test."""

import os

import pandas as pd
import pytest

from mirror_tpu.tools.aggregate_results import aggregate, best_epoch_metrics


def _write_summary(path, accs, aucs):
    os.makedirs(path, exist_ok=True)
    df = pd.DataFrame({
        "epoch": range(len(accs)),
        "train_loss": [1.0] * len(accs),
        "eval_loss": [0.5] * len(accs),
        "eval_acc": accs,
        "eval_auc": aucs,
    })
    df.to_csv(os.path.join(path, "summary.csv"), index=False)


def test_best_epoch_and_aggregation(tmp_path):
    root = tmp_path / "subtyping"
    _write_summary(str(root / "20260101-000000-mirror_classifier-fold_0"),
                   [60.0, 80.0, 70.0], [0.6, 0.9, 0.7])
    _write_summary(str(root / "20260101-000001-mirror_classifier-fold_1"),
                   [50.0, 66.0, 90.0], [0.5, 0.6, 0.8])

    best = best_epoch_metrics(
        str(root / "20260101-000000-mirror_classifier-fold_0" / "summary.csv"),
        "acc",
    )
    assert best["acc"] == 80.0 and best["auc"] == 0.9  # row of the best acc

    results = aggregate(str(root), "acc")
    assert len(results) == 1
    group = next(iter(results.values()))
    assert group["acc"]["mean"] == pytest.approx((80.0 + 90.0) / 2)
    assert sorted(group["acc"]["folds"]) == [80.0, 90.0]
    # lower-is-better metric picks min
    best_loss = best_epoch_metrics(
        str(root / "20260101-000001-mirror_classifier-fold_1" / "summary.csv"),
        "loss",
    )
    assert best_loss["loss"] == 0.5
