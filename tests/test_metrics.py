"""Metric tests vs sklearn (AUROC/F1) and hand-built c-index cases."""

import numpy as np
import pytest

from mirror_tpu.train.metrics import (
    accuracy,
    concordance_index_censored,
    multiclass_auroc,
    multiclass_f1,
)


def test_accuracy():
    logits = np.array([[2.0, 1.0], [0.0, 3.0], [1.0, 0.0], [0.0, 1.0]])
    labels = np.array([0, 1, 1, 1])
    assert accuracy(logits, labels) == pytest.approx(75.0)


def test_auroc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(200, 4))
    labels = rng.integers(0, 4, size=200)
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs /= probs.sum(1, keepdims=True)
    for avg in ("macro", "weighted"):
        want = roc_auc_score(labels, probs, multi_class="ovr", average=avg)
        got = multiclass_auroc(logits, labels, average=avg)
        assert got == pytest.approx(want, abs=1e-9)


def test_f1_matches_sklearn():
    from sklearn.metrics import f1_score

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(100, 3))
    labels = rng.integers(0, 3, size=100)
    preds = logits.argmax(1)
    for avg in ("macro", "weighted", "micro"):
        want = f1_score(labels, preds, average=avg)
        got = multiclass_f1(logits, labels, average=avg)
        assert got == pytest.approx(want, abs=1e-9)


def test_cindex_hand_cases():
    # perfect ranking: higher risk fails first
    event = np.array([True, True, True])
    time = np.array([1.0, 2.0, 3.0])
    risk = np.array([3.0, 2.0, 1.0])
    c, con, dis, tr, tt = concordance_index_censored(event, time, risk)
    assert c == 1.0 and con == 3 and dis == 0

    # fully anti-concordant
    c, *_ = concordance_index_censored(event, time, -risk)
    assert c == 0.0

    # censored sample only comparable as the 'later' member of a pair
    event = np.array([True, False])
    time = np.array([1.0, 2.0])
    risk = np.array([2.0, 1.0])
    c, con, dis, tr, tt = concordance_index_censored(event, time, risk)
    assert con == 1 and c == 1.0

    # censored at the same time as an event IS comparable
    event = np.array([True, False])
    time = np.array([2.0, 2.0])
    risk = np.array([3.0, 1.0])
    c, con, dis, tr, tt = concordance_index_censored(event, time, risk)
    assert con == 1 and c == 1.0


def test_cindex_tied_risk():
    event = np.array([True, True])
    time = np.array([1.0, 2.0])
    risk = np.array([1.0, 1.0])
    c, con, dis, tr, tt = concordance_index_censored(event, time, risk)
    assert tr == 1 and c == 0.5


def test_cindex_no_comparable_raises():
    event = np.array([False, True])
    time = np.array([1.0, 2.0])
    risk = np.array([2.0, 1.0])
    with pytest.raises(ValueError):
        concordance_index_censored(event, time, risk)


def test_cindex_all_censored_raises():
    with pytest.raises(ValueError):
        concordance_index_censored(
            np.array([False, False]), np.array([1.0, 2.0]), np.array([1.0, 2.0])
        )


def test_cindex_event_time_ties_not_comparable():
    # two events at the same time are not a comparable pair
    event = np.array([True, True])
    time = np.array([1.0, 1.0])
    risk = np.array([2.0, 1.0])
    with pytest.raises(ValueError):
        concordance_index_censored(event, time, risk)


def test_update_summary_single_header_across_resume(tmp_path):
    """Appending into an existing summary.csv (a --resume into the same run
    dir) must NOT write a second header row mid-file — a stray string row
    flips metric columns to object dtype and breaks aggregate_results."""
    import pandas as pd

    from mirror_tpu.train.harness import update_summary

    path = str(tmp_path / "summary.csv")
    update_summary(0, {"loss": 1.0}, {"acc": 50.0}, path)
    update_summary(1, {"loss": 0.9}, {"acc": 55.0}, path)
    # simulate a fresh process resuming into the same run dir
    update_summary(2, {"loss": 0.8}, {"acc": 60.0}, path)

    with open(path) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 4  # one header + three rows
    df = pd.read_csv(path)
    assert df["eval_acc"].dtype.kind == "f"
    assert df["epoch"].tolist() == [0, 1, 2]
