"""Evaluation metrics (host-side numpy).

Replaces the reference's torcheval/sksurv dependencies with self-contained
implementations:

- ``accuracy``            == timm accuracy top-1 (train_subtyping.py:1390)
- ``multiclass_auroc``    == torcheval MulticlassAUROC (one-vs-rest, macro or
  weighted average; train_subtyping.py:1355-1360)
- ``multiclass_f1``       == torcheval MulticlassF1Score
- ``concordance_index_censored`` == sksurv.metrics.concordance_index_censored
  (train_survival.py:1460-1465), tied_tol=1e-8. Computed GLOBALLY over the
  full validation set — the reference averages per-rank c-indices, which is
  a distortion we deliberately fix (per-rank mode is not reproduced).

All metrics run on the host after gathering per-batch outputs; they are
sort-based and tiny compared to the model compute.
"""

from typing import Tuple

import numpy as np


def accuracy(logits: np.ndarray, labels: np.ndarray) -> float:
    return float((logits.argmax(axis=1) == labels).mean() * 100.0)


def _binary_auroc(scores: np.ndarray, positives: np.ndarray) -> float:
    """Rank-based AUC (equivalent to the Mann-Whitney U statistic)."""
    pos = scores[positives]
    neg = scores[~positives]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(np.concatenate([pos, neg]), kind="mergesort")
    ranks = np.empty(len(order), dtype=np.float64)
    sorted_scores = np.concatenate([pos, neg])[order]
    # average ranks for ties
    ranks[order] = np.arange(1, len(order) + 1)
    i = 0
    svals = sorted_scores
    while i < len(svals):
        j = i
        while j + 1 < len(svals) and svals[j + 1] == svals[i]:
            j += 1
        if j > i:
            avg = (i + j) / 2.0 + 1.0
            ranks[order[i : j + 1]] = avg
        i = j + 1
    r_pos = ranks[: len(pos)].sum()
    auc = (r_pos - len(pos) * (len(pos) + 1) / 2.0) / (len(pos) * len(neg))
    return float(auc)


def multiclass_auroc(
    logits: np.ndarray, labels: np.ndarray, average: str = "macro"
) -> float:
    """One-vs-rest multiclass AUROC over softmax probabilities."""
    num_classes = logits.shape[1]
    probs = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(probs)
    probs /= probs.sum(axis=1, keepdims=True)
    aucs, weights = [], []
    for c in range(num_classes):
        pos = labels == c
        auc = _binary_auroc(probs[:, c], pos)
        if not np.isnan(auc):
            aucs.append(auc)
            weights.append(pos.sum())
    if not aucs:
        return float("nan")
    if average == "weighted":
        w = np.asarray(weights, dtype=np.float64)
        return float(np.average(aucs, weights=w))
    return float(np.mean(aucs))


def multiclass_f1(
    logits: np.ndarray, labels: np.ndarray, average: str = "macro"
) -> float:
    preds = logits.argmax(axis=1)
    num_classes = logits.shape[1]
    f1s, weights = [], []
    for c in range(num_classes):
        tp = np.sum((preds == c) & (labels == c))
        fp = np.sum((preds == c) & (labels != c))
        fn = np.sum((preds != c) & (labels == c))
        denom = 2 * tp + fp + fn
        f1 = (2 * tp / denom) if denom > 0 else 0.0
        f1s.append(f1)
        weights.append(np.sum(labels == c))
    if average == "weighted":
        w = np.asarray(weights, dtype=np.float64)
        if w.sum() == 0:
            return 0.0
        return float(np.average(f1s, weights=w))
    if average == "micro":
        return float((preds == labels).mean())
    return float(np.mean(f1s))


def concordance_index_censored(
    event_indicator: np.ndarray,
    event_time: np.ndarray,
    estimate: np.ndarray,
    tied_tol: float = 1e-8,
) -> Tuple[float, int, int, int, int]:
    """sksurv-compatible censored concordance index.

    Comparable pairs: (i, j) with event_i=True and (t_i < t_j, or t_i == t_j
    with event_j=False). Concordant when the higher-risk sample fails first;
    risk ties within tied_tol count 0.5.

    Returns (cindex, concordant, discordant, tied_risk, tied_time).
    """
    event_indicator = np.asarray(event_indicator, dtype=bool)
    event_time = np.asarray(event_time, dtype=np.float64)
    estimate = np.asarray(estimate, dtype=np.float64)
    if not event_indicator.any():
        raise ValueError("All samples are censored")

    # pair (i, j) is comparable iff event_i and (t_j > t_i, or t_j == t_i and
    # j is censored). Two events at the same time are not comparable.
    t_i = event_time[:, None]
    t_j = event_time[None, :]
    ev_i = event_indicator[:, None]
    ev_j = event_indicator[None, :]
    comparable = ev_i & ((t_j > t_i) | ((t_j == t_i) & ~ev_j))

    diff = estimate[:, None] - estimate[None, :]
    ties = np.abs(diff) <= tied_tol
    concordant = int(np.sum(comparable & ~ties & (diff > 0)))
    discordant = int(np.sum(comparable & ~ties & (diff < 0)))
    tied_risk = int(np.sum(comparable & ties))
    # sksurv's tied_time: comparable pairs where the times are EQUAL, i.e. an
    # event i against a censored j at the same time (event-event time ties
    # are not comparable and are excluded — a previous version counted those
    # instead, which matches nothing sksurv reports)
    tied_time = int(np.sum(ev_i & (t_j == t_i) & ~ev_j))

    total = concordant + discordant + tied_risk
    if total == 0:
        raise ValueError("No comparable pairs")
    cindex = (concordant + 0.5 * tied_risk) / total
    return float(cindex), concordant, discordant, tied_risk, tied_time
