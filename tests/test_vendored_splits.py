"""The vendored ``splits/5foldcv`` CSVs are the fold-for-fold parity anchor
(reference ``splits/5foldcv/tcga_brca/splits_0.csv:1``; schema
``index,train,val`` of 12-char patient IDs). These are data contracts copied
verbatim from the reference — the ±0.01 AUC/c-index target is only
comparable on identical fold assignments (VERDICT.md round 1, missing #1).
"""

import os

import numpy as np
import pandas as pd
import pytest

from mirror_tpu.data.datasets import PretrainDataset, _read_split

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPLITS = os.path.join(REPO, "splits", "5foldcv")
COHORTS = ["tcga_brca", "tcga_coadread", "tcga_nsclc", "tcga_rcc"]


# Reference data quirk, preserved verbatim: tcga_rcc's splits contain
# duplicated patient rows and train/val overlaps (patients with slides in
# more than one RCC subtype cohort). Pinned so the vendored bytes can't
# silently drift from the reference.
_KNOWN_OVERLAP = {"tcga_rcc": [15, 10, 3, 10, 13]}


@pytest.mark.parametrize("cohort", COHORTS)
def test_vendored_splits_load_and_are_disjoint(cohort):
    expected_overlap = _KNOWN_OVERLAP.get(cohort, [0] * 5)
    for fold in range(5):
        train, val = _read_split(os.path.join(SPLITS, cohort), fold)
        assert len(train) > 0 and len(val) > 0
        overlap = set(train) & set(val)
        assert len(overlap) == expected_overlap[fold], (
            f"{cohort} fold {fold}: {len(overlap)} overlaps"
        )
        for pid in train + val:
            assert len(pid) == 12 and pid.startswith("TCGA-")
    # the 5 val folds cover the patient set
    all_patients = set()
    vals = []
    for fold in range(5):
        train, val = _read_split(os.path.join(SPLITS, cohort), fold)
        vals.append(set(val))
        all_patients |= set(train) | set(val)
    assert set.union(*vals) == all_patients
    if cohort not in _KNOWN_OVERLAP:
        for i in range(5):
            for j in range(i + 1, 5):
                assert not vals[i] & vals[j]


def test_pretrain_dataset_consumes_vendored_split(tmp_path):
    """Build a tiny cohort whose slide IDs come from the real BRCA split and
    drive ``update_fold_nb`` across all 5 folds."""
    train, val = _read_split(os.path.join(SPLITS, "tcga_brca"), 0)
    patients = (train + val)[:10]
    feat_dir = tmp_path / "features"
    feat_dir.mkdir()
    samples = [p + "-01" for p in patients]
    for s in samples:
        np.save(feat_dir / f"{s}Z-00-DX1.npy", np.zeros((8, 16), np.float32))
    rna = pd.DataFrame(
        np.zeros((len(samples), 4), np.float32),
        index=samples,
        columns=[f"g{i}" for i in range(4)],
    )
    rna_csv = tmp_path / "rna.csv"
    rna.to_csv(rna_csv)

    ds = PretrainDataset(
        wsi_feature_dir=str(feat_dir),
        rna_feature_csv=str(rna_csv),
        num_wsi_feature_tokens=8,
        splits=os.path.join(SPLITS, "tcga_brca"),
    )
    seen = set()
    for fold in range(5):
        ds.update_fold_nb(fold)
        ids = set(ds.train_feature_ids) | set(ds.val_feature_ids)
        assert ids, f"fold {fold} matched no slides"
        assert not set(ds.train_feature_ids) & set(ds.val_feature_ids)
        seen |= ids
    assert len(seen) == len(samples)
