"""Synthetic TCGA-shaped fixtures.

The reference has no tests and requires real TCGA artifacts; this module
fabricates a miniature cohort with the exact on-disk contracts the datasets
expect (SURVEY.md section 4):

- per-slide feature files named like TCGA slides
  (``TCGA-AB-0001-01Z-00-DX1.npy``; 12-char patient / 15-char sample prefixes)
- an RNA CSV indexed by 15-char sample IDs
- k-fold split CSVs with ``index,train,val`` columns of 12-char patient IDs
  (schema of splits/5foldcv/tcga_brca/splits_0.csv)
- a cBioPortal-style survival CSV (Patient ID / Sample ID / Overall Survival
  (Months) / Overall Survival Status with "1:DECEASED"/"0:LIVING")
- subtyping class subdirectories
"""

import os
import string
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

from .formats import save_feature_file


def _patient_id(i: int) -> str:
    letters = string.ascii_uppercase
    site = letters[(i // 26) % 26] + letters[i % 26]
    return f"TCGA-{site}-{i:04d}"


def make_synthetic_cohort(
    root: str,
    n_patients: int = 12,
    feature_dim: int = 64,
    rna_dim: int = 128,
    min_tokens: int = 40,
    max_tokens: int = 200,
    classes: Optional[Sequence[str]] = ("IDC", "ILC"),
    num_folds: int = 5,
    seed: int = 0,
    fmt: str = "npy",
) -> Dict[str, str]:
    """Builds the cohort under ``root``; returns the path map."""
    rng = np.random.default_rng(seed)
    feat_dir = os.path.join(root, "features")
    subtype_dir = os.path.join(root, "features_by_class")
    splits_dir = os.path.join(root, "splits")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(splits_dir, exist_ok=True)

    patients = [_patient_id(i) for i in range(n_patients)]
    samples = [p + "-01" for p in patients]
    slides = [s + "Z-00-DX1" for s in samples]
    labels = rng.integers(0, len(classes), size=n_patients) if classes else None

    # per-class latent means make the classification task learnable
    class_means = rng.normal(scale=0.5, size=(len(classes) if classes else 1, feature_dim))

    for i, slide in enumerate(slides):
        n_tok = int(rng.integers(min_tokens, max_tokens + 1))
        mean = class_means[labels[i]] if classes else 0.0
        feats = (rng.normal(size=(n_tok, feature_dim)) + mean).astype(np.float32)
        save_feature_file(os.path.join(feat_dir, f"{slide}.{fmt}"), feats)
        if classes:
            cdir = os.path.join(subtype_dir, classes[labels[i]])
            os.makedirs(cdir, exist_ok=True)
            save_feature_file(os.path.join(cdir, f"{slide}.{fmt}"), feats)

    rna = rng.normal(size=(n_patients, rna_dim)).astype(np.float32)
    if classes:  # truthiness like every other guard: classes=() is no-class
        rna[:, : len(classes)] += np.eye(len(classes))[labels] * 2.0
    rna_df = pd.DataFrame(
        rna, index=samples, columns=[f"gene_{g}" for g in range(rna_dim)]
    )
    rna_csv = os.path.join(root, "rna.csv")
    rna_df.to_csv(rna_csv)

    # k-fold splits over patients
    order = rng.permutation(n_patients)
    folds = np.array_split(order, num_folds)
    for fold in range(num_folds):
        val_idx = set(folds[fold].tolist())
        train = [patients[i] for i in range(n_patients) if i not in val_idx]
        val = [patients[i] for i in range(n_patients) if i in val_idx]
        n_rows = max(len(train), len(val))
        df = pd.DataFrame(
            {
                "train": train + [np.nan] * (n_rows - len(train)),
                "val": val + [np.nan] * (n_rows - len(val)),
            }
        )
        df.to_csv(os.path.join(splits_dir, f"splits_{fold}.csv"))

    # survival csv
    months = rng.uniform(1.0, 120.0, size=n_patients).round(2)
    deceased = rng.integers(0, 2, size=n_patients)
    surv_df = pd.DataFrame(
        {
            "Patient ID": patients,
            "Sample ID": samples,
            "Overall Survival (Months)": months,
            "Overall Survival Status": [
                "1:DECEASED" if d else "0:LIVING" for d in deceased
            ],
        }
    )
    surv_csv = os.path.join(root, "survival.csv")
    surv_df.to_csv(surv_csv, index=False)

    return {
        "feature_dir": feat_dir,
        "subtype_feature_dir": subtype_dir,
        "rna_csv": rna_csv,
        "survival_csv": surv_csv,
        "splits_dir": splits_dir,
        "classes": list(classes) if classes else [],
    }
