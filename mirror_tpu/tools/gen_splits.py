#!/usr/bin/env python
"""Generate k-fold cross-validation split CSVs.

Semantics of /root/reference/tools/gen_splits.py:41-75: sklearn
KFold(n_splits=k, shuffle=True, random_state=seed); each fold writes
``splits_{i}.csv`` with ``train``/``val`` columns of 12-char patient IDs.

Two deliberate fixes vs the reference (PARITY.md,
tests/test_reference_oracle_tools.py): the reference folds over raw
``os.listdir`` FILENAMES, so (a) a patient with multiple slides can land in
BOTH train and val of the same fold (split leakage), and (b) the folds
depend on the filesystem's directory order (non-reproducible across
machines). This folds over SORTED UNIQUE 12-char patient IDs — identical
output for the 1-slide-per-patient sorted case, leak-free and deterministic
otherwise.
"""

import argparse
import os

import numpy as np
import pandas as pd
from sklearn.model_selection import KFold


def gen_splits(
    feature_dir: str, output_dir: str, k: int = 5, seed: int = 42
) -> None:
    files = sorted(
        f for f in os.listdir(feature_dir) if f.endswith((".pt", ".npy", ".npz"))
    )
    if not files:
        raise SystemExit(f"No feature files in {feature_dir}")
    patients = np.array(sorted({f.split(".")[0][:12] for f in files}))
    os.makedirs(output_dir, exist_ok=True)
    kf = KFold(n_splits=k, shuffle=True, random_state=seed)
    for fold, (train_idx, val_idx) in enumerate(kf.split(patients)):
        train = patients[train_idx].tolist()
        val = patients[val_idx].tolist()
        n_rows = max(len(train), len(val))
        df = pd.DataFrame(
            {
                "train": train + [np.nan] * (n_rows - len(train)),
                "val": val + [np.nan] * (n_rows - len(val)),
            }
        )
        df.to_csv(os.path.join(output_dir, f"splits_{fold}.csv"))
        print(f"splits_{fold}.csv: {len(train)} train / {len(val)} val patients")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("feature_dir")
    p.add_argument("output_dir")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    a = p.parse_args()
    gen_splits(a.feature_dir, a.output_dir, a.k, a.seed)


if __name__ == "__main__":
    main()
