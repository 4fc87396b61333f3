#!/usr/bin/env python
"""Split a cohort feature dir into per-subtype directories.

Semantics of /root/reference/tools/split_subtypes.py:31-70: read a
cBioPortal clinical CSV, map each sample to its oncotree code, and symlink
every diagnostic (-DX*) slide's feature file into
``{output}/{oncotree_code}/``.
"""

import argparse
import logging
import os

import pandas as pd

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("split_subtypes")


def split_subtypes(
    feature_dir: str,
    clinical_csv: str,
    output_dir: str,
    sample_id_column: str = "Sample ID",
    oncotree_column: str = "Oncotree Code",
    codes=None,
) -> None:
    clinical = pd.read_csv(clinical_csv)
    code_by_sample = dict(
        zip(clinical[sample_id_column], clinical[oncotree_column])
    )
    n_linked = 0
    for fname in sorted(os.listdir(feature_dir)):
        if not fname.endswith((".pt", ".npy", ".npz")):
            continue
        slide = fname.split(".")[0]
        if "-DX" not in slide:
            continue
        code = code_by_sample.get(slide[:15])
        if code is None or (codes and code not in codes):
            continue
        out_dir = os.path.join(output_dir, str(code))
        os.makedirs(out_dir, exist_ok=True)
        dst = os.path.join(out_dir, fname)
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(os.path.join(feature_dir, fname)), dst)
            n_linked += 1
    _logger.info("Linked %d slides into %s", n_linked, output_dir)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("feature_dir")
    p.add_argument("clinical_csv")
    p.add_argument("output_dir")
    p.add_argument("--sample-id-column", default="Sample ID")
    p.add_argument("--oncotree-column", default="Oncotree Code")
    p.add_argument("--codes", nargs="+", default=None,
                   help="restrict to these oncotree codes (e.g. IDC ILC)")
    a = p.parse_args()
    split_subtypes(
        a.feature_dir, a.clinical_csv, a.output_dir,
        a.sample_id_column, a.oncotree_column, a.codes,
    )


if __name__ == "__main__":
    main()
