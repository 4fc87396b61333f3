#!/usr/bin/env python
"""RNA-seq feature pruning: Xena RSEM expression -> ~10k-dim per-sample CSV.

Rebuild of /root/reference/tools/distill_rna_feature.py (168 LoC):
1. read the UCSC-Xena RSEM isoform/gene FPKM matrix (parquet or TSV),
   keep columns whose 15-char sample ID matches an available WSI feature,
   transpose to samples x transcripts (ref :68-89);
2. map COSMIC census gene symbols to transcript/gene IDs via the gencode
   probemap (ref :91-105);
3. run RFECV (LinearSVC, StratifiedKFold(5), step=5%, accuracy) on the
   train split against a label column (ref :118-132);
4. final features = union(RFECV-selected, COSMIC) (ref :137), written as
   ``{cohort}_pruned_rna.csv`` indexed by sample ID (ref :140-145);
5. report SVC accuracy/precision/recall/F1 on the pruned features
   (ref :147-164).
"""

import argparse
import logging
import os

import pandas as pd

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("distill_rna")


def load_expression(path: str) -> pd.DataFrame:
    if path.endswith(".parquet"):
        return pd.read_parquet(path)
    return pd.read_csv(path, sep="\t", index_col=0)


def distill(
    expression_path: str,
    wsi_feature_dir: str,
    cosmic_csv: str,
    probemap_path: str,
    labels_csv: str,
    label_column: str,
    output_csv: str,
    rfecv_step: float = 0.05,
    cv: int = 5,
    seed: int = 42,
) -> pd.DataFrame:
    from sklearn.feature_selection import RFECV
    from sklearn.metrics import precision_recall_fscore_support
    from sklearn.model_selection import StratifiedKFold, train_test_split
    from sklearn.svm import LinearSVC

    expr = load_expression(expression_path)
    # columns are sample IDs; keep those with WSI features
    wsi_ids = {f.split(".")[0][:15] for f in os.listdir(wsi_feature_dir)}
    cols = [c for c in expr.columns if c[:15] in wsi_ids]
    expr = expr[cols].T  # samples x transcripts
    expr.index = [c[:15] for c in expr.index]
    expr = expr.loc[~expr.index.duplicated(keep="first")].fillna(0)
    _logger.info("expression matrix: %s", expr.shape)

    # COSMIC gene symbols -> transcript IDs via the probemap
    cosmic = pd.read_csv(cosmic_csv)
    symbol_col = "Gene Symbol" if "Gene Symbol" in cosmic.columns else cosmic.columns[0]
    cosmic_genes = set(cosmic[symbol_col].astype(str))
    probemap = pd.read_csv(probemap_path, sep="\t")
    id_col, gene_col = probemap.columns[0], probemap.columns[1]
    cosmic_ids = set(
        probemap.loc[probemap[gene_col].astype(str).isin(cosmic_genes), id_col]
    )
    cosmic_features = [c for c in expr.columns if c in cosmic_ids]
    _logger.info("COSMIC-mapped features: %d", len(cosmic_features))

    # labels
    labels_df = pd.read_csv(labels_csv)
    sid_col = "Sample ID" if "Sample ID" in labels_df.columns else labels_df.columns[0]
    labels_df = labels_df.set_index(labels_df[sid_col].str[:15])
    # dedup the truncated index: two vials sharing a 15-char prefix would
    # make .loc expand duplicates and desync len(y) from len(x) (same
    # hazard as datasets._filter_data / predict.py, handled there too)
    labels_df = labels_df[~labels_df.index.duplicated(keep="first")]
    common = expr.index.intersection(labels_df.index)
    x = expr.loc[common]
    y = labels_df.loc[common, label_column].astype(str)

    x_train, x_test, y_train, y_test = train_test_split(
        x, y, test_size=0.2, random_state=seed, stratify=y
    )
    svc = LinearSVC(random_state=seed, dual="auto")
    rfecv = RFECV(
        svc,
        step=rfecv_step,
        cv=StratifiedKFold(cv, shuffle=True, random_state=seed),
        scoring="accuracy",
        n_jobs=-1,
    )
    _logger.info("running RFECV on %s ...", x_train.shape)
    rfecv.fit(x_train.to_numpy(), y_train.to_numpy())
    selected = list(x.columns[rfecv.support_])
    _logger.info("RFECV selected %d features", len(selected))

    final_features = sorted(set(selected) | set(cosmic_features))
    pruned = expr[final_features]
    pruned.to_csv(output_csv)
    _logger.info("wrote %s with %d features", output_csv, len(final_features))

    # report downstream separability on the pruned set
    svc2 = LinearSVC(random_state=seed, dual="auto").fit(
        x_train[final_features].to_numpy(), y_train.to_numpy()
    )
    preds = svc2.predict(x_test[final_features].to_numpy())
    acc = float((preds == y_test.to_numpy()).mean())
    prec, rec, f1, _ = precision_recall_fscore_support(
        y_test, preds, average="weighted", zero_division=0
    )
    _logger.info("pruned-set SVC: acc %.4f P %.4f R %.4f F1 %.4f", acc, prec, rec, f1)
    return pruned


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--expression", required=True, help="Xena parquet/TSV matrix")
    p.add_argument("--wsi-feature-dir", required=True)
    p.add_argument("--cosmic-csv", required=True)
    p.add_argument("--probemap", required=True)
    p.add_argument("--labels-csv", required=True)
    p.add_argument("--label-column", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--rfecv-step", type=float, default=0.05)
    p.add_argument("--cv", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    a = p.parse_args()
    distill(
        a.expression, a.wsi_feature_dir, a.cosmic_csv, a.probemap, a.labels_csv,
        a.label_column, a.output, a.rfecv_step, a.cv, a.seed,
    )


if __name__ == "__main__":
    main()
