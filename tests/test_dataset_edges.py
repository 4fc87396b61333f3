"""Dataset edge cases: all-censored survival cohorts (the pd.cut fallback
branch), wsi-only survival items, missing-RNA filtering warnings."""


import numpy as np
import pandas as pd

from mirror_tpu.data import SurvivalDataset, make_synthetic_cohort


def _all_censored_cohort(root):
    paths = make_synthetic_cohort(str(root), n_patients=8, feature_dim=16, rna_dim=24)
    surv = pd.read_csv(paths["survival_csv"])
    surv["Overall Survival Status"] = "0:LIVING"
    surv.to_csv(paths["survival_csv"], index=False)
    return paths


def test_survival_all_censored_uses_uniform_bins(tmp_path):
    """With zero events, discretization falls back to pd.cut over uniform
    bins (ref datasets/dataset_survival.py:187-195)."""
    paths = _all_censored_cohort(tmp_path)
    ds = SurvivalDataset(
        paths["feature_dir"], paths["rna_csv"], paths["survival_csv"],
        num_wsi_feature_tokens=8, splits=paths["splits_dir"], num_bins=4,
    )
    assert set(ds.survival_data["censorship"]) == {0}
    assert ds.survival_data["disc_label"].between(0, 3).all()
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["censorship"] == 0


def test_survival_wsi_only_items(tmp_path):
    paths = make_synthetic_cohort(
        str(tmp_path), n_patients=8, feature_dim=16, rna_dim=24
    )
    ds = SurvivalDataset(
        paths["feature_dir"], paths["rna_csv"], paths["survival_csv"],
        num_wsi_feature_tokens=8, splits=paths["splits_dir"],
        wsi_feature_only=True,
    )
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert "rna" not in item
    assert set(item) == {"wsi", "label", "event_time", "censorship"}


def test_missing_rna_rows_are_filtered(tmp_path):
    """Slides without an RNA row are dropped from the cohort (the reference's
    id-intersection, dataset_pretrain.py:74-81)."""
    from mirror_tpu.data import PretrainDataset

    paths = make_synthetic_cohort(
        str(tmp_path), n_patients=8, feature_dim=16, rna_dim=24
    )
    rna = pd.read_csv(paths["rna_csv"], index_col=0)
    rna = rna.iloc[:5]  # drop 3 samples' RNA
    rna.to_csv(paths["rna_csv"])
    ds = PretrainDataset(
        paths["feature_dir"], paths["rna_csv"], num_wsi_feature_tokens=8,
        splits=paths["splits_dir"],
    )
    total = len(ds.train_feature_ids) + len(ds.val_feature_ids)
    assert total == 5


def test_update_fold_nb_without_splits_is_a_noop(tmp_path):
    """The CLIs call update_fold_nb unconditionally; without --split-dir it
    must record the fold and keep the whole cohort trainable (the reference
    only folds when splits were given, dataset_pretrain.py:56-63) instead
    of raising on os.path.join(None, ...)."""
    from mirror_tpu.data import PretrainDataset

    paths = make_synthetic_cohort(
        str(tmp_path), n_patients=6, feature_dim=16, rna_dim=24
    )
    ds = PretrainDataset(
        paths["feature_dir"], paths["rna_csv"], num_wsi_feature_tokens=8,
        splits=None,
    )
    n_all = len(ds)
    assert n_all > 0
    ds.update_fold_nb(3)  # what the CLIs do
    assert ds.fold_nb == 3
    ds.train()
    assert len(ds) == n_all  # whole cohort still trains
