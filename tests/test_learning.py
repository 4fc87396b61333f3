"""The framework must actually LEARN, not just run: on a separable synthetic
cohort, subtyping fine-tuning should reach high val AUC, and MIRROR
pretraining should push the contrastive alignment well below chance."""

import pytest
import yaml

import train_mirror
import train_subtyping
from mirror_tpu.data import make_synthetic_cohort

TINY = dict(wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, rna_mlp_ratio=2.0)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    # strong class signal in both modalities (synthetic.py adds class means)
    root = tmp_path_factory.mktemp("learn")
    return make_synthetic_cohort(
        str(root), n_patients=24, feature_dim=32, rna_dim=96, num_folds=4, seed=3
    )


@pytest.mark.parametrize("pinv_grad", ["exact", "implicit"])
def test_subtyping_learns(cohort, tmp_path, pinv_grad):
    # both pinv backward modes must train: "exact" is reference-faithful,
    # "implicit" is the experimental fast mode whose gradients deviate on
    # unconverged pinv iterates (see ops/pinv_pallas.py)
    cfg = dict(
        wsi_feature_dir=cohort["subtype_feature_dir"],
        rna_feature_csv=cohort["rna_csv"],
        split_dir=cohort["splits_dir"],
        classes=cohort["classes"],
        num_classes=2,
        # 32 tokens, not 24: eval re-draws the token subsample every epoch
        # (reference-faithful, harness.gather_eval_outputs), and on this
        # 6-patient val fold a 24-token draw is noisy enough to cap AUC at
        # 0.75 across all epochs while 32 reaches 1.0 — the margin is the
        # test's robustness to the faithful eval semantics, not the model's
        num_wsi_feature_tokens=32,
        batch_size=8,
        epochs=8,
        lr=1e-3,
        smoothing=0.0,
        amp=False,
        model="mirror_classifier",
        model_kwargs={**TINY, "fusion": "concat", "pinv_grad": pinv_grad},
        eval_metric="auc",
    )
    path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    results = train_subtyping.main(["--config", path, "--fold-nb", "0"])
    # separable synthetic cohort: anything < 0.9 AUC means learning is broken
    assert results["best_metric"] >= 0.9, results


def test_mirror_pretrain_loss_decreases(cohort, tmp_path):
    cfg = dict(
        wsi_feature_dir=cohort["feature_dir"],
        rna_feature_csv=cohort["rna_csv"],
        split_dir=cohort["splits_dir"],
        num_wsi_feature_tokens=24,
        batch_size=8,
        epochs=12,
        lr=3e-4,
        amp=False,
        output=str(tmp_path / "out"),
        experiment="learn",
        model_kwargs={
            **TINY, "wsi_num_tokens": 24, "num_prototypes": 16,
            "style_mlp_hidden_dim": 24, "style_mlp_out_dim": 16,
            "style_latent_dim": 8,
        },
    )
    path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    results = train_mirror.main(["--config", path, "--fold-nb", "0"])
    import pandas as pd

    df = pd.read_csv(str(tmp_path / "out" / "pretrain" / "learn" / "summary.csv"))
    # the training loss must fall decisively (the val fold is 6 samples with
    # stochastic masking/VAE sampling — too noisy for a tight bound, but it
    # must at least improve)
    train_first, train_last = float(df["train_loss"].iloc[0]), float(df["train_loss"].iloc[-1])
    assert train_last < train_first * 0.8, (train_first, train_last)
    first, best = float(df["eval_loss"].iloc[0]), float(df["eval_loss"].min())
    assert best < first, (first, best)
    assert results["best_metric"] == pytest.approx(best, rel=1e-6)
