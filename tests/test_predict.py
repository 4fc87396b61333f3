"""predict CLI: scores every feature file in a directory from a trained
checkpoint (model rebuilt from the checkpoint's embedded run args)."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

import train_subtyping
import train_survival
from mirror_tpu.data import make_synthetic_cohort
from mirror_tpu.tools.predict import predict

TINY = dict(wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, rna_mlp_ratio=2.0)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("predcohort")
    return make_synthetic_cohort(
        str(root), n_patients=24, feature_dim=32, rna_dim=96, num_folds=4
    )


def test_predict_subtyping(cohort, tmp_path):
    cfg = dict(
        wsi_feature_dir=cohort["subtype_feature_dir"],
        rna_feature_csv=cohort["rna_csv"],
        split_dir=cohort["splits_dir"],
        classes=cohort["classes"],
        num_classes=2,
        num_wsi_feature_tokens=16,
        batch_size=8,
        epochs=1,
        amp=False,
        model="mirror_classifier",
        model_kwargs={**TINY, "fusion": "concat"},
        output=str(tmp_path / "out"),
        experiment="p",
    )
    path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    train_subtyping.main(["--config", path, "--fold-nb", "0"])
    ckpt = str(tmp_path / "out" / "subtyping" / "p" / "model_best.msgpack")
    assert os.path.exists(ckpt)

    out_csv = str(tmp_path / "preds.csv")
    rows = predict(
        ckpt, "subtyping", cohort["feature_dir"], out_csv,
        rna_feature_csv=cohort["rna_csv"], batch_size=8,
    )
    df = pd.read_csv(out_csv)
    assert len(df) == len(rows) > 0
    assert {"slide_id", "pred", "prob_0", "prob_1"} <= set(df.columns)
    probs = df[["prob_0", "prob_1"]].to_numpy()
    assert ((probs.sum(axis=1) - 1.0) ** 2 < 1e-8).all()


def test_predict_survival(cohort, tmp_path):
    cfg = dict(
        wsi_feature_dir=cohort["feature_dir"],
        rna_feature_csv=cohort["rna_csv"],
        survival_csv=cohort["survival_csv"],
        split_dir=cohort["splits_dir"],
        num_bins=4,
        num_classes=4,
        num_wsi_feature_tokens=16,
        batch_size=8,
        epochs=1,
        amp=False,
        model="mirror_classifier",
        model_kwargs={**TINY, "fusion": "concat"},
        output=str(tmp_path / "out"),
        experiment="s",
    )
    path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    train_survival.main(["--config", path, "--fold-nb", "0"])
    ckpt = str(tmp_path / "out" / "survival" / "s" / "model_best.msgpack")
    assert os.path.exists(ckpt)

    out_csv = str(tmp_path / "risks.csv")
    predict(
        ckpt, "survival", cohort["feature_dir"], out_csv,
        rna_feature_csv=cohort["rna_csv"], batch_size=8,
    )
    df = pd.read_csv(out_csv)
    assert {"slide_id", "risk"} <= set(df.columns)
    assert df["risk"].notna().all()


def test_predict_whole_slide_matches_dense_full_sequence(cohort, tmp_path):
    """--whole-slide scores EVERY patch via the context-parallel encoder;
    on a slide it must equal the dense model forward over the same full
    token set (the CP encoder is exact, tests/test_context_parallel.py), so
    the last-mile glue (cls row -> head_from_wsi fusion) is what's under
    test here."""
    import numpy as np

    from mirror_tpu.data.formats import load_feature_file
    from mirror_tpu.registry import create_model
    from mirror_tpu.tools.predict import predict as run_predict
    from mirror_tpu.train.checkpoint import load_checkpoint_file

    cfg = dict(
        wsi_feature_dir=cohort["subtype_feature_dir"],
        rna_feature_csv=cohort["rna_csv"],
        split_dir=cohort["splits_dir"],
        classes=cohort["classes"],
        num_classes=2,
        num_wsi_feature_tokens=16,
        batch_size=8,
        epochs=1,
        amp=False,
        model="mirror_classifier",
        model_kwargs={**TINY, "fusion": "concat"},
        output=str(tmp_path / "out"),
        experiment="ws",
    )
    path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    train_subtyping.main(["--config", path, "--fold-nb", "0"])
    ckpt = str(tmp_path / "out" / "subtyping" / "ws" / "model_best.msgpack")

    out_csv = str(tmp_path / "ws_preds.csv")
    rows = run_predict(
        ckpt, "subtyping", cohort["feature_dir"], out_csv,
        rna_feature_csv=cohort["rna_csv"], batch_size=4, whole_slide=True,
    )
    df = pd.read_csv(out_csv).set_index("slide_id")
    assert len(df) == len(rows) > 0

    # dense reference: full token set through the normal model forward
    payload = load_checkpoint_file(ckpt)
    model = create_model("mirror_classifier", num_classes=2,
                         **{**TINY, "fusion": "concat"})
    rna_df = pd.read_csv(cohort["rna_csv"], index_col=0)
    rna_df.index = [str(i)[:15] for i in rna_df.index]
    import glob as _glob

    checked = 0
    for f in sorted(_glob.glob(os.path.join(cohort["feature_dir"], "*.npy")))[:3]:
        sid = os.path.basename(f).split(".")[0]
        feats = np.asarray(load_feature_file(f), np.float32)
        rna = rna_df.loc[sid[:15]].to_numpy(np.float32)
        logits = model.apply(
            {"params": payload["state_dict"]}, feats[None], rna[None], True
        )
        p = np.exp(logits[0] - logits[0].max())
        p = np.asarray(p / p.sum())
        np.testing.assert_allclose(
            df.loc[sid, ["prob_0", "prob_1"]].to_numpy(), p, atol=1e-4,
        )
        checked += 1
    assert checked == 3


def test_predict_wsi_only(cohort, tmp_path):
    cfg = dict(
        wsi_feature_dir=cohort["subtype_feature_dir"],
        rna_feature_csv=cohort["rna_csv"],
        split_dir=cohort["splits_dir"],
        classes=cohort["classes"],
        num_classes=2,
        num_wsi_feature_tokens=16,
        batch_size=8,
        epochs=1,
        amp=False,
        wsi_feature_only=True,
        model="mirror_classifier",
        model_kwargs={**TINY},
        output=str(tmp_path / "out"),
        experiment="w",
    )
    path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    train_subtyping.main(["--config", path, "--fold-nb", "0"])
    ckpt = str(tmp_path / "out" / "subtyping" / "w" / "model_best.msgpack")

    out_csv = str(tmp_path / "preds.csv")
    # no RNA csv needed for a wsi-only checkpoint
    predict(ckpt, "subtyping", cohort["feature_dir"], out_csv, batch_size=8)
    df = pd.read_csv(out_csv)
    assert len(df) > 0 and "prob_1" in df.columns

    # a slide present in two formats (X.npy + X.pt after convert_features)
    # must be scored once, not twice (predict shares list_feature_files'
    # dedupe with the datasets)
    import shutil

    from mirror_tpu.data.formats import load_feature_file, save_feature_file

    dup_dir = str(tmp_path / "dupfeats")
    os.makedirs(dup_dir)
    npys = sorted(f for f in os.listdir(cohort["feature_dir"])
                  if f.endswith(".npy"))[:3]
    for f in npys:
        shutil.copy(os.path.join(cohort["feature_dir"], f),
                    os.path.join(dup_dir, f))
    dup_sid = npys[0].split(".")[0]
    save_feature_file(
        os.path.join(dup_dir, dup_sid + ".pt"),
        np.asarray(load_feature_file(os.path.join(dup_dir, npys[0]))),
    )
    dup_csv = str(tmp_path / "dup_preds.csv")
    predict(ckpt, "subtyping", dup_dir, dup_csv, batch_size=4)
    dup_df = pd.read_csv(dup_csv)
    assert len(dup_df) == 3
    assert dup_df["slide_id"].is_unique

    # wsi-only + an RNA csv matching NO slide: the RNA-membership slide
    # filter is gated on wsi_only (the model never consumes RNA), so no
    # slide may be dropped — ungated this raised 'no usable feature files'
    bogus = str(tmp_path / "bogus_rna.csv")
    pd.DataFrame({"g1": [0.0]}, index=["TCGA-ZZ-9999-01A"]).to_csv(bogus)
    out2 = str(tmp_path / "preds2.csv")
    predict(ckpt, "subtyping", cohort["feature_dir"], out2,
            rna_feature_csv=bogus, batch_size=8)
    assert len(pd.read_csv(out2)) == len(df)
