"""Full-workflow integration smoke: the reference README pipeline
(``/root/reference/README.md:33-43``) end-to-end on synthetic data —

  tiling -> feature generation -> MIRROR pretrain -> split_weights ->
  subtyping linear probe (full splits AND few-shot splits from
  gen_few_shot_files) -> survival fine-tune -> predict -> aggregate_results

— one chain through the real CLIs/entry points, asserting each artifact's
schema at every seam. Unit tests cover each stage in isolation
(test_tools.py, test_train_integration.py); this catches seam regressions
none of them see (file naming, ID truncation, payload keys, CSV columns).
"""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow

PATCH = 64  # tile size: tiny slides keep the ResNet stage fast on 1 core
TOKENS = 8  # num_wsi_feature_tokens everywhere (slides must have >= TOKENS
# patches or gen_few_shot's rejection sampler never terminates)
CLASSES = ["IDC", "ILC"]
N_PATIENTS = 16
RNA_DIM = 48

TINY = {
    "wsi_embed_dim": 1024,  # = TruncatedResNet50 feature dim
    "rna_embed_dim": RNA_DIM,
    "embed_dim": 48,
    "rna_mlp_ratio": 2.0,
}
TINY_PRETRAIN = {
    **TINY,
    "wsi_num_tokens": TOKENS,
    "num_prototypes": 16,
    "style_mlp_hidden_dim": 24,
    "style_mlp_out_dim": 16,
    "style_latent_dim": 8,
}


def _pid(i):
    return f"TCGA-WF-{i:04d}"


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return tmp_path_factory.mktemp("workflow")


def test_full_reference_workflow(root):
    import cv2
    import yaml

    import train_mirror
    import train_subtyping
    import train_survival
    from mirror_tpu.tools.gen_patch import process_slide
    from mirror_tpu.tools.gen_patch_feature import extract_features
    from mirror_tpu.tools.gen_splits import gen_splits
    from mirror_tpu.tools import gen_few_shot_files, predict, split_weights
    from mirror_tpu.tools.aggregate_results import aggregate
    from mirror_tpu.train.checkpoint import load_checkpoint_file

    rng = np.random.default_rng(0)
    patients = [_pid(i) for i in range(N_PATIENTS)]
    samples = [p + "-01" for p in patients]
    slides = [s + "Z-00-DX1" for s in samples]
    labels = np.array([i % 2 for i in range(N_PATIENTS)])

    # ---- stage 0: synthetic slides (class-colored tissue on white bg) ----
    slide_dir = root / "slides"
    slide_dir.mkdir(exist_ok=True)
    class_color = {0: (170, 80, 150), 1: (80, 160, 90)}
    for slide, lab in zip(slides, labels):
        img = np.full((192, 192, 3), 255, np.uint8)
        cv2.circle(img, (96, 96), 80, class_color[int(lab)], -1)
        # speckle so patches within a slide differ
        pts = rng.integers(10, 182, size=(40, 2))
        for x, y in pts:
            cv2.circle(img, (int(x), int(y)), 3,
                       tuple(int(v) for v in rng.integers(0, 255, 3)), -1)
        cv2.imwrite(str(slide_dir / f"{slide}.png"), img)

    # ---- stage 1: tiling ----
    patch_root = str(root / "patches")
    patch_counts = {}
    for slide in slides:
        n = process_slide(
            str(slide_dir / f"{slide}.png"), patch_root, patch_size=PATCH,
            blur_ksize=3, close_ksize=3, erode_ksize=3,
            area_small_holes=64, min_size_small_objects=64,
        )
        patch_counts[slide] = n
        assert n >= TOKENS, f"{slide}: only {n} patches"
        names = os.listdir(os.path.join(patch_root, slide))
        assert len(names) == n
        # {row}_{col}.jpeg coordinate naming (ref gen_patch.py:183-206)
        r, c = os.path.splitext(names[0])[0].split("_")
        int(r), int(c)

    # ---- stage 2: feature generation ----
    feat_dir = str(root / "features")
    stats = extract_features(
        patch_root, feat_dir, model_name="custom_resnet50",
        batch_size=8, num_threads=2, fmt="npy",
    )
    assert stats["patches"] == sum(patch_counts.values())
    for slide in slides:
        feats = np.load(os.path.join(feat_dir, f"{slide}.npy"))
        assert feats.shape == (patch_counts[slide], 1024)
        assert np.isfinite(feats).all()

    # class-layout copy for subtyping (the reference stores downstream
    # cohorts as {root}/{class}/{slide}.pt)
    subtype_dir = str(root / "features_by_class")
    for slide, lab in zip(slides, labels):
        cdir = os.path.join(subtype_dir, CLASSES[int(lab)])
        os.makedirs(cdir, exist_ok=True)
        src = np.load(os.path.join(feat_dir, f"{slide}.npy"))
        np.save(os.path.join(cdir, f"{slide}.npy"), src)

    # ---- stage 3: RNA csv + survival csv + splits ----
    rna = rng.normal(size=(N_PATIENTS, RNA_DIM)).astype(np.float32)
    rna[:, :2] += np.eye(2)[labels] * 2.0
    rna_csv = str(root / "rna.csv")
    pd.DataFrame(
        rna, index=samples, columns=[f"g{j}" for j in range(RNA_DIM)]
    ).to_csv(rna_csv)

    surv_csv = str(root / "surv.csv")
    months = rng.uniform(1.0, 120.0, N_PATIENTS).round(2)
    pd.DataFrame(
        {
            "Patient ID": patients,
            "Sample ID": samples,
            "Overall Survival (Months)": months,
            "Overall Survival Status": [
                "1:DECEASED" if i % 3 else "0:LIVING"
                for i in range(N_PATIENTS)
            ],
        }
    ).to_csv(surv_csv, index=False)

    splits_dir = str(root / "splits")
    gen_splits(feat_dir, splits_dir, k=2, seed=0)
    for fold in range(2):
        df = pd.read_csv(os.path.join(splits_dir, f"splits_{fold}.csv"))
        assert {"train", "val"} <= set(df.columns)
        assert df["train"].dropna().str.len().eq(12).all()

    # ---- stage 4: MIRROR pretrain ----
    out_root = str(root / "runs")

    def cfg(name, **kw):
        path = str(root / f"{name}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(kw, f)
        return path

    pt_cfg = cfg(
        "pretrain",
        wsi_feature_dir=feat_dir, rna_feature_csv=rna_csv,
        split_dir=splits_dir, k=2, num_wsi_feature_tokens=TOKENS,
        batch_size=8, epochs=2, lr=1e-4, amp=False,
        output=out_root, experiment="wf_pt", model_kwargs=TINY_PRETRAIN,
    )
    results = train_mirror.main(["--config", pt_cfg, "--fold-nb", "0"])
    assert results["best_metric"] is not None
    pt_dir = os.path.join(out_root, "pretrain", "wf_pt")
    best = glob.glob(os.path.join(pt_dir, "model_best*"))
    assert len(best) == 1
    assert os.path.exists(os.path.join(pt_dir, "summary.csv"))

    # ---- stage 5: split_weights ----
    split_dir_out = str(root / "split_ckpt")
    os.makedirs(split_dir_out, exist_ok=True)
    split_weights.split_weights(best[0], split_dir_out)
    wsi_ckpt = os.path.join(split_dir_out, "wsi_" + os.path.basename(best[0]))
    rna_ckpt = os.path.join(split_dir_out, "rna_" + os.path.basename(best[0]))
    for path, key in ((wsi_ckpt, "wsi_encoder"), (rna_ckpt, "rna_encoder")):
        payload = load_checkpoint_file(path)
        assert set(payload["state_dict"]) == {key}
        assert "mask_token" not in payload["state_dict"][key]
        assert payload["version"] >= 2

    # ---- stage 6: few-shot split files ----
    fs_root = str(root / "few_shot")
    import sys

    argv = [
        "--tasks", "subtyping", "--shots", "2", "--k", "2",
        "--num-wsi-feature-tokens", str(TOKENS),
        "--rna-feature-csv", rna_csv, "--split-dir", splits_dir,
        "--subtyping-wsi-feature-dir", subtype_dir,
        "--subtyping-classes", *CLASSES,
        "--class-name", "tcga_wf", "--output-dir", fs_root,
    ]
    old = sys.argv
    try:
        sys.argv = ["gen_few_shot_files.py"] + argv
        gen_few_shot_files.main()
    finally:
        sys.argv = old
    fs_split_dir = os.path.join(fs_root, "subtyping", "2foldcv", "2-shot",
                                "tcga_wf")
    for fold in range(2):
        df = pd.read_csv(os.path.join(fs_split_dir, f"splits_{fold}.csv"))
        # support set: 2 shots x 2 classes (with replacement -> <= 4 unique)
        assert 1 <= df["train"].dropna().nunique() <= 4
        assert df["val"].dropna().str.len().eq(12).all()

    # ---- stage 7: subtyping linear probe, full splits (both folds) ----
    sub_cfg = cfg(
        "subtyping",
        wsi_feature_dir=subtype_dir, rna_feature_csv=rna_csv,
        split_dir=splits_dir, k=2, classes=CLASSES, num_classes=2,
        num_wsi_feature_tokens=TOKENS, batch_size=8, epochs=1, lr=1e-2,
        amp=False, output=out_root, model="mirror_classifier",
        model_kwargs=TINY, wsi_feature_only=True, linear_probe=True,
    )
    for fold in range(2):
        r = train_subtyping.main(
            ["--config", sub_cfg, "--fold-nb", str(fold),
             "--experiment", f"wf_sub_fold_{fold}",
             "--initial-checkpoint", wsi_ckpt]
        )
        assert r["metric_name"] == "acc" and r["best_metric"] is not None

    # ---- stage 8: subtyping on the few-shot splits ----
    r = train_subtyping.main(
        ["--config", sub_cfg, "--fold-nb", "0",
         "--experiment", "wf_sub_fewshot",
         "--split-dir", fs_split_dir,
         "--initial-checkpoint", wsi_ckpt]
    )
    assert r["best_metric"] is not None

    # ---- stage 9: survival fine-tune (full ckpt, concat fusion) ----
    surv_cfg = cfg(
        "survival",
        wsi_feature_dir=feat_dir, rna_feature_csv=rna_csv,
        survival_csv=surv_csv, split_dir=splits_dir, k=2,
        num_bins=2, num_classes=2, num_wsi_feature_tokens=TOKENS,
        batch_size=8, epochs=1, lr=1e-3, amp=False, loss="nll_surv",
        output=out_root, experiment="wf_surv", model="mirror_classifier",
        model_kwargs={**TINY, "fusion": "concat"},
    )
    r = train_survival.main(
        ["--config", surv_cfg, "--fold-nb", "0",
         "--initial-checkpoint", best[0]]
    )
    assert r["metric_name"] == "c-index"

    # ---- stage 10: predict on both trained heads ----
    sub_best = glob.glob(
        os.path.join(out_root, "subtyping", "wf_sub_fold_0", "model_best*")
    )
    assert len(sub_best) == 1
    pred_csv = str(root / "pred_subtyping.csv")
    rows = predict.predict(
        sub_best[0], "subtyping", subtype_dir, pred_csv, batch_size=4,
    )
    df = pd.read_csv(pred_csv)
    assert set(df.columns) == {"slide_id", "pred", "prob_0", "prob_1"}
    assert len(df) == N_PATIENTS == len(rows)
    np.testing.assert_allclose(df["prob_0"] + df["prob_1"], 1.0, atol=1e-5)

    surv_best = glob.glob(
        os.path.join(out_root, "survival", "wf_surv", "model_best*")
    )
    assert len(surv_best) == 1
    pred_surv_csv = str(root / "pred_survival.csv")
    predict.predict(
        surv_best[0], "survival", feat_dir, pred_surv_csv,
        rna_feature_csv=rna_csv, batch_size=4,
    )
    df = pd.read_csv(pred_surv_csv)
    assert set(df.columns) == {"slide_id", "risk"}
    assert np.isfinite(df["risk"]).all()

    # ---- stage 11: aggregate_results over the subtyping folds ----
    agg = aggregate(os.path.join(out_root, "subtyping"), "acc")
    grp = [g for g in agg if "wf_sub_fold*" in g]
    assert grp, f"fold group missing from {list(agg)}"
    acc = agg[grp[0]]["acc"]
    assert len(acc["folds"]) == 2
    assert np.isfinite(acc["mean"]) and np.isfinite(acc["std"])
    json.dumps(agg)  # the CLI's --json output path must serialize
