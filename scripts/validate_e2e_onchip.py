"""On-chip end-to-end validation: every training CLI + predict, flagship dims.

The closing gate each round (round-3/5 memos in BASELINE.md): on the REAL
chip, against a synthetic cohort at flagship dims (2048x768 WSI tokens,
10234-d RNA, embed 768), run the full production config path —

  1. train_mirror     (pretrain, 2 epochs, B=8, local-negatives default)
  2. train_pretrain   (mirror_dual InfoNCE baseline, 1 epoch)
  3. train_subtyping  (fine-tune from the stage-1 checkpoint, 2 epochs)
  4. tools.predict    (--whole-slide: CP encoder over every patch)
  5. train_survival   (NLL, weighted sampler, 1 epoch)

and assert checkpoints, summary.csv, finite metrics, and the --result JSON
at every stage. Prints one summary JSON line. ~20-40 min wall (compiles
dominate). Run: python scripts/validate_e2e_onchip.py [--small]
(--small: tiny dims for a fast smoke on any backend).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml

FLAGSHIP_TOKENS = 2048
FLAGSHIP = dict(
    wsi_embed_dim=768, rna_embed_dim=10234, embed_dim=768,
    wsi_num_tokens=FLAGSHIP_TOKENS, rna_mlp_ratio=4.0, rna_norm_eps=1e-5,
    use_pallas=True, dtype="bfloat16",
)
TINY = dict(
    wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, wsi_num_tokens=16,
    rna_mlp_ratio=2.0, num_prototypes=24, style_mlp_hidden_dim=24,
    style_mlp_out_dim=16, style_latent_dim=8,
)


def cfg(root, name, **kw):
    path = os.path.join(root, f"{name}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(kw, f)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--keep", action="store_true",
                    help="keep the temp cohort/run dirs for inspection")
    args = ap.parse_args()

    from mirror_tpu.data import make_synthetic_cohort

    # cleaned up on success unless --keep: the flagship cohort + run
    # checkpoints are hundreds of MB and this is the per-round closing
    # gate — repeated runs would fill /tmp
    root = tempfile.mkdtemp(prefix="e2e_onchip_")
    mk = TINY if args.small else FLAGSHIP
    tokens = mk["wsi_num_tokens"]
    feat_dim = mk["wsi_embed_dim"]
    rna_dim = mk["rna_embed_dim"]
    c = make_synthetic_cohort(
        root, n_patients=16, feature_dim=feat_dim, rna_dim=rna_dim,
        min_tokens=tokens + 8, max_tokens=tokens + 64, num_folds=2, seed=9,
    )
    out_root = os.path.join(root, "runs")
    summary = {}

    def stage(name, fn):
        t0 = time.time()
        fn()
        summary[name] = round(time.time() - t0, 1)
        print(f"=== stage {name} OK in {summary[name]}s", flush=True)

    # 1. MIRROR pretrain
    import train_mirror

    pt_cfg = cfg(
        root, "pt", wsi_feature_dir=c["feature_dir"],
        rna_feature_csv=c["rna_csv"], split_dir=c["splits_dir"], k=2,
        num_wsi_feature_tokens=tokens, batch_size=8, epochs=2, lr=1e-4,
        val=True, output=out_root, experiment="e2e_pt", model_kwargs=mk,
    )

    def run_pretrain():
        res = train_mirror.main(["--config", pt_cfg, "--fold-nb", "0"])
        assert res["best_metric"] is not None and np.isfinite(res["best_metric"])
        summary["pretrain_best_loss"] = res["best_metric"]

    stage("train_mirror", run_pretrain)
    pt_dir = os.path.join(out_root, "pretrain", "e2e_pt")
    best_ckpt = os.path.join(pt_dir, "model_best.msgpack")
    assert os.path.exists(best_ckpt), os.listdir(pt_dir)
    assert os.path.exists(os.path.join(pt_dir, "summary.csv"))

    # 2. vanilla-CLIP pretrain (mirror_dual)
    import train_pretrain

    clip_cfg = cfg(
        root, "clip", wsi_feature_dir=c["feature_dir"],
        rna_feature_csv=c["rna_csv"], split_dir=c["splits_dir"], k=2,
        num_wsi_feature_tokens=tokens, batch_size=8, epochs=1, lr=1e-4,
        output=out_root, experiment="e2e_clip",
        model="mirror_dual", model_kwargs=mk,
    )

    def run_clip():
        res = train_pretrain.main(["--config", clip_cfg, "--fold-nb", "0"])
        assert res["best_metric"] is not None and np.isfinite(res["best_metric"])

    stage("train_pretrain", run_clip)

    # 3. subtyping fine-tune from the pretrain checkpoint
    import train_subtyping

    # create_model's registry already drops kwargs a model doesn't accept
    # (with a logged warning, mirror_tpu/registry.py::_filter) — pass the
    # pretrain kwargs straight through
    sub_kw = dict(mk)
    sub_cfg = cfg(
        root, "sub", wsi_feature_dir=c["subtype_feature_dir"],
        rna_feature_csv=c["rna_csv"], split_dir=c["splits_dir"], k=2,
        num_wsi_feature_tokens=tokens, batch_size=8, epochs=2, lr=1e-4,
        classes=c["classes"], output=out_root, experiment="e2e_sub",
        initial_checkpoint=best_ckpt, model="mirror_classifier",
        model_kwargs=sub_kw,
    )

    def run_sub():
        res = train_subtyping.main(["--config", sub_cfg, "--fold-nb", "0"])
        assert res["best_metric"] is not None and np.isfinite(res["best_metric"])
        summary["subtyping_best_acc"] = res["best_metric"]

    stage("train_subtyping", run_sub)
    sub_ckpt = os.path.join(out_root, "subtyping", "e2e_sub",
                            "model_best.msgpack")
    assert os.path.exists(sub_ckpt)

    # 4. whole-slide predict through the CP encoder
    from mirror_tpu.tools import predict as predict_mod

    pred_csv = os.path.join(root, "pred.csv")

    def run_predict():
        predict_mod.main([
            "--checkpoint", sub_ckpt, "--task", "subtyping",
            "--wsi-feature-dir",
            os.path.join(c["subtype_feature_dir"], c["classes"][0]),
            "--rna-feature-csv", c["rna_csv"],
            "--output", pred_csv, "--whole-slide",
        ])
        import pandas as pd

        df = pd.read_csv(pred_csv)
        assert len(df) > 0 and df.select_dtypes("number").notna().all().all()
        summary["predicted_slides"] = int(len(df))

    stage("predict_whole_slide", run_predict)

    # 5. survival
    import train_survival

    surv_cfg = cfg(
        root, "surv", wsi_feature_dir=c["feature_dir"],
        rna_feature_csv=c["rna_csv"], survival_csv=c["survival_csv"],
        split_dir=c["splits_dir"], k=2, num_wsi_feature_tokens=tokens,
        batch_size=8, epochs=1, lr=1e-4, weighted_sample=True,
        output=out_root, experiment="e2e_surv", model="mirror_classifier",
        model_kwargs=sub_kw,
    )

    def run_surv():
        res = train_survival.main(["--config", surv_cfg, "--fold-nb", "0"])
        assert res["best_metric"] is not None and np.isfinite(res["best_metric"])
        summary["survival_best_cindex"] = res["best_metric"]

    stage("train_survival", run_surv)

    import jax

    summary["backend"] = jax.default_backend()
    summary["dims"] = "tiny" if args.small else "flagship"
    print("E2E_VALIDATION " + json.dumps(summary))
    if not args.keep:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
