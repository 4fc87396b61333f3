"""Direct goldens for the data-prep TOOLS against the imported reference.

Companion to test_reference_oracle.py (losses/datasets/resnet): the
reference's gen_splits / gen_few_shot_files / split_weights /
distill_rna_feature also run here once ``timm.utils`` is stubbed (they only
use setup_default_logging / random_seed), so these execute the reference
scripts themselves on synthetic fixtures and compare our tools:

- gen_splits: byte-level fold parity in the 1-slide-per-patient sorted
  case, plus the PINNED reference defect our version fixes (folding over
  raw listdir filenames leaks multi-slide patients across train/val)
- gen_few_shot_files: identical query sets; support sets structurally
  equal (per-label shot counts from the right fold) — the RNG streams
  diverge by construction (the reference rejection-samples, we pre-filter:
  same distribution, different draw count)
- split_weights: the same tensors kept/dropped (mask tokens out,
  wsi_/rna_ prefix split) across the two checkpoint formats
- distill_rna_feature: on a planted-signal cohort both pipelines keep the
  informative transcripts and the COSMIC-mapped set
"""

import argparse
import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest
import torch

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture()
def timm_stub(monkeypatch):
    import random

    def _seed(seed=42, rank=0):
        random.seed(seed + rank)
        np.random.seed(seed + rank)
        torch.manual_seed(seed + rank)

    t = types.ModuleType("timm")
    t.__spec__ = importlib.machinery.ModuleSpec("timm", loader=None)
    u = types.ModuleType("timm.utils")
    u.__spec__ = importlib.machinery.ModuleSpec("timm.utils", loader=None)
    u.setup_default_logging = lambda *a, **k: None
    u.random_seed = _seed
    t.utils = u
    monkeypatch.setitem(sys.modules, "timm", t)
    monkeypatch.setitem(sys.modules, "timm.utils", u)
    return t


def _load_ref_tool(name, extra_modules=None):
    """Import a reference tool fresh (argparse module state is per-import).

    extra_modules entries are RESTORED after the exec: leaving e.g. a
    two-attribute 'datasets' stub in sys.modules would shadow HF `datasets`
    for every later test in the session (the exact hazard CLAUDE.md warns
    about, inverted)."""
    saved = {}
    for mod, val in (extra_modules or {}).items():
        saved[mod] = sys.modules.get(mod)
        sys.modules[mod] = val
    modname = f"reftool_{name}"
    sys.modules.pop(modname, None)
    try:
        spec = importlib.util.spec_from_file_location(
            modname, os.path.join(REF, "tools", f"{name}.py")
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[modname] = m
        spec.loader.exec_module(m)
    finally:
        for mod, prev in saved.items():
            if prev is None:
                sys.modules.pop(mod, None)
            else:
                sys.modules[mod] = prev
    return m


def _slide(i, slide_nb=0):
    import string

    letters = string.ascii_uppercase
    site = letters[(i // 26) % 26] + letters[i % 26]
    return f"TCGA-{site}-{i:04d}-01Z-00-DX{slide_nb + 1}"


# ---------------------------------------------------------------------------
# gen_splits
# ---------------------------------------------------------------------------


def test_gen_splits_matches_reference_single_slide(tmp_path, timm_stub, monkeypatch):
    from mirror_tpu.tools.gen_splits import gen_splits

    feat = tmp_path / "features"
    feat.mkdir()
    for i in range(11):
        (feat / f"{_slide(i)}.pt").touch()

    # pin listdir order (the reference folds over raw directory order,
    # which the OS does not define; our tool sorts internally)
    real_listdir = os.listdir
    monkeypatch.setattr(
        os, "listdir", lambda p: sorted(real_listdir(p))
    )

    ref = _load_ref_tool("gen_splits")
    ref_out = tmp_path / "ref_out"
    monkeypatch.setattr(sys, "argv", [
        "gen_splits.py", "--root", str(feat), "--class-name", "tcga_test",
        "--output-dir", str(ref_out), "--n-splits", "5", "--random-seed", "42",
    ])
    ref.main()

    my_out = tmp_path / "my_out"
    gen_splits(str(feat), str(my_out), k=5, seed=42)

    for fold in range(5):
        r = pd.read_csv(ref_out / "tcga_test" / f"splits_{fold}.csv",
                        index_col=0)
        m = pd.read_csv(my_out / f"splits_{fold}.csv", index_col=0)
        for col in ("train", "val"):
            assert r[col].dropna().tolist() == m[col].dropna().tolist(), (
                fold, col,
            )


def test_gen_splits_reference_leaks_multislide_patients(
    tmp_path, timm_stub, monkeypatch
):
    """PINNED reference defect (gen_splits.py:62-64 folds over FILES): a
    patient with 2 slides can appear in train AND val of one fold. Our tool
    folds over unique patients and never leaks."""
    from mirror_tpu.tools.gen_splits import gen_splits

    feat = tmp_path / "features"
    feat.mkdir()
    for i in range(10):
        for s in range(2):
            (feat / f"{_slide(i, s)}.pt").touch()

    real_listdir = os.listdir
    monkeypatch.setattr(os, "listdir", lambda p: sorted(real_listdir(p)))
    ref = _load_ref_tool("gen_splits")
    ref_out = tmp_path / "ref_out"
    monkeypatch.setattr(sys, "argv", [
        "gen_splits.py", "--root", str(feat), "--class-name", "c",
        "--output-dir", str(ref_out), "--n-splits", "5", "--random-seed", "42",
    ])
    ref.main()
    leaked = 0
    for fold in range(5):
        df = pd.read_csv(ref_out / "c" / f"splits_{fold}.csv", index_col=0)
        leaked += len(
            set(df["train"].dropna()) & set(df["val"].dropna())
        )
    assert leaked > 0, (
        "fixture no longer demonstrates the reference's split leakage"
    )

    my_out = tmp_path / "my_out"
    gen_splits(str(feat), str(my_out), k=5, seed=42)
    for fold in range(5):
        df = pd.read_csv(my_out / f"splits_{fold}.csv", index_col=0)
        assert not set(df["train"].dropna()) & set(df["val"].dropna())


# ---------------------------------------------------------------------------
# gen_few_shot_files
# ---------------------------------------------------------------------------


def _ref_datasets_pkg():
    """The reference 'datasets' package by file path (the installed HF
    'datasets' would otherwise shadow it for the tool's import)."""
    pkg = types.ModuleType("datasets")
    pkg.__spec__ = importlib.machinery.ModuleSpec("datasets", loader=None)
    for fname, cls in (
        ("dataset_subtyping", "TCGAWSIRNASubtypingDataset"),
        ("dataset_survival", "TCGAWSIRNASurvivalDataset"),
    ):
        spec = importlib.util.spec_from_file_location(
            f"refds_{fname}", os.path.join(REF, "datasets", f"{fname}.py")
        )
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        setattr(pkg, cls, getattr(m, cls))
    return pkg


@pytest.fixture(scope="module")
def fewshot_cohort(tmp_path_factory):
    from mirror_tpu.data import make_synthetic_cohort

    root = tmp_path_factory.mktemp("fewshot")
    c = make_synthetic_cohort(
        str(root), n_patients=20, feature_dim=16, rna_dim=32, fmt="pt",
        min_tokens=20, max_tokens=40, num_folds=3, seed=13,
    )
    return c


def test_gen_few_shot_vs_reference(fewshot_cohort, tmp_path, timm_stub,
                                   monkeypatch):
    c = fewshot_cohort
    ref = _load_ref_tool(
        "gen_few_shot_files", extra_modules={"datasets": _ref_datasets_pkg()}
    )
    ref_out = tmp_path / "ref_out"
    monkeypatch.setattr(sys, "argv", [
        "gen_few_shot_files.py", "--class-name", "tcga_test",
        "--survival-wsi-feature-dir", c["feature_dir"],
        "--subtyping-wsi-feature-dir", c["subtype_feature_dir"],
        "--rna-feature-csv", c["rna_csv"],
        "--survival-csv", c["survival_csv"],
        "--split-dir", c["splits_dir"],
        "--num-wsi-feature-tokens", "16", "--num-bins", "2",
        "--subtyping-classes", *c["classes"],
        "--tasks", "survival", "subtyping",
        "--seed", "42", "--shots", "3", "--k", "3",
        "--output-dir", str(ref_out),
    ])
    ref.main()

    my_out = tmp_path / "my_out"
    from mirror_tpu.tools import gen_few_shot_files as mine

    monkeypatch.setattr(sys, "argv", [
        "gen_few_shot_files.py", "--class-name", "tcga_test",
        "--survival-wsi-feature-dir", c["feature_dir"],
        "--subtyping-wsi-feature-dir", c["subtype_feature_dir"],
        "--rna-feature-csv", c["rna_csv"],
        "--survival-csv", c["survival_csv"],
        "--split-dir", c["splits_dir"],
        "--num-wsi-feature-tokens", "16", "--num-bins", "2",
        "--subtyping-classes", *c["classes"],
        "--tasks", "survival", "subtyping",
        "--seed", "42", "--shots", "3", "--k", "3",
        "--output-dir", str(my_out),
    ])
    mine.main()

    for task in ("survival", "subtyping"):
        for fold in range(3):
            rel = os.path.join(task, "3foldcv", "3-shot", "tcga_test",
                               f"splits_{fold}.csv")
            r = pd.read_csv(ref_out / rel, index_col=0)
            m = pd.read_csv(my_out / rel, index_col=0)
            # query set: deterministic (the fold's val patients) => equal
            assert sorted(r["val"].dropna()) == sorted(m["val"].dropna()), (
                task, fold,
            )
            # support: same size, both subsets of the fold's train patients
            rt, mt = r["train"].dropna(), m["train"].dropna()
            assert len(rt) == len(mt)
            train_patients = set(
                pd.read_csv(
                    os.path.join(c["splits_dir"], f"splits_{fold}.csv")
                )["train"].dropna()
            )
            assert set(rt) <= train_patients
            assert set(mt) <= train_patients


# ---------------------------------------------------------------------------
# split_weights
# ---------------------------------------------------------------------------


def test_split_weights_vs_reference(tmp_path, timm_stub):
    from mirror_tpu.tools.split_weights import split_weights
    from mirror_tpu.train.checkpoint import (
        load_checkpoint_file, save_checkpoint_file,
    )

    rng = np.random.default_rng(0)
    flat = {
        "wsi_encoder.layer1.weight": rng.normal(size=(4, 4)),
        "wsi_encoder.mask_token": rng.normal(size=(1, 1, 4)),
        "rna_encoder.blocks.0.w": rng.normal(size=(3,)),
        "rna_encoder.mask_token": rng.normal(size=(1, 1)),
        "logit_scale": np.float64(2.0),
        "prototypes.weight": rng.normal(size=(5, 4)),
    }

    # --- reference path: torch checkpoint in a timestamped fold dir
    run = tmp_path / "ref_runs" / "20260101-000000-mirror-fold0"
    run.mkdir(parents=True)
    torch.save(
        {
            "epoch": 7, "arch": "mirror", "version": 2, "args": "ns",
            "metric": 0.5,
            "state_dict": {k: torch.tensor(v) for k, v in flat.items()},
        },
        run / "last.pth.tar",
    )
    ref = _load_ref_tool("split_weights")
    ref.main(argparse.Namespace(
        result_dir=str(tmp_path / "ref_runs"), k=1, weight_file="last.pth.tar"
    ))
    ref_wsi = torch.load(run / "wsi_last.pth.tar", weights_only=False)
    ref_rna = torch.load(run / "rna_last.pth.tar", weights_only=False)
    # the reference strips the prefix and drops mask tokens
    assert set(ref_wsi["state_dict"]) == {"layer1.weight"}
    assert set(ref_rna["state_dict"]) == {"blocks.0.w"}
    assert ref_wsi["epoch"] == 7 and ref_rna["metric"] == 0.5

    # --- our path: the same params in our nested-msgpack format
    my_ckpt = tmp_path / "last.msgpack"
    save_checkpoint_file(str(my_ckpt), {
        "epoch": 7, "arch": "mirror", "version": 2, "args": "ns",
        "metric": 0.5, "ema_state_dict": {}, "opt_state": None,
        "state_dict": {
            "wsi_encoder": {
                "layer1": {"weight": flat["wsi_encoder.layer1.weight"]},
                "mask_token": flat["wsi_encoder.mask_token"],
            },
            "rna_encoder": {
                "blocks_0": {"w": flat["rna_encoder.blocks.0.w"]},
                "mask_token": flat["rna_encoder.mask_token"],
            },
            "logit_scale": flat["logit_scale"],
            "prototypes": {"weight": flat["prototypes.weight"]},
        },
    })
    split_weights(str(my_ckpt))
    my_wsi = load_checkpoint_file(str(tmp_path / "wsi_last.msgpack"))
    my_rna = load_checkpoint_file(str(tmp_path / "rna_last.msgpack"))
    # same tensors kept/dropped (mask tokens out), same payload keys
    np.testing.assert_array_equal(
        np.asarray(my_wsi["state_dict"]["wsi_encoder"]["layer1"]["weight"]),
        ref_wsi["state_dict"]["layer1.weight"].numpy(),
    )
    assert "mask_token" not in my_wsi["state_dict"]["wsi_encoder"]
    np.testing.assert_array_equal(
        np.asarray(my_rna["state_dict"]["rna_encoder"]["blocks_0"]["w"]),
        ref_rna["state_dict"]["blocks.0.w"].numpy(),
    )
    assert "mask_token" not in my_rna["state_dict"]["rna_encoder"]
    assert my_wsi["epoch"] == 7 and my_rna["metric"] == 0.5


# ---------------------------------------------------------------------------
# distill_rna_feature
# ---------------------------------------------------------------------------


def test_distill_rna_vs_reference_planted_signal(tmp_path, timm_stub,
                                                 monkeypatch):
    """Planted-signal oracle: 6 transcripts carry the class signal, 4 map to
    COSMIC genes. Both the reference pipeline (executed) and ours must keep
    the COSMIC-mapped set and at least half the informative transcripts.
    Bit-parity is not expected: we deliberately stratify the train split and
    shuffle the CV folds (the reference's unshuffled StratifiedKFold(5) on a
    listdir-ordered cohort is order-dependent)."""
    rng = np.random.default_rng(7)
    n, t = 60, 25
    samples = [f"{_slide(i)[:15]}" for i in range(n)]
    labels = np.array([i % 2 for i in range(n)])
    expr = rng.normal(size=(t, n))
    informative = [f"ENST{j:08d}" for j in range(6)]
    all_tx = informative + [f"ENST{j:08d}" for j in range(6, t)]
    for j in range(6):
        expr[j] += labels * 4.0  # strong class signal
    expr_df = pd.DataFrame(expr, index=all_tx, columns=samples)

    root = tmp_path / "raw"
    (root / "cohortX").mkdir(parents=True)
    expr_df.to_parquet(root / "rna.parquet")

    # probemap: transcripts 2..5 map to COSMIC genes, others to junk genes
    cosmic_genes = ["BRCA1", "TP53"]
    probemap = pd.DataFrame({
        "id": all_tx,
        "gene": [cosmic_genes[j % 2] if 2 <= j < 6 else f"G{j}"
                 for j in range(t)],
    })
    probemap.to_csv(root / "probemap.tsv", sep="\t", index=False)
    pd.DataFrame({"Gene Symbol": cosmic_genes}).to_csv(
        root / "cohortX" / "cosmic.csv", index=False
    )
    cosmic_tx = {all_tx[j] for j in range(2, 6)}

    # class-dir layout (the reference only LISTS these; contents unused)
    wsi_root = tmp_path / "wsi"
    for cls in ("clsA", "clsB"):
        (wsi_root / cls).mkdir(parents=True)
    for i, s in enumerate(samples):
        cls = "clsA" if labels[i] == 0 else "clsB"
        (wsi_root / cls / f"{s}Z-00-DX1.pt").touch()

    ref = _load_ref_tool("distill_rna_feature")
    monkeypatch.setattr(sys, "argv", [
        "distill_rna_feature.py", "--root", str(root), "--cohort", "cohortX",
        "--rna-file", "rna.parquet", "--transcript-id-map", "probemap.tsv",
        "--cosmic-genes", "cosmic.csv", "--wsi-feature-root", str(wsi_root),
        "--classes", "clsA", "clsB",
        "--output", str(tmp_path / "ref_out"), "--seed", "42",
    ])
    ref.main()
    ref_pruned = pd.read_csv(
        tmp_path / "ref_out" / "cohortX_pruned_rna.csv", index_col=0
    )
    assert cosmic_tx <= set(ref_pruned.columns)
    assert len(set(informative) & set(ref_pruned.columns)) >= 3
    assert set(ref_pruned.index) == set(samples)

    # ours on the same fixture (labels via CSV, our interface)
    labels_csv = tmp_path / "labels.csv"
    pd.DataFrame({
        "Sample ID": samples,
        "cls": ["clsA" if l == 0 else "clsB" for l in labels],
    }).to_csv(labels_csv, index=False)
    from mirror_tpu.tools.distill_rna_feature import distill

    # our wsi filter takes one flat dir — materialize all slides in one
    wsi_all = tmp_path / "wsi_all"
    wsi_all.mkdir()
    for i, s in enumerate(samples):
        (wsi_all / f"{s}Z-00-DX1.pt").touch()
    my_out = tmp_path / "my_pruned.csv"
    distill(
        str(root / "rna.parquet"), str(wsi_all),
        str(root / "cohortX" / "cosmic.csv"), str(root / "probemap.tsv"),
        str(labels_csv), "cls", str(my_out), seed=42,
    )
    mine = pd.read_csv(my_out, index_col=0)
    assert cosmic_tx <= set(mine.columns)
    assert len(set(informative) & set(mine.columns)) >= 3
