"""Direct goldens against the ACTUAL reference implementation.

Every other golden in this suite is a same-author transcription
(tests/oracle_torch.py, the "naive" re-implementations in test_losses.py) — a
shared misreading of the reference would pass all of them. These tests import
the reference's own modules (they run under the installed torch-cpu/pandas;
verified: losses/*, datasets/*, utils/loader.py, and resnet_custom.py need
nothing that is missing here) and compare our JAX implementations against the
code itself:

- all 4 loss modules     (ref: losses/{mirror_loss,info_nce,nll_surv,
                          cross_entropy_surv}.py)
- all 3 datasets         (ref: datasets/dataset_{pretrain,subtyping,
                          survival}.py) on a synthetic cohort, including the
                          survival discretization and per-item tensors
- the weighted sampler   (ref: utils/loader.py) — multiset-equal weights;
                          the per-index alignment fix is a documented diff
- TruncatedResNet50      (ref: tools/feature_generation/feature_models/
                          resnet_custom.py) with random weights + random BN
                          running stats through our weight converter

Reference modules are loaded by file path (importlib) so nothing from
/root/reference lands on sys.path and no package __init__ (which would pull
timm) executes.
"""

import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _load_ref(relpath):
    """Import a reference module directly from its file, no packages."""
    name = "refmod_" + relpath.replace("/", "_").replace(".py", "")
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def _mirror_inputs(seed=0, b=8, t=16, d=32, g=96, p=24, z=8):
    rng = np.random.default_rng(seed)
    f32 = lambda *s: rng.normal(size=s).astype(np.float32)
    mask = lambda *s: (rng.uniform(size=s) > 0.5).astype(np.float32)
    return dict(
        wsi_alignment_emb=f32(b, d),
        wsi_retention_emb=f32(b, t, d),
        wsi_retention_target=f32(b, t, d),
        wsi_mask=mask(b, t),
        wsi_score=f32(b, p),
        wsi_mu=f32(b, z),
        wsi_logstd=0.1 * f32(b, z),
        rna_alignment_emb=f32(b, d),
        rna_retention_emb=f32(b, g),
        rna_retention_target=f32(b, g),
        rna_mask=mask(b, g),
        rna_score=f32(b, p),
        rna_mu=f32(b, z),
        rna_logstd=0.1 * f32(b, z),
        logit_scale=np.float32(np.exp(rng.normal())),
    )


def test_clip_loss_vs_reference():
    from mirror_tpu.losses import clip_loss

    ref = _load_ref("losses/mirror_loss.py")
    rng = np.random.default_rng(1)
    for b, d in ((4, 16), (16, 64), (1, 8)):
        w = rng.normal(size=(b, d)).astype(np.float32)
        r = rng.normal(size=(b, d)).astype(np.float32)
        scale = np.float32(np.exp(rng.normal()))
        want = ref.ClipLoss()(_t(w), _t(r), _t(scale)).item()
        got = float(clip_loss(jnp.asarray(w), jnp.asarray(r), scale))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "weights", [(0.5, 0.1, 0.1, 0.1, 0.2), (0.5, 0.15, 0.15, 0.1, 0.1)],
    ids=["class-defaults", "shipped-config"],
)
def test_mirror_loss_six_terms_vs_reference(weights):
    from mirror_tpu.losses import MirrorLossWeights, mirror_loss

    ref = _load_ref("losses/mirror_loss.py")
    a, wr, rr, s, c = weights
    ref_loss = ref.MIRRORLoss(
        alignment_loss_weight=a, wsi_retention_loss_weight=wr,
        rna_retention_loss_weight=rr, style_loss_weight=s,
        cluster_loss_weight=c,
    )
    for seed in (0, 7):
        kw = _mirror_inputs(seed)
        want = ref_loss(*[_t(v) for v in kw.values()])
        got = mirror_loss(
            *[jnp.asarray(v) for v in kw.values()],
            weights=MirrorLossWeights(a, wr, rr, s, c),
        )
        assert len(want) == len(got) == 6
        for name, w_, g_ in zip(
            ["total", "align", "wsi_ret", "rna_ret", "style", "cluster"],
            want, got,
        ):
            np.testing.assert_allclose(
                float(g_), w_.item(), rtol=2e-5, atol=1e-6, err_msg=name
            )


@pytest.mark.parametrize("symmetric", [False, True])
def test_info_nce_in_batch_vs_reference(symmetric):
    from mirror_tpu.losses import info_nce

    ref = _load_ref("losses/info_nce.py")
    rng = np.random.default_rng(2)
    q = rng.normal(size=(12, 24)).astype(np.float32)
    pk = rng.normal(size=(12, 24)).astype(np.float32)
    for temp in (0.1, 0.07):
        want = ref.InfoNCE(temperature=temp, symmetric=symmetric)(
            _t(q), _t(pk)
        ).item()
        got = float(info_nce(
            jnp.asarray(q), jnp.asarray(pk),
            temperature=temp, symmetric=symmetric,
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["unpaired", "paired"])
@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_info_nce_explicit_negatives_vs_reference(mode, reduction):
    """The reference's explicit-negatives path is DEAD CODE: in the
    ``negative_keys is not None`` branch ``loss`` is never assigned
    (losses/info_nce.py:126-166 builds logits/labels but only the in-batch
    ``else`` branch computes cross entropy), so it raises UnboundLocalError
    on every call. Pinned here so a silently-fixed upstream flips this test.
    Our implementation completes the obviously-intended math; the oracle is
    torch's own F.cross_entropy on the logits the reference constructs."""
    import torch.nn.functional as F

    from mirror_tpu.losses import info_nce

    ref = _load_ref("losses/info_nce.py")
    rng = np.random.default_rng(3)
    n, m, d = 6, 9, 16
    temp = 0.1
    q = rng.normal(size=(n, d)).astype(np.float32)
    pk = rng.normal(size=(n, d)).astype(np.float32)
    neg = rng.normal(
        size=(m, d) if mode == "unpaired" else (n, m, d)
    ).astype(np.float32)
    with pytest.raises(UnboundLocalError):
        ref.InfoNCE(reduction=reduction, negative_mode=mode)(
            _t(q), _t(pk), _t(neg)
        )
    # intended semantics, straight from the reference's logit construction
    # (losses/info_nce.py:126-143) finished with torch cross entropy
    qn = F.normalize(_t(q), dim=-1)
    pn = F.normalize(_t(pk), dim=-1)
    nn_ = F.normalize(_t(neg), dim=-1)
    pos = torch.sum(qn * pn, dim=1, keepdim=True)
    if mode == "unpaired":
        negl = qn @ nn_.T
    else:
        negl = (qn.unsqueeze(1) @ nn_.transpose(-2, -1)).squeeze(1)
    logits = torch.cat([pos, negl], dim=1)
    labels = torch.zeros(n, dtype=torch.long)
    want = F.cross_entropy(logits / temp, labels, reduction=reduction)
    got = info_nce(
        jnp.asarray(q), jnp.asarray(pk), jnp.asarray(neg),
        temperature=temp, reduction=reduction, negative_mode=mode,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6
    )


def _surv_cases():
    rng = np.random.default_rng(4)
    n, m = 10, 4
    logits = (3.0 * rng.normal(size=(n, m))).astype(np.float32)
    cases = {
        "mixed": (logits, rng.integers(0, m, size=n), rng.integers(0, 2, size=n)),
        "all-censored": (logits, rng.integers(0, m, size=n), np.zeros(n, np.int64)),
        "all-events": (logits, rng.integers(0, m, size=n), np.ones(n, np.int64)),
        "boundary-bins": (
            logits,
            np.array([0, m - 1] * (n // 2)),
            rng.integers(0, 2, size=n),
        ),
    }
    return cases.items()


@pytest.mark.parametrize("case,arrs", list(_surv_cases()))
@pytest.mark.parametrize("alpha", [0.0, 0.5])
@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_nll_surv_vs_reference(case, arrs, alpha, reduction):
    from mirror_tpu.losses import nll_surv_loss

    ref = _load_ref("losses/nll_surv.py")
    logits, times, cens = arrs
    want = ref.NLLSurvLoss(alpha=alpha, reduction=reduction)(
        _t(logits), _t(times), _t(cens)
    )
    got = nll_surv_loss(
        jnp.asarray(logits), jnp.asarray(times), jnp.asarray(cens),
        alpha=alpha, reduction=reduction,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6, err_msg=case
    )


@pytest.mark.parametrize("case,arrs", list(_surv_cases()))
@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_ce_surv_vs_reference(case, arrs, reduction):
    from mirror_tpu.losses import ce_surv_loss

    ref = _load_ref("losses/cross_entropy_surv.py")
    logits, times, cens = arrs
    want = ref.CrossEntropySurvLoss(reduction=reduction)(
        _t(logits), _t(times), _t(cens)
    )
    got = ce_surv_loss(
        jnp.asarray(logits), jnp.asarray(times), jnp.asarray(cens),
        reduction=reduction,
    )
    # reduction='none': the reference returns [N, 1] (its gather keeps the
    # unsqueezed dim, cross_entropy_surv.py:96-97); we return [N]
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().reshape(-1) if reduction == "none"
        else want.numpy(), rtol=1e-5, atol=1e-6, err_msg=case,
    )


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    from mirror_tpu.data import make_synthetic_cohort

    root = tmp_path_factory.mktemp("ref_oracle_cohort")
    # .pt features: the reference torch.loads; our formats layer reads both
    return make_synthetic_cohort(
        str(root), n_patients=16, feature_dim=24, rna_dim=48, fmt="pt",
        min_tokens=20, max_tokens=60, seed=11,
    )


def test_pretrain_dataset_vs_reference(cohort):
    from mirror_tpu.data import PretrainDataset

    ref = _load_ref("datasets/dataset_pretrain.py")
    for fold in (0, 3):
        r = ref.TCGAWSIRNAPretrainDataset(
            cohort["feature_dir"], cohort["rna_csv"],
            num_wsi_feature_tokens=32, splits=cohort["splits_dir"],
        ).update_fold_nb(fold)
        m = PretrainDataset(
            cohort["feature_dir"], cohort["rna_csv"],
            num_wsi_feature_tokens=32, splits=cohort["splits_dir"],
        ).update_fold_nb(fold)
        assert set(r.train_feature_ids) == set(m.train_feature_ids)
        assert set(r.val_feature_ids) == set(m.val_feature_ids)

    # per-item: same np.random stream => identical sampled rows + RNA
    r.train()
    m.train()
    order = {s: i for i, s in enumerate(m.used_feature_ids)}
    for ridx, slide in enumerate(r.used_feature_ids):
        np.random.seed(100 + ridx)
        wsi_ref, rna_ref = r[ridx]
        np.random.seed(100 + ridx)
        item = m[order[slide]]
        np.testing.assert_array_equal(item["wsi"], wsi_ref.numpy())
        np.testing.assert_allclose(
            item["rna"], rna_ref.numpy(), rtol=1e-6, atol=0
        )


def test_subtyping_dataset_vs_reference(cohort):
    from mirror_tpu.data import SubtypingDataset

    ref = _load_ref("datasets/dataset_subtyping.py")
    r = ref.TCGAWSIRNASubtypingDataset(
        cohort["subtype_feature_dir"], cohort["rna_csv"], cohort["classes"],
        num_wsi_feature_tokens=16, splits=cohort["splits_dir"],
    )
    m = SubtypingDataset(
        cohort["subtype_feature_dir"], cohort["rna_csv"], cohort["classes"],
        num_wsi_feature_tokens=16, splits=cohort["splits_dir"],
    )
    assert r.class_label == m.class_label
    assert r.class_dict == m.class_dict
    for fold in range(2):
        r.update_fold_nb(fold)
        m.update_fold_nb(fold)
        assert set(r.train_feature_ids) == set(m.train_feature_ids)
        assert set(r.val_feature_ids) == set(m.val_feature_ids)
    r.val()
    m.val()
    order = {s: i for i, s in enumerate(m.used_feature_ids)}
    for ridx, slide in enumerate(r.used_feature_ids):
        np.random.seed(50 + ridx)
        wsi_ref, rna_ref, label_ref = r[ridx]
        np.random.seed(50 + ridx)
        item = m[order[slide]]
        np.testing.assert_array_equal(item["wsi"], wsi_ref.numpy())
        np.testing.assert_allclose(item["rna"], rna_ref.numpy(), rtol=1e-6)
        assert int(item["label"]) == int(label_ref)


def _ref_survival(cohort, **kw):
    ref = _load_ref("datasets/dataset_survival.py")
    return ref.TCGAWSIRNASurvivalDataset(
        cohort["feature_dir"], cohort["rna_csv"], cohort["survival_csv"],
        num_wsi_feature_tokens=16, splits=cohort["splits_dir"], **kw
    )


def _my_survival(cohort, **kw):
    from mirror_tpu.data import SurvivalDataset

    return SurvivalDataset(
        cohort["feature_dir"], cohort["rna_csv"], cohort["survival_csv"],
        num_wsi_feature_tokens=16, splits=cohort["splits_dir"], **kw
    )


def test_survival_discretization_vs_reference(cohort):
    r = _ref_survival(cohort)
    m = _my_survival(cohort)
    assert r.num_classes == m.num_classes
    # compare the full merged table keyed by Sample ID (row order differs
    # only by the WSI listdir order, which neither table depends on)
    rt = r.survival_data.set_index("Sample ID").sort_index()
    mt = m.survival_data.set_index("Sample ID").sort_index()
    assert list(rt.index) == list(mt.index)
    for col in ("disc_label", "censorship", "label"):
        np.testing.assert_array_equal(
            rt[col].to_numpy(), mt[col].to_numpy(), err_msg=col
        )
    np.testing.assert_allclose(
        rt["Overall Survival (Months)"].to_numpy(),
        mt["Overall Survival (Months)"].to_numpy(),
    )


def test_survival_all_censored_falls_back_to_linear_bins(cohort, tmp_path):
    # with zero "1:DECEASED" rows the reference switches from qcut over
    # events to plain pd.cut over everyone (dataset_survival.py:187-195)
    surv = pd.read_csv(cohort["survival_csv"])
    surv["Overall Survival Status"] = "0:LIVING"
    csv = str(tmp_path / "all_censored.csv")
    surv.to_csv(csv, index=False)
    cohort2 = dict(cohort, survival_csv=csv)
    r = _ref_survival(cohort2)
    m = _my_survival(cohort2)
    assert r.num_classes == m.num_classes
    rt = r.survival_data.set_index("Sample ID").sort_index()
    mt = m.survival_data.set_index("Sample ID").sort_index()
    for col in ("disc_label", "censorship", "label"):
        np.testing.assert_array_equal(
            rt[col].to_numpy(), mt[col].to_numpy(), err_msg=col
        )


def test_survival_items_and_folds_vs_reference(cohort):
    r = _ref_survival(cohort)
    m = _my_survival(cohort)
    for fold in (0, 2):
        r.update_fold_nb(fold)
        m.update_fold_nb(fold)
        assert set(r.train_feature_ids) == set(m.train_feature_ids)
        assert set(r.val_feature_ids) == set(m.val_feature_ids)
    r.train()
    m.train()
    order = {s: i for i, s in enumerate(m.used_feature_ids)}
    for ridx, slide in enumerate(r.used_feature_ids):
        np.random.seed(ridx)
        wsi_ref, rna_ref, label_ref, time_ref, c_ref = r[ridx]
        np.random.seed(ridx)
        item = m[order[slide]]
        np.testing.assert_array_equal(item["wsi"], wsi_ref.numpy())
        np.testing.assert_allclose(item["rna"], rna_ref.numpy(), rtol=1e-6)
        assert int(item["label"]) == int(label_ref.item())
        assert int(item["censorship"]) == int(c_ref.item())
        np.testing.assert_allclose(
            float(item["event_time"]), float(time_ref.item()), rtol=1e-6
        )


def test_survival_splits_none_crashes_in_reference(cohort):
    """The reference survival dataset cannot be constructed without splits:
    __init__ unconditionally calls train() (dataset_survival.py:93) which
    reads self.train_feature_ids (line 255) — only ever assigned under
    ``splits is not None`` (lines 86-90). Ours supports splits=None like the
    other two datasets. Pinned so an upstream fix is noticed."""
    from mirror_tpu.data import SurvivalDataset

    ref_ds = _load_ref("datasets/dataset_survival.py")
    with pytest.raises(AttributeError):
        ref_ds.TCGAWSIRNASurvivalDataset(
            cohort["feature_dir"], cohort["rna_csv"], cohort["survival_csv"],
            num_wsi_feature_tokens=16, splits=None,
        )
    m = SurvivalDataset(
        cohort["feature_dir"], cohort["rna_csv"], cohort["survival_csv"],
        num_wsi_feature_tokens=16, splits=None,
    )
    assert len(m) == 16


def test_sampler_weights_vs_reference(cohort):
    """The sampler oracle, with the index-alignment fix as a MEASURED diff.

    Mechanism check first: the reference's weights are exactly
    total/fullcohort_count[ survival_data['label'][i] ] — i.e. get_label(i)
    positionally indexes the merged survival table (CSV row order) while
    used_feature_ids follow the WSI listdir order restricted to the fold, so
    on a fold the weights are misaligned with the samples AND use full-cohort
    counts (ref dataset_survival.py:81-84,276-277 + utils/loader.py:14-26).
    Ours weights 1/split_count index-aligned via get_label over the live
    split — the deliberate fix recorded in PARITY.md.

    Uses a crafted survival CSV populating all 2*num_bins classes: the
    reference sampler ZeroDivisionErrors on any empty class
    (utils/loader.py:19) — and with UNEQUAL counts, else every weight is
    identical and the misalignment is invisible."""
    from mirror_tpu.data.loader import class_balanced_weights

    surv = pd.read_csv(cohort["survival_csv"])
    surv["Overall Survival Status"] = (
        ["1:DECEASED"] * 8 + ["0:LIVING"] * 8
    )
    # deceased months 10..80 => quartile bins of 2 each; living months land
    # 1/1/2/4 across the bins => class counts 2,2,2,2,1,1,2,4
    surv["Overall Survival (Months)"] = [
        10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0,
        12.0, 30.0, 50.0, 52.0, 70.0, 72.0, 75.0, 79.0,
    ]
    csv = os.path.join(
        os.path.dirname(cohort["survival_csv"]), "balanced_surv.csv"
    )
    surv.to_csv(csv, index=False)
    cohort2 = dict(cohort, survival_csv=csv)

    ref_loader = _load_ref("utils/loader.py")
    r = _ref_survival(cohort2).update_fold_nb(0).train()
    m = _my_survival(cohort2).update_fold_nb(0).train()
    assert set(r.used_feature_ids) == set(m.used_feature_ids)

    ref_w = np.asarray(
        ref_loader.class_balanced_sampler(r).weights, dtype=np.float64
    )
    # confirm our reading of the reference mechanism bit-exactly
    full_counts = np.array([len(ids) for ids in r.slide_cls_ids], np.float64)
    table_labels = r.survival_data["label"].to_numpy()
    want_ref = len(r) / full_counts[table_labels[: len(r)]]
    np.testing.assert_allclose(ref_w, want_ref, rtol=1e-12)

    # ours: index-aligned, live-split counts
    my_w = class_balanced_weights(m)
    labels = np.array([m.get_label(i) for i in range(len(m))])
    counts = np.bincount(labels, minlength=int(m.num_classes))
    np.testing.assert_allclose(my_w, 1.0 / counts[labels], rtol=1e-12)

    # the expected diff: the reference's per-index weights do NOT follow the
    # samples' own labels on this fold (first-len(train) table rows include
    # val patients); if this ever starts matching, the fixture stopped
    # exercising the misalignment — tighten it rather than deleting the fix
    ref_aligned = len(r) / full_counts[
        np.array([m.get_label(m.used_feature_ids.index(s))
                  for s in r.used_feature_ids])
    ]
    assert not np.allclose(ref_w, ref_aligned), (
        "cohort no longer demonstrates the reference's sampler misalignment"
    )


def test_survival_dedup_semantics_vs_reference(cohort, tmp_path):
    """The dedup/intersection ORDER in _filter_data is semantic (keep='first'
    under a different order keeps different rows) — exercise it with a
    deliberately messy cohort: a duplicated RNA row (conflicting values), a
    duplicated survival Sample ID (extension variant), a duplicated Patient
    ID with a different Sample ID, and a multi-slide patient."""
    import shutil

    feat = tmp_path / "features"
    feat.mkdir()
    for f in os.listdir(cohort["feature_dir"]):
        shutil.copy(os.path.join(cohort["feature_dir"], f), feat / f)
    slides = sorted(os.listdir(feat))
    # multi-slide patient: clone slide 0 as a DX2
    first = slides[0]
    shutil.copy(feat / first, feat / first.replace("DX1", "DX2"))

    rna = pd.read_csv(cohort["rna_csv"], index_col=0)
    dup_rna = rna.iloc[[3]].copy() * 7.0  # same index, conflicting values
    rna2 = pd.concat([rna, dup_rna])
    rna_csv = str(tmp_path / "rna_dup.csv")
    rna2.to_csv(rna_csv)

    surv = pd.read_csv(cohort["survival_csv"])
    dup_sid = surv.iloc[[2]].copy()
    dup_sid["Sample ID"] = dup_sid["Sample ID"] + ".A"  # ext variant
    dup_sid["Overall Survival (Months)"] = 999.0
    dup_pid = surv.iloc[[4]].copy()
    dup_pid["Sample ID"] = dup_pid["Sample ID"].str[:-2] + "02"
    dup_pid["Overall Survival (Months)"] = 777.0
    surv2 = pd.concat([surv, dup_sid, dup_pid], ignore_index=True)
    surv_csv = str(tmp_path / "surv_dup.csv")
    surv2.to_csv(surv_csv, index=False)

    messy = dict(cohort, feature_dir=str(feat), rna_csv=rna_csv,
                 survival_csv=surv_csv)
    r = _ref_survival(messy)
    m = _my_survival(messy)
    assert r.num_classes == m.num_classes
    rt = r.survival_data.set_index("Sample ID").sort_index()
    mt = m.survival_data.set_index("Sample ID").sort_index()
    assert list(rt.index) == list(mt.index)
    for col in ("disc_label", "censorship", "label",
                "Overall Survival (Months)"):
        np.testing.assert_array_equal(
            rt[col].to_numpy(), mt[col].to_numpy(), err_msg=col
        )
    for fold in (0, 1):
        r.update_fold_nb(fold)
        m.update_fold_nb(fold)
        assert set(r.train_feature_ids) == set(m.train_feature_ids)
        assert set(r.val_feature_ids) == set(m.val_feature_ids)
    # both slides of the multi-slide patient resolve to the same kept row
    np.random.seed(0)
    r.train()
    m.train()
    assert sorted(r.used_feature_ids) == sorted(m.used_feature_ids)
    # the duplicated RNA row: keep='first' => ORIGINAL values win in both
    order = {s: i for i, s in enumerate(m.used_feature_ids)}
    for ridx, slide in enumerate(r.used_feature_ids):
        np.random.seed(ridx)
        item_ref = r[ridx]
        np.random.seed(ridx)
        item_my = m[order[slide]]
        np.testing.assert_allclose(
            item_my["rna"], item_ref[1].numpy(), rtol=1e-6,
            err_msg=slide,
        )


# ---------------------------------------------------------------------------
# TruncatedResNet50 vs the reference graph with random weights
# ---------------------------------------------------------------------------


def test_truncated_resnet50_vs_reference_random_weights():
    from mirror_tpu.models.feature_extractors import (
        TruncatedResNet50, load_torch_resnet50_weights,
    )

    ref = _load_ref("tools/feature_generation/feature_models/resnet_custom.py")
    torch.manual_seed(0)
    model = ref.custom_resnet50(pretrained=False).eval()
    # randomize BN running stats too: fresh stats (mean 0 / var 1) would
    # hide eps-placement and stat-wiring bugs
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0.0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0.0, 0.2)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(_t(x.transpose(0, 3, 1, 2))).numpy()
    assert want.shape == (2, 1024)

    net = TruncatedResNet50()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    variables = load_torch_resnet50_weights(variables, model.state_dict())
    got = np.asarray(net.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
