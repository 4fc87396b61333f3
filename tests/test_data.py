"""Dataset/loader semantics tests on synthetic fixtures."""

import numpy as np
import pytest

from mirror_tpu.data import (
    Loader,
    PretrainDataset,
    SubtypingDataset,
    SurvivalDataset,
    make_synthetic_cohort,
)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("cohort")
    return make_synthetic_cohort(str(root), n_patients=10, num_folds=5)


def test_pretrain_dataset_shapes_and_folds(cohort):
    ds = PretrainDataset(
        cohort["feature_dir"], cohort["rna_csv"], num_wsi_feature_tokens=32,
        splits=cohort["splits_dir"],
    )
    n_train = len(ds.train())
    n_val = len(ds.val())
    assert n_train + n_val == 10
    assert n_val == 2
    item = ds.train().__getitem__(0, rng=np.random.default_rng(0))
    assert item["wsi"].shape == (32, 64)
    assert item["rna"].shape == (128,)
    # fold membership is disjoint
    t0 = set(ds.update_fold_nb(0).train_feature_ids)
    v0 = set(ds.update_fold_nb(0).val_feature_ids)
    assert not (t0 & v0)
    # different folds give different val sets
    v1 = set(ds.update_fold_nb(1).val_feature_ids)
    assert v0 != v1


def test_pretrain_token_sampling_replacement(cohort):
    # num tokens larger than any slide -> sampling with replacement works
    ds = PretrainDataset(
        cohort["feature_dir"], cohort["rna_csv"], num_wsi_feature_tokens=512,
        splits=cohort["splits_dir"],
    )
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["wsi"].shape == (512, 64)


def test_subtyping_dataset(cohort):
    ds = SubtypingDataset(
        cohort["subtype_feature_dir"], cohort["rna_csv"], cohort["classes"],
        num_wsi_feature_tokens=16, splits=cohort["splits_dir"],
    )
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["wsi"].shape == (16, 64)
    assert item["label"] in (0, 1)
    assert item["rna"].shape == (128,)
    only = SubtypingDataset(
        cohort["subtype_feature_dir"], cohort["rna_csv"], cohort["classes"],
        num_wsi_feature_tokens=16, splits=cohort["splits_dir"],
        wsi_feature_only=True,
    )
    assert "rna" not in only.__getitem__(0, rng=np.random.default_rng(0))


def test_survival_dataset_discretization(cohort):
    ds = SurvivalDataset(
        cohort["feature_dir"], cohort["rna_csv"], cohort["survival_csv"],
        num_wsi_feature_tokens=16, splits=cohort["splits_dir"], num_bins=4,
    )
    assert ds.num_classes == 8  # (bin, censorship) pairs
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert 0 <= item["label"] < 4
    assert item["censorship"] in (0, 1)
    assert item["event_time"] > 0
    # every sample in the cohort has a valid bin
    assert set(ds.survival_data["disc_label"]) <= {0, 1, 2, 3}


def test_loader_shapes_and_epoch_determinism(cohort):
    ds = PretrainDataset(
        cohort["feature_dir"], cohort["rna_csv"], num_wsi_feature_tokens=16,
        splits=cohort["splits_dir"],
    )
    ds.train()
    loader = Loader(ds, batch_size=4, shuffle=True, drop_last=True, seed=7)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    assert batches[0]["wsi"].shape == (4, 16, 64)
    assert batches[0]["rna"].shape == (4, 128)
    # same epoch -> identical order; different epoch -> different
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["wsi"], again[0]["wsi"])
    loader.set_epoch(1)
    other = list(loader)
    assert not np.array_equal(batches[0]["wsi"], other[0]["wsi"])


def test_loader_eval_padding(cohort):
    ds = PretrainDataset(
        cohort["feature_dir"], cohort["rna_csv"], num_wsi_feature_tokens=16,
        splits=cohort["splits_dir"],
    )
    ds.val()  # 2 samples
    loader = Loader(ds, batch_size=4, shuffle=False, drop_last=False, pad_last=True)
    (batch,) = list(loader)
    assert batch["wsi"].shape == (4, 16, 64)
    np.testing.assert_array_equal(batch["valid"], [1, 1, 0, 0])


def test_weighted_sampler_balances_classes(cohort):
    ds = SubtypingDataset(
        cohort["subtype_feature_dir"], cohort["rna_csv"], cohort["classes"],
        num_wsi_feature_tokens=8, splits=cohort["splits_dir"],
    )
    ds.train()
    loader = Loader(ds, batch_size=4, weighted=True, drop_last=False, seed=3,
                    prefetch=0)
    counts = np.zeros(2)
    for _ in range(30):
        for batch in loader:
            for lab in batch["label"]:
                counts[int(lab)] += 1
        loader.set_epoch(loader.epoch + 1)
    ratio = counts[0] / counts.sum()
    assert 0.3 < ratio < 0.7  # roughly balanced regardless of class skew


def test_weighted_sampler_invalidates_on_split_switch():
    """Switching the shared dataset to a same-length split must recompute
    the class-balanced weights: the old guard keyed on len() only, so an
    equal-sized fold silently reused the previous split's weights."""
    from mirror_tpu.data.loader import Loader

    class TwoSplit:
        """4 samples either way; labels differ completely between modes."""

        def __init__(self):
            self._mode = "train"
            self.fold_nb = 0

        def __len__(self):
            return 4

        def get_label(self, i):
            # train: classes [0,0,0,1] (heavy skew), val: [0,1,1,1]
            return (1 if i == 3 else 0) if self._mode == "train" else (
                0 if i == 0 else 1)

        def __getitem__(self, i, rng=None):
            return {"label": np.asarray(self.get_label(i), np.int32)}

    ds = TwoSplit()
    loader = Loader(ds, batch_size=4, weighted=True, drop_last=False,
                    use_native=False, prefetch=0, seed=0)
    w_train = loader._weights.copy()
    ds._mode = "val"  # same length, different index space
    list(loader)  # triggers _indices -> staleness check
    assert not np.array_equal(loader._weights, w_train)
    np.testing.assert_allclose(loader._weights, [1.0, 1 / 3, 1 / 3, 1 / 3])


def test_loader_early_abandonment_stops_producer():
    """Breaking out of loader iteration (preemption, exceptions) must stop
    the prefetch thread instead of leaving it blocked on a full queue, and
    normal exhaustion must still deliver every batch + terminate."""
    import threading

    from mirror_tpu.data.loader import Loader

    class Tiny:
        def __len__(self):
            return 32

        def __getitem__(self, i, rng=None):
            import numpy as np

            return {"x": np.full((4,), i, np.float32)}

    before = threading.active_count()
    loader = Loader(Tiny(), batch_size=4, shuffle=False, drop_last=True,
                    use_native=False, prefetch=2)
    # abandon mid-iteration
    for n, batch in enumerate(loader):
        if n == 1:
            break
    # normal full pass still yields everything
    count = sum(1 for _ in loader)
    assert count == 8
    # give threads a beat to wind down; no producer may linger
    import time

    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, threading.enumerate()


def test_list_feature_files_dedupes_formats(tmp_path):
    """A slide saved in two formats (post convert_features) must be listed
    once, preferring .npy — otherwise datasets double-count it per epoch."""
    from mirror_tpu.data.formats import list_feature_files

    d = tmp_path / "feats"
    d.mkdir()
    np.save(d / "TCGA-AA-0001-01Z-00-DX1.npy", np.zeros((4, 8), np.float32))
    (d / "TCGA-AA-0001-01Z-00-DX1.pt").write_bytes(b"x")  # never opened
    np.save(d / "TCGA-AA-0002-01Z-00-DX1.npy", np.zeros((4, 8), np.float32))
    files = list_feature_files(str(d))
    assert files == [
        "TCGA-AA-0001-01Z-00-DX1.npy", "TCGA-AA-0002-01Z-00-DX1.npy",
    ]


def test_eval_loader_resamples_tokens_per_epoch(cohort):
    """gather_eval_outputs passes the epoch into the loader: long slides
    must get a FRESH token subsample each eval (reference validate draws
    from the global RNG every epoch), not one frozen draw."""
    ds = PretrainDataset(
        cohort["feature_dir"], cohort["rna_csv"], num_wsi_feature_tokens=16,
        splits=cohort["splits_dir"],
    )
    ds.train()
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False,
                    pad_last=True, seed=7, prefetch=0, use_native=False)
    loader.set_epoch(0)
    e0 = next(iter(loader))["wsi"]
    loader.set_epoch(1)
    e1 = next(iter(loader))["wsi"]
    loader.set_epoch(0)
    e0_again = next(iter(loader))["wsi"]
    np.testing.assert_array_equal(e0, e0_again)  # same epoch -> same draw
    assert not np.array_equal(e0, e1)  # new epoch -> new subsample
