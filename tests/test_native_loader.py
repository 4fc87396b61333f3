"""Native C++ batch-assembly loader tests: build, correctness vs numpy,
sampling semantics, error paths, and Loader integration."""


import numpy as np
import pytest

from mirror_tpu.data import Loader, PretrainDataset, make_synthetic_cohort
from mirror_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader did not build"
)


def _write_npy(tmp_path, name, arr):
    p = str(tmp_path / name)
    np.save(p, arr)
    return p + ".npy" if not p.endswith(".npy") else p


def test_npy_shape(tmp_path):
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = _write_npy(tmp_path, "a.npy", arr)
    assert native_loader.npy_shape(p) == (3, 4)


def test_gather_without_replacement_rows_are_real(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(50, 8)).astype(np.float32)
    p = _write_npy(tmp_path, "b.npy", arr)
    out = native_loader.gather_batch([p], n_tokens=20, seeds=[123])
    assert out.shape == (1, 20, 8)
    # every sampled row must be an actual row of the file, all distinct
    rows = {tuple(r) for r in np.asarray(out[0])}
    src = {tuple(r) for r in arr}
    assert rows <= src
    assert len(rows) == 20  # without replacement


def test_gather_with_replacement_when_short(tmp_path):
    arr = np.arange(3 * 4, dtype=np.float32).reshape(3, 4)
    p = _write_npy(tmp_path, "c.npy", arr)
    out = native_loader.gather_batch([p], n_tokens=10, seeds=[7])
    assert out.shape == (1, 10, 4)
    rows = {tuple(r) for r in np.asarray(out[0])}
    assert rows <= {tuple(r) for r in arr}
    assert len(rows) <= 3  # only 3 distinct rows exist


def test_gather_batch_multifile_deterministic(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(4):
        arr = rng.normal(size=(30 + i, 6)).astype(np.float32)
        paths.append(_write_npy(tmp_path, f"d{i}.npy", arr))
    out1 = native_loader.gather_batch(paths, 16, seeds=[1, 2, 3, 4])
    out2 = native_loader.gather_batch(paths, 16, seeds=[1, 2, 3, 4])
    np.testing.assert_array_equal(out1, out2)  # same seeds -> same batch
    out3 = native_loader.gather_batch(paths, 16, seeds=[5, 6, 7, 8])
    assert not np.array_equal(out1, out3)


def test_gather_errors(tmp_path):
    with pytest.raises(ValueError):
        native_loader.gather_batch(
            [str(tmp_path / "missing.npy")], 4, seeds=[0], feature_dim=8
        )
    # wrong dtype rejected
    bad = str(tmp_path / "bad.npy")
    np.save(bad, np.zeros((4, 4), dtype=np.float64))
    with pytest.raises(ValueError):
        native_loader.gather_batch([bad], 2, seeds=[0], feature_dim=4)


def test_loader_native_fast_path(tmp_path):
    cohort = make_synthetic_cohort(
        str(tmp_path / "c"), n_patients=8, feature_dim=16, rna_dim=32
    )
    ds = PretrainDataset(
        cohort["feature_dir"], cohort["rna_csv"], num_wsi_feature_tokens=24,
        splits=cohort["splits_dir"],
    )
    ds.train()
    loader = Loader(ds, batch_size=4, drop_last=True, seed=5, prefetch=0)
    assert loader._native  # .npy cohort -> fast path active
    batches = list(loader)
    assert batches[0]["wsi"].shape == (4, 24, 16)
    assert batches[0]["rna"].shape == (4, 32)
    assert np.all(np.isfinite(batches[0]["wsi"]))
    # deterministic per epoch
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["wsi"], again[0]["wsi"])
    # python path produces the same shapes
    loader_py = Loader(ds, batch_size=4, drop_last=True, seed=5, prefetch=0,
                       use_native=False)
    pb = list(loader_py)
    assert pb[0]["wsi"].shape == batches[0]["wsi"].shape
    np.testing.assert_array_equal(pb[0]["rna"], batches[0]["rna"])


def test_native_rejects_malformed_npy(tmp_path):
    """The C++ gather must fail cleanly (error code -> ValueError) on files
    that would previously read out of bounds or hit UB: truncated data
    sections (SIGBUS), zero-row slides (uniform_int_distribution(0,-1) UB),
    and N-D arrays silently parsed as 2-D; short seed lists must not
    zero-fill (seed-0 resampling every batch)."""
    import numpy as np
    import pytest

    from mirror_tpu.data import native_loader as nl

    if not nl.available():
        pytest.skip("native loader unavailable")
    ok = str(tmp_path / "ok.npy")
    np.save(ok, np.random.rand(10, 8).astype(np.float32))
    assert nl.gather_batch([ok], 4, [1], feature_dim=8).shape == (1, 4, 8)

    empty = str(tmp_path / "empty.npy")
    np.save(empty, np.zeros((0, 8), np.float32))
    with pytest.raises(ValueError):
        nl.gather_batch([empty], 4, [1], feature_dim=8)

    trunc = str(tmp_path / "trunc.npy")
    np.save(trunc, np.random.rand(100, 8).astype(np.float32))
    import os

    with open(trunc, "r+b") as f:
        f.truncate(os.path.getsize(trunc) - 2000)
    with pytest.raises(ValueError):
        nl.gather_batch([trunc], 4, [1], feature_dim=8)

    nd = str(tmp_path / "nd.npy")
    np.save(nd, np.random.rand(5, 8, 3).astype(np.float32))
    with pytest.raises(ValueError):
        nl.gather_batch([nd], 4, [1], feature_dim=8)

    with pytest.raises(ValueError):
        nl.gather_batch([ok, ok], 4, [1], feature_dim=8)  # short seeds
    with pytest.raises(ValueError):
        # shape matches but the buffer is a transposed view
        out = np.empty((1, 8, 4), np.float32).transpose(0, 2, 1)
        nl.gather_batch([ok], 4, [1], feature_dim=8, out=out)  # non-contig


def test_loader_falls_back_when_native_rejects_content(tmp_path, caplog):
    """A float64 .npy cohort passes the extension eligibility check but the
    C++ gather rejects the dtype: the loader must warn + fall back to the
    numpy path instead of crashing the epoch."""
    import logging

    from mirror_tpu.data import PretrainDataset, make_synthetic_cohort

    cohort = make_synthetic_cohort(
        str(tmp_path / "c"), n_patients=6, feature_dim=16, rna_dim=32
    )
    # rewrite every feature file as float64 (np.save of raw float64 feats)
    import glob
    import os

    for f in glob.glob(os.path.join(cohort["feature_dir"], "*.npy")):
        np.save(f, np.load(f).astype(np.float64))
    ds = PretrainDataset(
        cohort["feature_dir"], cohort["rna_csv"], num_wsi_feature_tokens=24,
        splits=cohort["splits_dir"],
    )
    ds.train()
    from mirror_tpu.data import Loader

    loader = Loader(ds, batch_size=2, drop_last=True, seed=5, prefetch=0)
    if not loader._native:
        pytest.skip("native loader unavailable in this environment")
    with caplog.at_level(logging.WARNING, logger="mirror_tpu.data.loader"):
        batches = list(loader)
    assert not loader._native  # downgraded, not crashed
    assert any("falling back" in r.message for r in caplog.records)
    assert batches[0]["wsi"].dtype == np.float32
    assert np.all(np.isfinite(batches[0]["wsi"]))


def test_gather_batch_error_names_the_failing_file(tmp_path):
    from mirror_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native loader unavailable")
    good = tmp_path / "good.npy"
    bad = tmp_path / "bad.npy"
    np.save(good, np.random.rand(10, 8).astype(np.float32))
    bad.write_bytes(b"\x93NUMPY garbage")
    with pytest.raises(ValueError, match="bad.npy"):
        native_loader.gather_batch(
            [str(good), str(bad)], 4, [1, 2], num_threads=2
        )
