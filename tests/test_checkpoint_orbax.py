"""Orbax checkpoint format: round-trip, saver best-k cycle, resume, and
cross-format loading (payload contract identical to the msgpack default)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mirror_tpu.train.checkpoint import (
    CheckpointSaver,
    load_checkpoint_file,
    load_pretrained,
    resume_checkpoint,
    save_checkpoint_file,
)
from mirror_tpu.train.state import create_train_state


def _tiny_state():
    params = {
        "dense": {"kernel": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
                  "bias": jnp.zeros(4)},
    }
    tx = optax.adam(1e-3)
    return create_train_state(params, tx, model_ema=True)


@pytest.mark.parametrize("fmt", ["msgpack", "orbax"])
def test_payload_roundtrip(tmp_path, fmt):
    path = str(tmp_path / ("ck.orbax" if fmt == "orbax" else "ck.msgpack"))
    payload = {
        "epoch": 5,
        "arch": "mirror",
        "state_dict": {"w": np.ones((4, 4), np.float32)},
        "metric": 0.5,
        "args": "yaml text",
        "version": 2,
    }
    save_checkpoint_file(path, payload, fmt=fmt)
    back = load_checkpoint_file(path)  # auto-detected by dir/file
    assert int(back["epoch"]) == 5
    # native str, NOT a 0-d <U numpy array: predict.py feeds payload["args"]
    # to yaml.safe_load and payload["arch"] to the registry lookup, both of
    # which break on numpy string scalars
    assert isinstance(back["args"], str) and back["args"] == "yaml text"
    assert isinstance(back["arch"], str) and back["arch"] == "mirror"
    np.testing.assert_array_equal(back["state_dict"]["w"], payload["state_dict"]["w"])


def test_orbax_saver_cycle_and_resume(tmp_path):
    state = _tiny_state()
    saver = CheckpointSaver(
        str(tmp_path), arch="tiny", decreasing=True, max_history=2,
        async_save=False, fmt="orbax",
    )
    for epoch, metric in [(0, 1.0), (1, 0.5), (2, 0.8)]:
        best, best_epoch = saver.save_checkpoint(state, epoch, metric)
    assert best == 0.5 and best_epoch == 1
    # best-k cleanup removed the worst epoch's DIRECTORY (max_history=2)
    kept = sorted(os.path.basename(p) for p in glob.glob(str(tmp_path / "checkpoint-*")))
    assert kept == ["checkpoint-1.orbax", "checkpoint-2.orbax"], kept
    assert os.path.isdir(tmp_path / "model_best.orbax")
    assert os.path.isdir(tmp_path / "last.orbax")

    fresh = _tiny_state()
    fresh = fresh.replace(
        params=jax.tree.map(jnp.zeros_like, fresh.params)
    )
    restored, start_epoch = resume_checkpoint(
        fresh, str(tmp_path / "last.orbax")
    )
    assert start_epoch == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params["dense"]["kernel"]),
        np.asarray(state.params["dense"]["kernel"]),
    )


def test_cross_format_pretrained_transfer(tmp_path):
    """A downstream model must load an orbax pretrain checkpoint exactly as
    it loads a msgpack one (non-strict merge included)."""
    state = _tiny_state()
    saver = CheckpointSaver(
        str(tmp_path), decreasing=True, async_save=False, fmt="orbax"
    )
    saver.save_checkpoint(state, 0, 1.0)
    target = {
        "dense": {"kernel": jnp.zeros((3, 4)), "bias": jnp.ones(4)},
        "head": {"kernel": jnp.zeros((4, 2))},  # not in source: keeps init
    }
    merged = load_pretrained(target, str(tmp_path / "model_best.orbax"))
    np.testing.assert_array_equal(
        np.asarray(merged["dense"]["kernel"]),
        np.asarray(state.params["dense"]["kernel"]),
    )
    assert np.asarray(merged["head"]["kernel"]).sum() == 0.0


@pytest.mark.parametrize("fmt", ["msgpack", "orbax"])
def test_immediately_evicted_checkpoint_leaves_no_orphan(tmp_path, fmt):
    """A save whose metric already falls outside the best-k window must not
    leave an orphan on disk: with async saves, removing it after dispatch
    raced the background write (the old behavior wrote it anyway and the
    eviction hit a not-yet-existing path)."""
    state = _tiny_state()
    saver = CheckpointSaver(
        str(tmp_path), decreasing=True, max_history=1, async_save=True,
        fmt=fmt,
    )
    saver.save_checkpoint(state, 0, 0.5)   # best, kept
    saver.save_checkpoint(state, 1, 0.9)   # worse than every kept -> evicted
    saver.wait()
    names = sorted(os.path.basename(p)
                   for p in glob.glob(str(tmp_path / "checkpoint-*")))
    ext = ".orbax" if fmt == "orbax" else ".msgpack"
    assert names == [f"checkpoint-0{ext}"], names
    # last/best still reflect the newest save / the best metric
    assert os.path.exists(str(tmp_path / f"last{ext}"))
    assert os.path.exists(str(tmp_path / f"model_best{ext}"))
    back = load_checkpoint_file(str(tmp_path / f"last{ext}"))
    assert int(back["epoch"]) == 1
    back = load_checkpoint_file(str(tmp_path / f"model_best{ext}"))
    assert int(back["epoch"]) == 0


def test_metric_none_saves_stay_bounded(tmp_path):
    """Unranked saves (--no-val runs, NaN-metric epochs) must not accumulate
    one per-epoch checkpoint forever: they never enter best-k ranking, so
    only the rolling ``last`` is written."""
    state = _tiny_state()
    saver = CheckpointSaver(str(tmp_path), decreasing=True, max_history=2,
                            async_save=False)
    for epoch in range(6):
        saver.save_checkpoint(state, epoch, metric=None)
    files = sorted(os.path.basename(p) for p in glob.glob(str(tmp_path / "*")))
    assert files == ["last.msgpack"], files
    back = load_checkpoint_file(str(tmp_path / "last.msgpack"))
    assert int(back["epoch"]) == 5
    # ranked saves still work after unranked ones
    saver.save_checkpoint(state, 6, metric=0.4)
    assert os.path.exists(str(tmp_path / "checkpoint-6.msgpack"))


def test_resume_restores_step_counter(tmp_path):
    """TrainState.step must survive save/resume: the EMA decay and the
    schedule-count logging are driven by it, and a step that restarts at 0
    made the first post-resume EMA update OVERWRITE the restored shadow
    (decay 0 at step<=0, timm first-update-copies semantics)."""
    state = _tiny_state().replace(step=123)
    saver = CheckpointSaver(str(tmp_path), decreasing=True, async_save=False)
    saver.save_checkpoint(state, 7, 0.5)
    fresh = _tiny_state()
    restored, start_epoch = resume_checkpoint(
        fresh, str(tmp_path / "last.msgpack")
    )
    assert int(restored.step) == 123
    assert start_epoch == 8
