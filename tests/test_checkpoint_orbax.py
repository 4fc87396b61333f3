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


def test_orbax_save_is_atomic_and_preserves_previous_on_failure(tmp_path):
    """Orbax writes used to be delete-then-write: a crash mid-save lost the
    previous last/model_best permanently. Now the new tree lands under a tmp
    name first, so a failing save leaves the old checkpoint intact (and a
    successful one leaves no tmp behind)."""
    from mirror_tpu.train.checkpoint import (
        load_checkpoint_file,
        save_checkpoint_file,
    )

    path = str(tmp_path / "last.orbax")
    save_checkpoint_file(path, {"epoch": 1, "v": np.ones(3)}, fmt="orbax")
    assert not os.path.exists(path + ".tmp")
    assert int(np.asarray(load_checkpoint_file(path)["epoch"])) == 1

    import orbax.checkpoint as ocp

    real_save = ocp.PyTreeCheckpointer.save
    mp = pytest.MonkeyPatch()
    mp.setattr(
        ocp.PyTreeCheckpointer, "save",
        lambda self, p, payload: (_ for _ in ()).throw(OSError("disk full")),
    )
    try:
        with pytest.raises(OSError):
            save_checkpoint_file(
                path, {"epoch": 2, "v": np.zeros(3)}, fmt="orbax"
            )
    finally:
        mp.undo()
    # the previous checkpoint survived the failed save
    assert int(np.asarray(load_checkpoint_file(path)["epoch"])) == 1
    _ = real_save  # keep a reference so the patch target stays importable


def test_async_save_failure_surfaces_in_wait(tmp_path):
    """A background write error (ENOSPC, permissions) must fail the run at
    the next wait(), not die silently with the daemon thread."""
    import mirror_tpu.train.checkpoint as ckpt_mod
    from mirror_tpu.train.checkpoint import CheckpointSaver

    params = {"w": jnp.ones((2, 2))}
    tx = optax.sgd(1e-2)
    state = create_train_state(params, tx)

    saver = CheckpointSaver(str(tmp_path), async_save=True)
    mp = pytest.MonkeyPatch()
    mp.setattr(
        ckpt_mod, "save_checkpoint_file",
        lambda *a, **k: (_ for _ in ()).throw(OSError("no space left")),
    )
    try:
        saver.save_checkpoint(state, epoch=0, metric=1.0)
        with pytest.raises(RuntimeError, match="background checkpoint write"):
            saver.wait()
    finally:
        mp.undo()
    saver.wait()  # the error is consumed; saver is reusable


def test_gather_for_save_noop_and_to_host_guard():
    """Single-process / fully-addressable state: gather_for_save is an
    identity scan (the multi-host collective path can't be simulated here,
    but the no-op contract is what every single-host run relies on)."""
    from mirror_tpu.train.checkpoint import _to_host, gather_for_save

    params = {"w": jnp.ones((2, 2)), "b": jnp.zeros(3)}
    tx = optax.sgd(1e-2)
    state = create_train_state(params, tx)
    out = gather_for_save(state)
    assert out is state  # no leaves need gathering -> identity
    host = _to_host(out.params)
    np.testing.assert_array_equal(host["w"], np.ones((2, 2)))
