"""Checkpointing: best-k tracking, recovery, resume, and non-strict
pretrain->downstream transfer.

Replicates the timm CheckpointSaver semantics the reference relies on
(/root/reference/train_mirror.py:917-927, 1352-1357, 776-784):
- ``save_checkpoint(epoch, metric)`` keeps the ``max_history`` best
  checkpoints ranked by the eval metric, plus ``last`` and ``model_best``;
- ``save_recovery`` writes a rolling recovery file every N updates;
- ``resume`` restores params + optimizer state + epoch;
- payload keys (epoch/arch/state_dict/ema/metric/args/version) match the
  reference's on-disk contract observed in tools/split_weights.py:55-70.

Format: flax msgpack of numpy pytrees (default) — single-host friendly;
arrays are pulled off-device at save time. ``fmt="orbax"`` writes Orbax
PyTree checkpoint DIRECTORIES instead (``.orbax`` suffix) — the standard
JAX production checkpointer (async/sharded/multi-host capable); the payload
keys are identical, and every loader here auto-detects the format per path
(directory -> orbax, file -> msgpack), so resume and pretrain->downstream
transfer work across formats.
"""

import logging
import os
import threading
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_logger = logging.getLogger(__name__)

EXT = ".msgpack"
EXT_ORBAX = ".orbax"


def _to_host(tree: Any) -> Any:
    def get(x: Any) -> np.ndarray:
        if (
            isinstance(x, jax.Array)
            and not x.is_fully_addressable
            and not x.is_fully_replicated
        ):
            # A model/ZeRO-sharded MULTI-HOST leaf: assembling it needs a
            # cross-host collective that every process must enter, but the
            # saver runs on process 0 only — a process-0-only jit gather
            # here would DEADLOCK the job (the old code did exactly that,
            # and it also caught pure-DP replicated leaves, which
            # np.asarray reads locally just fine). The harness gathers
            # via gather_for_save() on all processes before saving.
            raise RuntimeError(
                "cannot save a cross-host-sharded leaf from one process: "
                "call gather_for_save(state) on EVERY process before the "
                "process-0 saver (train/harness.py does)"
            )
        return np.asarray(x)

    return jax.tree.map(get, tree)


def gather_for_save(state: Any) -> Any:
    """Re-replicate cross-host-sharded leaves (multi-host TP/ZeRO-1) so the
    process-0-gated saver can read them locally. MUST run on every process
    (the re-replication is an SPMD collective); a no-op single-process or
    when all leaves are already addressable/replicated — the common cases
    pay nothing."""
    leaves = [
        x for x in jax.tree.leaves(state)
        if isinstance(x, jax.Array)
        and not x.is_fully_addressable
        and not x.is_fully_replicated
    ]
    if not leaves:
        return state
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = leaves[0].sharding.mesh
    replicated = NamedSharding(mesh, PartitionSpec())

    def _needs(x):
        return (
            isinstance(x, jax.Array)
            and not x.is_fully_addressable
            and not x.is_fully_replicated
        )

    flat, treedef = jax.tree.flatten(state)
    idx = [i for i, x in enumerate(flat) if _needs(x)]
    # one jit for all sharded leaves (per-leaf jits would be one remote
    # compile each)
    gathered = jax.jit(
        lambda xs: xs, out_shardings=(replicated,) * len(idx)
    )(tuple(flat[i] for i in idx))
    for i, g in zip(idx, gathered):
        flat[i] = g
    return jax.tree.unflatten(treedef, flat)


def save_checkpoint_file(
    path: str, payload: Dict[str, Any], fmt: str = "msgpack"
) -> None:
    if fmt == "orbax":
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        # near-atomic like the msgpack path below: write the directory
        # under a tmp name, then swap. A crash mid-save must never have
        # already deleted the previous last/model_best (the old
        # delete-then-write lost it); the remaining window is two cheap
        # metadata ops instead of the full serialize+write.
        tmp = path + ".tmp"
        _remove_checkpoint(tmp)  # stale tmp from an earlier crash
        ocp.PyTreeCheckpointer().save(tmp, payload)
        _remove_checkpoint(path)  # dir OR stale file (format switch)
        os.rename(tmp, path)
        return
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _from_orbax_leaf(x: Any) -> Any:
    # Orbax round-trips python scalars/strings as 0-d numpy arrays; unwrap
    # them so payload consumers (yaml.safe_load(payload['args']), registry
    # lookup of payload['arch'], int(payload['epoch'])) see native types,
    # matching what the msgpack loader returns.
    arr = np.asarray(x)
    if arr.ndim == 0 and arr.dtype.kind in ("U", "S", "O"):
        return arr.item()
    # numeric 0-d leaves stay numpy: resume() already coerces epoch/step via
    # int(), and optax opt_state scalars (count) must remain arrays.
    return arr


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    """Format auto-detected: orbax checkpoints are directories."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        return jax.tree.map(_from_orbax_leaf, restored)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _remove_checkpoint(path: str) -> None:
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


class CheckpointSaver:
    def __init__(
        self,
        checkpoint_dir: str,
        arch: str = "",
        args_text: str = "",
        decreasing: bool = False,
        max_history: int = 5,
        async_save: bool = True,
        fmt: str = "msgpack",
    ) -> None:
        self.checkpoint_dir = checkpoint_dir
        self.arch = arch
        self.args_text = args_text
        self.fmt = fmt
        self.ext = EXT_ORBAX if fmt == "orbax" else EXT
        self.decreasing = decreasing  # True when lower metric is better (loss)
        self.max_history = max(max_history, 1)
        self.checkpoint_files: List[Tuple[str, float]] = []
        self.best_metric: Optional[float] = None
        self.best_epoch: Optional[int] = None
        # serialization + disk IO of a full state (params + adam moments) can
        # take tens of seconds; a background thread keeps the train loop
        # running. jax arrays are immutable, so snapshotting references is
        # safe; _to_host pulls them at write time.
        self.async_save = async_save
        self._save_thread: Optional[threading.Thread] = None
        self._save_error: Optional[BaseException] = None
        os.makedirs(checkpoint_dir, exist_ok=True)

    def _write(self, paths_payloads) -> None:
        try:
            for path, payload in paths_payloads:
                save_checkpoint_file(path, payload, fmt=self.fmt)
        except BaseException as e:  # noqa: BLE001 — re-raised in wait()
            self._save_error = e
            raise

    def _dispatch(self, paths_payloads) -> None:
        if not self.async_save:
            self._write(paths_payloads)
            return
        self.wait()  # at most one save in flight
        self._save_thread = threading.Thread(
            target=self._write, args=(paths_payloads,), daemon=True
        )
        self._save_thread.start()

    def wait(self) -> None:
        """Block until any in-flight save finishes (call before exiting).

        Re-raises a background write failure (ENOSPC, permissions): a save
        that silently died with its daemon thread would let training
        'succeed' with stale or missing checkpoints on disk."""
        if self._save_thread is not None:
            self._save_thread.join()
            self._save_thread = None
        if self._save_error is not None:
            err, self._save_error = self._save_error, None
            raise RuntimeError(
                f"background checkpoint write failed: {err!r}"
            ) from err

    def _payload(self, state, epoch: int, metric: Optional[float]) -> Dict[str, Any]:
        # strings/ints stay native python; only array pytrees go through
        # _to_host (numpy), otherwise msgpack round-trips strings as str_
        # arrays it cannot restore.
        return {
            "epoch": epoch,
            "step": int(state.step),  # EMA-decay / schedule-count counter
            "arch": self.arch,
            "state_dict": _to_host(state.params),
            "ema_state_dict": (
                _to_host(state.ema_params) if state.ema_params is not None else {}
            ),
            "opt_state": serialization.to_state_dict(_to_host(state.opt_state)),
            "metric": float(metric) if metric is not None else -1.0,
            "args": self.args_text,
            "version": 2,
        }

    def _cmp(self, a: float, b: float) -> bool:
        return a < b if self.decreasing else a > b

    def save_checkpoint(self, state, epoch: int, metric: Optional[float] = None):
        """Returns (best_metric, best_epoch) like timm."""
        self.wait()  # old-file removal below must not race an in-flight write
        # NOTE: _payload snapshots device arrays to host numpy NOW — the next
        # train step donates the state buffers, so the background writer must
        # never touch live jax arrays.
        payload = self._payload(state, epoch, metric)
        path = os.path.join(self.checkpoint_dir, f"checkpoint-{epoch}{self.ext}")
        last = os.path.join(self.checkpoint_dir, f"last{self.ext}")
        if metric is None:
            # unranked saves (--no-val runs, NaN-metric epochs) never enter
            # checkpoint_files, so best-k pruning would never reclaim their
            # per-epoch files — a long no-val run would accumulate one full
            # checkpoint (params + adam moments + EMA) per epoch. Write only
            # the rolling ``last`` (resume/downstream discovery use it).
            self._dispatch([(last, payload)])
            return self.best_metric, self.best_epoch
        writes = [(path, payload), (last, payload)]
        self.checkpoint_files.append((path, metric))
        self.checkpoint_files.sort(
            key=lambda t: t[1], reverse=not self.decreasing
        )
        while len(self.checkpoint_files) > self.max_history:
            drop_path, _ = self.checkpoint_files.pop()
            if drop_path == path:
                # the checkpoint we are ABOUT to write already fell out
                # of the best-k window (worse than every kept metric):
                # don't write it at all — removing it here raced the
                # async write and left an orphan file on disk forever
                writes = [w for w in writes if w[0] != path]
            else:
                _remove_checkpoint(drop_path)
        if self.best_metric is None or self._cmp(metric, self.best_metric):
            self.best_metric = metric
            self.best_epoch = epoch
            best = os.path.join(self.checkpoint_dir, f"model_best{self.ext}")
            writes.append((best, payload))
        self._dispatch(writes)
        return self.best_metric, self.best_epoch

    def save_recovery(self, state, epoch: int, batch_idx: int) -> None:
        self.wait()
        path = os.path.join(self.checkpoint_dir, f"recovery{self.ext}")
        self._dispatch([(path, self._payload(state, epoch, None))])


def resume_checkpoint(
    state, path: str, resume_opt: bool = True
) -> Tuple[Any, int]:
    """Restore params (+ optimizer state) from a checkpoint; returns
    (state, start_epoch) — start_epoch = saved epoch + 1 (timm convention)."""
    payload = load_checkpoint_file(path)
    params = serialization.from_state_dict(state.params, payload["state_dict"])
    # restore the step counter: without it the non-MultiSteps EMA decay
    # restarts at step 0 and the warmup branch OVERWRITES the restored EMA
    # shadow with raw params on the first post-resume update (and logged lr
    # falls back to the warmup phase)
    new_state = state.replace(
        params=params, step=int(payload.get("step", 0))
    )
    if payload.get("ema_state_dict") and state.ema_params is not None:
        new_state = new_state.replace(
            ema_params=serialization.from_state_dict(
                state.ema_params, payload["ema_state_dict"]
            )
        )
    if resume_opt and payload.get("opt_state") is not None:
        new_state = new_state.replace(
            opt_state=serialization.from_state_dict(
                state.opt_state, payload["opt_state"]
            )
        )
    start_epoch = int(payload.get("epoch", -1)) + 1
    _logger.info("Resumed from %s (epoch %d)", path, start_epoch - 1)
    return new_state, start_epoch


def merge_params(
    target: Any, source: Any, prefix: str = ""
) -> Tuple[Any, List[str], List[str]]:
    """Non-strict parameter transfer (torch load_state_dict(strict=False),
    ref train_subtyping.py:740-745): copy every leaf whose path and shape
    match; keep the target init elsewhere. Returns (merged, loaded, skipped)."""
    loaded: List[str] = []
    skipped: List[str] = []

    def merge(t, s, path):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                if isinstance(s, dict) and k in s:
                    out[k] = merge(v, s[k], f"{path}/{k}")
                else:
                    skipped.append(f"{path}/{k}")
                    out[k] = v
            return out
        s_arr = np.asarray(s)
        t_arr = np.asarray(t)
        if s_arr.shape == t_arr.shape:
            loaded.append(path)
            return s_arr.astype(t_arr.dtype)
        skipped.append(f"{path} (shape {s_arr.shape} != {t_arr.shape})")
        return t

    merged = merge(target, source, prefix)
    return merged, loaded, skipped


def load_pretrained(params: Any, checkpoint_path: str, use_ema: bool = False) -> Any:
    """Load a pretrain checkpoint into a (different) downstream model,
    non-strict."""
    payload = load_checkpoint_file(checkpoint_path)
    source = payload.get("ema_state_dict") if use_ema else None
    if not source:
        source = payload["state_dict"]
    merged, loaded, skipped = merge_params(params, source)
    _logger.info(
        "Loaded %d param tensors from %s (%d target entries kept their init)",
        len(loaded), checkpoint_path, len(skipped),
    )
    return merged
