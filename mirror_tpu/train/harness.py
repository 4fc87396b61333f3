"""Shared training harness: the TPU equivalent of the reference's four
~1,400-line timm-style train scripts (/root/reference/train_*.py).

One epoch-driven loop serves all workloads; per-task behavior (step
functions, eval metrics) is injected. Replicated reference semantics:

- LR auto-scaling from base lr + global batch (train_mirror.py:725-740)
- per-interval composite log line with loss meters, samples/sec
  (train_mirror.py:1335-1350)
- epoch summary.csv via ``update_summary`` (+ optional wandb)
- CheckpointSaver best-k ranking and recovery checkpoints
- final ``--result`` JSON on stdout (train_mirror.py:1079-1083)

TPU specifics: one jitted train step (state donated, batch sharded over the
``data`` mesh axis), bf16 compute / fp32 params, no GradScaler; the host
loader thread overlaps IO with device compute.
"""

import json
import logging
import os
import time
from collections import OrderedDict
from datetime import datetime
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mirror_tpu.parallel import create_mesh, shard_batch
from mirror_tpu.utils import AverageMeter, setup_default_logging

_logger = logging.getLogger("train")


@jax.jit
def _metric_add(acc, metrics):
    """Device-side accumulate of the per-step metric dict (no host pull)."""
    return jax.tree.map(jnp.add, acc, metrics)


def update_summary(
    epoch: int,
    train_metrics: Dict[str, float],
    eval_metrics: Optional[Dict[str, float]],
    filename: str,
) -> None:
    rowd = OrderedDict(epoch=epoch)
    rowd.update([("train_" + k, v) for k, v in train_metrics.items()])
    if eval_metrics:
        rowd.update([("eval_" + k, v) for k, v in eval_metrics.items()])
    import csv

    # header iff the file is new/empty — a resume into an existing run dir
    # must APPEND, not inject a second header mid-file (a stray string row
    # flips the metric columns to object dtype and breaks
    # tools/aggregate_results' idxmax)
    write_header = (
        not os.path.exists(filename) or os.path.getsize(filename) == 0
    )
    with open(filename, mode="a") as cf:
        dw = csv.DictWriter(cf, fieldnames=rowd.keys())
        if write_header:
            dw.writeheader()
        dw.writerow(rowd)


def gather_eval_outputs(
    mesh, eval_step, params, dataset, batch_size, n_devices,
    extra_keys=(), seed=42, native_threads=8, epoch=0,
):
    """Shared downstream eval gather (subtyping + survival): round the
    batch to a device multiple, pad the tail (``pad_last``), run the jitted
    eval step over the mesh, and keep only the valid (non-padded) rows.

    Returns (logits, labels, {key: array for key in extra_keys}).

    Multi-host: each process feeds its block of the global batch; logits are
    pulled back as host-local shards and every metric input is allgathered
    in process order (== global row order under the blocked layout), so all
    processes compute identical GLOBAL metrics — no per-rank averaging
    distortion (the reference per-rank-averages its c-index,
    train_survival.py:1466-1469; SURVEY section 3.3).
    """
    from mirror_tpu.data import Loader
    from mirror_tpu.parallel.distributed import allgather_rows, host_local_rows

    batch_size = ((batch_size + n_devices - 1) // n_devices) * n_devices
    loader = Loader(
        dataset, batch_size, shuffle=False, drop_last=False, pad_last=True,
        seed=seed, native_threads=native_threads,
    )
    # fresh token subsample per eval, like the reference's global-RNG draws
    # in validate (ref dataset __getitem__ np.random.choice each epoch) —
    # a fixed subsample would let best-checkpoint selection overfit to one
    # particular draw of each long slide
    loader.set_epoch(epoch)
    logits_all, labels_all = [], []
    extras = {k: [] for k in extra_keys}
    for host_batch in loader:
        valid = allgather_rows(host_batch.pop("valid"))
        batch = shard_batch(mesh, host_batch)
        logits = allgather_rows(host_local_rows(mesh, eval_step(params, batch)))
        keep = valid > 0
        logits_all.append(logits[keep])
        labels_all.append(allgather_rows(host_batch["label"])[keep])
        for k in extra_keys:
            extras[k].append(allgather_rows(host_batch[k])[keep])
    return (
        np.concatenate(logits_all),
        np.concatenate(labels_all),
        {k: np.concatenate(v) for k, v in extras.items()},
    )


def setup_output_dir(args, task: str) -> Optional[str]:
    if not args.output:
        return None
    exp_name = args.experiment or "-".join(
        [datetime.now().strftime("%Y%m%d-%H%M%S"), args.model, f"fold_{args.fold_nb}"]
    )
    out_dir = os.path.join(args.output, task, exp_name)
    os.makedirs(out_dir, exist_ok=True)
    return out_dir


def _jit_train_step(train_step, state, mesh) -> Callable:
    """jit the train step with donation, pinning the output state to the
    input state's shardings.

    Without the pin XLA is free to pick different output shardings (which
    breaks donation and, worse, would silently re-replicate ZeRO-1-sharded
    optimizer state on the first step). Metrics are scalars and pin to
    replicated. Pins ONLY when every leaf is committed to `mesh` via a
    NamedSharding: uncommitted single-device arrays (direct-construction
    tests) would otherwise pin a SingleDeviceSharding and make jit raise
    'Received incompatible devices' against a mesh-sharded batch."""
    from jax.sharding import NamedSharding, PartitionSpec

    leaves = jax.tree.leaves(state)
    if mesh is not None and leaves and all(
        isinstance(x, jax.Array)
        and isinstance(x.sharding, NamedSharding)
        and x.sharding.mesh == mesh
        for x in leaves
    ):
        state_shardings = jax.tree.map(lambda x: x.sharding, state)
        replicated = NamedSharding(mesh, PartitionSpec())
        return jax.jit(
            train_step, donate_argnums=0,
            out_shardings=(state_shardings, replicated),
        )
    return jax.jit(train_step, donate_argnums=0)


class TrainHarness:
    """Drives epochs over a jitted train step + an eval hook."""

    def __init__(
        self,
        args,
        mesh,
        state,
        train_step: Callable,
        train_loader,
        eval_fn: Optional[Callable],
        saver,
        out_dir: Optional[str],
        rng,
        eval_metric: str = "loss",
        decreasing_metric: bool = True,
        schedule: Optional[Callable] = None,
        lr_controller=None,
        num_epochs: Optional[int] = None,
    ) -> None:
        self.args = args
        self.mesh = mesh
        self.state = state
        self.train_step = _jit_train_step(train_step, state, mesh)
        self.train_loader = train_loader
        self.eval_fn = eval_fn
        self.saver = saver
        self.out_dir = out_dir
        self.rng = rng
        self.eval_metric = eval_metric
        self.decreasing_metric = decreasing_metric
        self.schedule = schedule
        # plateau schedule: a host-side PlateauController that rewrites the
        # lr scalar inside the optimizer state at epoch boundaries
        self.lr_controller = lr_controller
        # timm's create_scheduler_v2 may extend training (cooldown epochs);
        # see optim.scheduled_epochs
        self.num_epochs = num_epochs if num_epochs is not None else args.epochs
        self.global_step = 0

    def _snapshot_state(self):
        """State as the saver will read it. Cross-host-sharded leaves
        (multi-host TP/ZeRO-1) re-replicate via a collective — which is why
        this MUST run on every process, before the process-0-gated saver
        (checkpoint.gather_for_save; a process-0-only gather deadlocks).
        Single-process / replicated state: a no-op leaf scan."""
        from mirror_tpu.train.checkpoint import gather_for_save

        return gather_for_save(self.state)

    def train_one_epoch(self, epoch: int) -> Dict[str, float]:
        args = self.args
        meters: Dict[str, AverageMeter] = {}
        samples_m = AverageMeter()
        self.train_loader.set_epoch(epoch)
        num_batches = len(self.train_loader)
        end = time.time()
        # Exact epoch means without host syncs: every step's metric dict is
        # summed into a device-side accumulator by a tiny jitted add (async
        # dispatch, no pull), read back ONCE at epoch end. The reference
        # averages every batch (train_mirror.py:1296-1333); the interval
        # meters below only feed the console line. Train batches are
        # fixed-size (drop_last), so the unweighted mean is exact.
        metric_acc, acc_count = None, 0

        for batch_idx, host_batch in enumerate(self.train_loader):
            if getattr(self, "_stop_requested", False):
                _logger.warning(
                    "preemption: stopping epoch %d at batch %d", epoch,
                    batch_idx,
                )
                break
            valid = host_batch.pop("valid", None)
            batch = shard_batch(self.mesh, host_batch)
            step_rng = jax.random.fold_in(self.rng, self.global_step)
            self.state, metrics = self.train_step(self.state, batch, step_rng)
            self.global_step += 1
            metric_acc = (
                metrics if metric_acc is None
                else _metric_add(metric_acc, metrics)
            )
            acc_count += 1
            if getattr(args, "synchronize_step", False):
                # accurate per-step timing (ref train_mirror.py:1286-1287,
                # torch.cuda.synchronize): pull one scalar to host — on this
                # platform block_until_ready can return early through the
                # async tunnel, a host transfer cannot
                float(metrics["loss"])

            if (
                batch_idx % args.log_interval == 0
                or batch_idx == num_batches - 1
            ):
                # pulling metrics to host synchronizes the step. watch/*
                # keys (per-leaf --wandb-watch stats — hundreds of scalars)
                # reach wandb via the once-per-epoch accumulator pull only;
                # pulling them here would stall the loop one RPC per leaf.
                metrics = {
                    k: float(v) for k, v in metrics.items()
                    if not k.startswith("watch/")
                }
                if self.lr_controller is not None:
                    # plateau: the live lr is the controller's, not the
                    # (identity) schedule the step function sees; applied_lr
                    # includes --lr-noise (what the optimizer actually uses)
                    metrics["lr"] = self.lr_controller.applied_lr
                bs = next(iter(host_batch.values())).shape[0]
                dt = time.time() - end
                samples_m.update(bs / max(dt, 1e-9))
                for k, v in metrics.items():
                    meters.setdefault(k, AverageMeter()).update(v, bs)
                _logger.info(
                    "Train: %d [%4d/%d] Loss: %.4g (%.4g)  %s %.1f samples/s",
                    epoch, batch_idx, num_batches,
                    metrics.get("loss", float("nan")),
                    meters["loss"].avg if "loss" in meters else float("nan"),
                    " ".join(
                        f"{k}: {v:.4g}" for k, v in metrics.items()
                        if k != "loss"
                    ),
                    samples_m.val,
                )
            if (
                args.recovery_interval
                and (batch_idx + 1) % args.recovery_interval == 0
            ):
                # _snapshot_state OUTSIDE the saver gate: on multi-host it is
                # a collective every process must enter (saver is process-0)
                snap = self._snapshot_state()
                if self.saver is not None:
                    self.saver.save_recovery(snap, epoch, batch_idx)
            end = time.time()

        if metric_acc is None:
            return {}
        sums = jax.device_get(metric_acc)  # single host pull per epoch
        epoch_metrics = {k: float(v) / acc_count for k, v in sums.items()}
        if self.lr_controller is not None:
            # plateau mode: the step's (identity-schedule) lr is not the
            # applied one — report the controller's noised applied value,
            # like the interval line
            epoch_metrics["lr"] = self.lr_controller.applied_lr
        return epoch_metrics

    def _init_wandb(self):
        if not getattr(self.args, "log_wandb", False):
            return None
        if jax.process_index() != 0:
            # multi-host: one wandb run, owned by process 0 (the reference
            # gates on rank 0, train_mirror.py:917-950); out_dir/saver are
            # already process-0-only
            return None
        try:
            import wandb
        except ImportError:
            _logger.warning("wandb requested but not installed; skipping")
            return None
        return wandb.init(
            project=getattr(self.args, "wandb_project", "MIRROR"),
            name=os.path.basename(self.out_dir) if self.out_dir else None,
            config=vars(self.args),
        )

    def run(self) -> Dict[str, float]:
        args = self.args
        best_metric, best_epoch = None, None
        # Preemption-safe training: on SIGTERM (the signal preemptible TPU
        # VMs get, typically with a ~30 s grace window) finish the current
        # batch, write a synchronous recovery checkpoint, and exit cleanly;
        # the launchers' retry-with-resume then restarts from it.
        import signal

        self._stop_requested = False

        def _on_term(signum, frame):
            self._stop_requested = True
            _logger.warning(
                "signal %d received: will checkpoint and stop at the next "
                "batch boundary", signum,
            )

        old_term = None
        try:
            old_term = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:
            pass  # not the main thread (e.g. a test driving run() directly)
        try:
            return self._run_epochs(args, best_metric, best_epoch)
        finally:
            # restore on EVERY exit path (incl. exceptions): a stale handler
            # pointing at a dead harness would swallow later SIGTERMs
            if old_term is not None:
                signal.signal(signal.SIGTERM, old_term)
            # drain an in-flight async checkpoint write on exception paths
            # too — interpreter exit would kill the daemon writer mid-file
            # (the normal path drains inside _run_epochs, which re-raises
            # write failures; here swallow-with-log so a save error never
            # masks the original exception)
            if self.saver is not None:
                try:
                    self.saver.wait()
                except Exception:
                    _logger.exception("checkpoint write failed during shutdown")

    def _run_epochs(self, args, best_metric, best_epoch):
        start_epoch = getattr(args, "start_epoch", None) or 0
        summary_path = (
            os.path.join(self.out_dir, "summary.csv") if self.out_dir else None
        )
        wandb_run = self._init_wandb()
        profile_dir = (
            os.path.join(self.out_dir, "profile")
            if self.out_dir and getattr(args, "profile", False)
            else None
        )
        for epoch in range(start_epoch, self.num_epochs):
            t0 = time.time()
            if profile_dir and epoch == start_epoch + 1:
                # trace the second epoch (first is compile-heavy)
                with jax.profiler.trace(profile_dir):
                    train_metrics = self.train_one_epoch(epoch)
                _logger.info("profiler trace written to %s", profile_dir)
            else:
                train_metrics = self.train_one_epoch(epoch)
            if self._stop_requested:
                # grace windows are short: skip eval/summary, just persist
                snap = self._snapshot_state()  # all-process (see above)
                if self.saver is not None:
                    self.saver.save_recovery(snap, epoch, -1)
                    self.saver.wait()  # make the recovery write SYNCHRONOUS
                    _logger.warning(
                        "preemption: recovery checkpoint written during "
                        "epoch %d; exiting", epoch,
                    )
                break
            eval_metrics = None
            if self.eval_fn is not None:
                eval_metrics = self.eval_fn(self.state, epoch, self.rng)
                _logger.info(
                    "Eval: %d  %s",
                    epoch,
                    " ".join(f"{k}: {v:.4f}" for k, v in eval_metrics.items()),
                )
                # validate the EMA shadow weights alongside, like the
                # reference (train_mirror.py:1022-1037)
                if self.state.ema_params is not None:
                    ema_metrics = self.eval_fn(
                        self.state.replace(params=self.state.ema_params),
                        epoch, self.rng,
                    )
                    eval_metrics.update(
                        {f"ema_{k}": v for k, v in ema_metrics.items()}
                    )
            # per-leaf wandb.watch stats (--wandb-watch) ride the metric
            # accumulator but belong to wandb only — summary.csv stays the
            # reference-shaped epoch table
            watch_metrics = {
                k: v for k, v in train_metrics.items()
                if k.startswith("watch/")
            }
            train_metrics = {
                k: v for k, v in train_metrics.items()
                if not k.startswith("watch/")
            }
            if summary_path:
                update_summary(
                    epoch, train_metrics, eval_metrics, summary_path,
                )
            if wandb_run is not None:
                payload = {f"train_{k}": v for k, v in train_metrics.items()}
                payload.update(watch_metrics)
                if eval_metrics:
                    payload.update({f"eval_{k}": v for k, v in eval_metrics.items()})
                wandb_run.log(payload, step=epoch)
            metric_source = eval_metrics or train_metrics
            metric_val = metric_source.get(self.eval_metric)
            # the reference selects checkpoints by the EMA model's metric
            # when model_ema is on (train_mirror.py:1022-1037 swaps in the
            # EMA eval metrics before the saver)
            if (
                self.state.ema_params is not None
                and eval_metrics
                and f"ema_{self.eval_metric}" in eval_metrics
            ):
                metric_val = eval_metrics[f"ema_{self.eval_metric}"]
            if metric_val is not None and np.isnan(metric_val):
                # e.g. a c-index over an all-censored early val fold: a NaN
                # must not poison best-checkpoint ranking or plateau logic
                _logger.warning(
                    "eval metric %s is NaN at epoch %d; skipping ranking",
                    self.eval_metric, epoch,
                )
                metric_val = None
            if self.lr_controller is not None:
                # metric-driven (plateau) LR step at the epoch boundary, like
                # the reference's lr_scheduler.step(epoch+1, eval_metric)
                self.state = self.lr_controller.step_epoch(
                    self.state, epoch, metric_val
                )
                _logger.info(
                    "Plateau LR after epoch %d: %g", epoch,
                    self.lr_controller.applied_lr,
                )
            snap = self._snapshot_state()  # all-process (multi-host TP/ZeRO)
            if self.saver is not None:
                # metric None (e.g. --no-val downstream runs, NaN epochs)
                # writes only the rolling ``last`` (no per-epoch file: those
                # would never be pruned by best-k ranking)
                best_metric, best_epoch = self.saver.save_checkpoint(
                    snap, epoch, metric_val
                )
            elif metric_val is not None and not np.isnan(metric_val):
                better = best_metric is None or (
                    metric_val < best_metric
                    if self.decreasing_metric
                    else metric_val > best_metric
                )
                if better:
                    best_metric, best_epoch = metric_val, epoch
            _logger.info("Epoch %d done in %.1fs", epoch, time.time() - t0)

        if self.saver is not None:
            self.saver.wait()  # drain any in-flight async checkpoint write
        results = {
            "best_metric": best_metric,
            "best_epoch": best_epoch,
            "metric_name": self.eval_metric,
        }
        if self._stop_requested:
            results["preempted"] = True
        if wandb_run is not None:
            wandb_run.summary.update(results)
            wandb_run.finish()
        # stdout contract (reference prints --result; tests parse it)
        print(f"--result\n{json.dumps(results, indent=4)}")  # lint: allow-print
        return results


def common_setup(args, task: str):
    """Logging, seeding, mesh. Returns (root_rng, mesh, out_dir).

    MIRROR_PLATFORM=cpu|tpu forces the JAX backend — needed because the axon
    TPU plugin ignores the JAX_PLATFORMS env var (launchers use this to pin
    subprocess jobs)."""
    from mirror_tpu.utils import apply_forced_platform

    device = getattr(args, "device", None)
    if device and device.split(":")[0] == "cpu":
        # --device cpu is honored (the reference's --device selects the
        # torch device, ref train_mirror.py:655); any other non-default
        # value has no TPU meaning and is warned about below
        jax.config.update("jax_platforms", "cpu")
    elif device not in (None, "tpu"):
        _logger.warning(
            "Ignoring --device=%r (no TPU meaning; use 'cpu' to force the "
            "CPU backend)", device,
        )
    apply_forced_platform()  # MIRROR_PLATFORM outranks --device (launchers)
    setup_default_logging()
    from mirror_tpu.parallel.distributed import maybe_initialize
    from mirror_tpu.utils import random_seed

    # multi-host rendezvous (torchrun analogue) BEFORE any backend use:
    # after this jax.devices() spans every host
    maybe_initialize(args)
    rng = random_seed(args.seed)
    mesh = create_mesh(model_parallel=getattr(args, "model_parallel", 1))
    # register the mesh with the Pallas layer: on >1 device every kernel
    # entry point shard_maps itself over the batch (Mosaic custom calls
    # cannot be GSPMD-partitioned under plain jit — ops/_common.spmd_wrap)
    from mirror_tpu.ops._common import set_spmd_mesh

    set_spmd_mesh(mesh)
    _logger.info(
        "MIRROR-TPU %s: process %d/%d, %d device(s), mesh %s", task,
        jax.process_index(), jax.process_count(), len(jax.devices()),
        dict(zip(mesh.axis_names, mesh.devices.shape)),
    )
    # only process 0 owns the run directory (checkpoints, summary.csv,
    # wandb): the reference gates the same way on rank 0
    # (train_mirror.py:917-950); metrics are identical on every process
    out_dir = setup_output_dir(args, task) if jax.process_index() == 0 else None
    if out_dir:
        import yaml

        with open(os.path.join(out_dir, "args.yaml"), "w") as f:
            f.write(yaml.safe_dump(vars(args), default_flow_style=False))
    return rng, mesh, out_dir
