"""Job-level orchestration over TPU slots.

Rebuild of the reference's launcher machinery
(/root/reference/tools/pretrain_job_launcher.py:38-147,
downstream_tasks_evaluator.py:69-263): a thread-safe deque of accelerator
slots, a thread pool sized slots x virtual_factor, and subprocess jobs with
the slot pinned into the child environment.

On GPU the reference pins ``CUDA_VISIBLE_DEVICES``; here each slot names a
TPU visibility mask exported as ``TPU_VISIBLE_CHIPS``/``JAX_PLATFORMS``
(single-host) — with one chip, jobs simply serialize through the one slot,
which is the correct behavior for fold sweeps on a single device.
"""

import logging
import subprocess
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

_logger = logging.getLogger("launcher")


class TPUResourceManager:
    """Thread-safe pool of accelerator slots (ref GPUResourceManager,
    pretrain_job_launcher.py:38-80)."""

    def __init__(self, slots: Sequence[str], virtual_factor: int = 1) -> None:
        self._slots = deque(list(slots) * max(virtual_factor, 1))
        self._cond = threading.Condition()
        self.total = len(self._slots)

    def acquire(self) -> str:
        with self._cond:
            while not self._slots:
                self._cond.wait()
            slot = self._slots.popleft()
            _logger.info("acquired slot %s (%d free)", slot, len(self._slots))
            return slot

    def release(self, slot: str) -> None:
        with self._cond:
            self._slots.append(slot)
            _logger.info("released slot %s (%d free)", slot, len(self._slots))
            self._cond.notify()


def default_slot_env(slot: str) -> dict:
    """Per-slot child environment, the TPU analogue of the reference's
    ``CUDA_VISIBLE_DEVICES`` pinning (pretrain_job_launcher.py:86):

    - a numeric slot pins that chip via ``TPU_VISIBLE_CHIPS`` (libtpu
      visibility mask) so parallel fold jobs on a multi-chip host don't all
      grab every chip;
    - slot ``"cpu"`` forces the CPU backend via ``MIRROR_PLATFORM`` (the
      axon TPU plugin ignores ``JAX_PLATFORMS``; common_setup applies
      MIRROR_PLATFORM through the config API).
    """
    if slot == "cpu":
        return {"MIRROR_PLATFORM": "cpu"}
    return {
        "TPU_VISIBLE_CHIPS": str(slot),
        # bounds for a single-chip process on a multi-chip host
        "TPU_CHIPS_PER_PROCESS_BOUNDS": "1,1,1",
        "TPU_PROCESS_BOUNDS": "1,1,1",
    }


def run_distributed(
    cmd: List[str],
    num_processes: int,
    coordinator: str = "localhost:12421",
    env_extra: Optional[dict] = None,
) -> List[int]:
    """torchrun analogue (ref scripts/run_train_mirror.sh:62-72): spawn
    ``num_processes`` replicas of ``cmd`` with the MIRROR_* rendezvous envs
    set; ``parallel/distributed.maybe_initialize`` picks them up and joins
    the processes into one SPMD program. Real TPU pods start one process per
    host through the pod runtime (where ``--distributed`` alone suffices);
    this local runner serves CPU simulation and multi-process development.
    Returns the exit codes."""
    import os

    procs = []
    for i in range(num_processes):
        env = dict(os.environ)
        env.update(env_extra or {})
        env.update(
            MIRROR_COORDINATOR=coordinator,
            MIRROR_NUM_PROCESSES=str(num_processes),
            MIRROR_PROCESS_ID=str(i),
        )
        _logger.info("distributed process %d/%d: %s", i, num_processes,
                     " ".join(map(str, cmd)))
        procs.append(subprocess.Popen([str(c) for c in cmd], env=env))
    return [p.wait() for p in procs]


def run_jobs(
    commands: List[List[str]],
    slots: Optional[Sequence[str]] = None,
    virtual_factor: int = 1,
    env_for_slot=default_slot_env,
) -> List[int]:
    """Run each command on an acquired slot; returns exit codes in order.
    Failures are logged and do not stop the pool (ref
    pretrain_job_launcher.py:141-145). Each child gets the slot pinned into
    its environment via ``env_for_slot`` (default: ``default_slot_env``)."""
    import os

    slots = list(slots) if slots else ["0"]
    manager = TPUResourceManager(slots, virtual_factor)
    results: List[int] = [None] * len(commands)  # type: ignore[list-item]

    def run_one(idx: int, cmd: List[str]) -> None:
        slot = manager.acquire()
        try:
            env = dict(os.environ)
            if env_for_slot is not None:
                env.update(env_for_slot(slot))
            _logger.info("job %d starting: %s", idx, " ".join(map(str, cmd)))
            proc = subprocess.run([str(c) for c in cmd], env=env)
            results[idx] = proc.returncode
            if proc.returncode != 0:
                _logger.error("job %d failed with code %d", idx, proc.returncode)
        except Exception:
            _logger.exception("job %d crashed", idx)
            results[idx] = -1
        finally:
            manager.release(slot)

    with ThreadPoolExecutor(max_workers=manager.total) as pool:
        futures = [pool.submit(run_one, i, c) for i, c in enumerate(commands)]
        for f in futures:
            f.result()
    return results
