"""Production-path throughput: the FULL harness epoch loop vs step-only bench.

VERDICT r4 #7: bench.py measures the bare train step (30 steps scanned in
one jit). This artifact runs the PRODUCTION path — TrainHarness.train_one_
epoch with its loader iteration, shard_batch, donated+pinned jit, device-
side metric accumulation, interval logging, and the one host pull per epoch
— at the same flagship dims (B=64, 2048x768 tokens, rna 10234, bf16 Pallas)
on the real chip, and reports the device-occupancy fraction:

    occupancy = (steps * step_only_time) / harness_epoch_wall_time

It should be ~1.0: the harness dispatches steps asynchronously and only
syncs once per epoch (+ the interval log pulls), so the epoch loop adds no
serialization (ref train_mirror.py:1346-1347 pays a sync every step).

Two honesty notes recorded in the JSON:
- batches are DEVICE-RESIDENT (created on-chip): on this rig host->device
  rides a ~4-20 MB/s tunnel that no real v5e host pays (402 MB/batch would
  swamp everything); a real host overlaps H2D with compute via the loader's
  prefetch.
- the host-side loader assembly ceiling is measured separately on a real
  .npy cohort at production dims (this rig has 1 CPU core; v5e hosts have
  many).

Prints one JSON line and writes harness_loop_r5.json.
Run on the chip: python scripts/bench_harness_loop.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mirror_tpu.losses import MirrorLossWeights
from mirror_tpu.parallel import create_mesh, shard_state
from mirror_tpu.registry import create_model
from mirror_tpu.train.harness import TrainHarness
from mirror_tpu.train.optim import make_optimizer, make_schedule
from mirror_tpu.train.state import create_train_state
from mirror_tpu.train.steps import make_mirror_train_step

BATCH = 64
TOKENS = 2048
STEPS_PER_EPOCH = 30
N_DISTINCT_BATCHES = 4


class _Args:
    opt = "adam"
    opt_eps = None
    opt_betas = None
    momentum = 0.9
    weight_decay = 0.0
    clip_grad = None
    clip_mode = "norm"
    opt_kwargs = {}
    use_sched = False
    grad_accum_steps = 1
    # harness knobs (production defaults)
    log_interval = 50
    synchronize_step = False
    recovery_interval = 0
    epochs = 3
    output = None
    experiment = None
    model = "mirror"
    fold_nb = 0
    log_wandb = False


class _ResidentLoader:
    """Yields pre-placed device batches — isolates the harness loop from the
    tunnel's H2D (see module docstring)."""

    def __init__(self, batches, n_steps):
        self.batches = batches
        self.n_steps = n_steps

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return self.n_steps

    def __iter__(self):
        for i in range(self.n_steps):
            yield dict(self.batches[i % len(self.batches)])


def build():
    model = create_model(
        "mirror", wsi_embed_dim=768, rna_embed_dim=10234, embed_dim=768,
        wsi_num_tokens=TOKENS, rna_mlp_ratio=4.0, rna_norm_eps=1e-5,
        use_pallas=True, pinv_grad="implicit", dtype="bfloat16",
    )
    schedule = make_schedule(_Args, 10, 2e-5)
    tx = make_optimizer(_Args, schedule)
    step = make_mirror_train_step(
        model, tx, MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)
    )
    key = jax.random.PRNGKey(0)
    wsi = jax.random.normal(key, (BATCH, TOKENS, 768), jnp.float32)
    rna = jax.random.normal(key, (BATCH, 10234), jnp.float32)
    rngs = dict(zip(
        ["params", "dropout", "masking", "style"], jax.random.split(key, 4)
    ))
    params = jax.jit(lambda r, w, x: model.init(r, w, x, 0.75, 0.75, True))(
        rngs, wsi[:2], rna[:2]
    )["params"]
    state = create_train_state(params, tx, model_ema=False)
    return state, step, wsi, rna


def measure_step_only(state, step, wsi, rna, n_steps=15):
    """bench.py's scan trick, in-process, for an apples-to-apples step time."""
    batch = {"wsi": wsi, "rna": rna}

    @jax.jit
    def multi(state, b, rng):
        def body(carry, i):
            st, _ = carry
            st, m = step(st, b, jax.random.fold_in(rng, i))
            return (st, m["loss"]), None

        (state, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(n_steps)
        )
        return state, loss

    state, loss = multi(state, batch, jax.random.PRNGKey(1))
    float(loss)  # warmup
    times = []
    for i in range(3):
        t0 = time.time()
        state, loss = multi(state, batch, jax.random.PRNGKey(2 + i))
        float(loss)
        times.append((time.time() - t0) / n_steps)
    times.sort()
    return times[len(times) // 2]


def measure_harness(state, step, wsi, rna):
    mesh = create_mesh()
    placed = shard_state(mesh, state)
    key = jax.random.PRNGKey(3)
    batches = []
    for i in range(N_DISTINCT_BATCHES):
        k1, k2, key = jax.random.split(key, 3)
        batches.append({
            "wsi": jax.random.normal(k1, (BATCH, TOKENS, 768), jnp.float32),
            "rna": jax.random.normal(k2, (BATCH, 10234), jnp.float32),
        })
        jax.block_until_ready(batches[-1]["wsi"])

    harness = TrainHarness(
        args=_Args, mesh=mesh, state=placed, train_step=step,
        train_loader=_ResidentLoader(batches, STEPS_PER_EPOCH),
        eval_fn=None, saver=None, out_dir=None, rng=jax.random.PRNGKey(4),
    )
    harness.train_one_epoch(0)  # compile epoch
    walls = []
    for epoch in (1, 2):
        t0 = time.time()
        m = harness.train_one_epoch(epoch)
        walls.append(time.time() - t0)
    assert np.isfinite(m["loss"]), m
    walls.sort()
    return walls[0], m


def measure_host_loader():
    """Host-side assembly ceiling: the native .npy loader at production dims
    (2048-token gather per sample) on this rig's single CPU core."""
    from mirror_tpu.data import Loader, PretrainDataset, make_synthetic_cohort

    # TemporaryDirectory: the synthetic cohort is ~0.65 GB of .npy — leaking
    # one per run would fill /tmp on this rig within a few benches
    with tempfile.TemporaryDirectory(prefix="harness_loop_cohort_") as root:
        n_slides = 96
        make_synthetic_cohort(
            root, n_patients=n_slides, feature_dim=768, rna_dim=10234,
            min_tokens=2100, max_tokens=2400, classes=None, seed=0, fmt="npy",
        )
        ds = PretrainDataset(
            os.path.join(root, "features"), os.path.join(root, "rna.csv"),
            num_wsi_feature_tokens=TOKENS,
        )
        loader = Loader(ds, BATCH, shuffle=True, drop_last=True)
        t0 = time.time()
        n = 0
        for b in loader:  # one epoch, host numpy only
            n += b["wsi"].shape[0]
        dt = time.time() - t0
        return n / dt, n


def main():
    state, step, wsi, rna = build()
    step_only = measure_step_only(state, step, wsi, rna)

    # fresh state for the harness (the scan above consumed/advanced a copy;
    # rebuild so the pinned jit sees a cleanly-placed state)
    state2, step2, _, _ = build()
    wall, metrics = measure_harness(state2, step2, wsi, rna)

    loader_rate, loader_n = measure_host_loader()

    harness_rate = STEPS_PER_EPOCH * BATCH / wall
    occupancy = (STEPS_PER_EPOCH * step_only) / wall
    out = {
        "metric": "harness_epoch_loop_throughput",
        "value": round(harness_rate, 2),
        "unit": "samples/sec/chip",
        "step_only_samples_per_sec": round(BATCH / step_only, 2),
        "device_occupancy": round(occupancy, 4),
        "steps_per_epoch": STEPS_PER_EPOCH,
        "epoch_wall_s": round(wall, 3),
        "host_loader_samples_per_sec_1core": round(loader_rate, 1),
        "host_loader_samples_measured": loader_n,
        "caveats": [
            "device-resident batches: this rig's host->device tunnel "
            "(4-20 MB/s) is not a v5e host property; real hosts overlap "
            "H2D via loader prefetch",
            "host loader ceiling measured on 1 CPU core; v5e hosts have "
            "many (the native gather is GIL-free threaded)",
        ],
    }
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "harness_loop_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
