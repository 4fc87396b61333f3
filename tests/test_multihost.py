"""Multi-host SPMD: per-process loader sharding + global-batch assembly.

The reference's multi-node path is torchrun + DistributedSampler
(/root/reference/scripts/run_train_mirror.sh:62-68,
/root/reference/train_mirror.py:849-852).  Here the loader shards each
GLOBAL batch into per-process blocks from a shared-seed permutation, so the
assembled global batch is IDENTICAL to the single-process batch — verified
directly below, and end-to-end by a real two-process jax.distributed run
(Gloo CPU collectives) in the slow test.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from mirror_tpu.data.loader import Loader
from mirror_tpu.parallel.distributed import local_block


class _ArangeDS:
    """Items carry their own index so batches reveal the permutation."""

    def __init__(self, n=19, with_labels=False):
        self.n = n
        self.with_labels = with_labels

    def __len__(self):
        return self.n

    def get_label(self, i):
        return i % 2

    def __getitem__(self, i, rng=None):
        out = {"x": np.full((3,), float(i), np.float32)}
        if rng is not None:
            # exercises the per-item seed plumbing (token resampling analogue)
            out["draw"] = np.float32(rng.uniform())
        if self.with_labels:
            out["label"] = np.int32(self.get_label(i))
        return out


def _epoch(loader, epoch=0):
    loader.set_epoch(epoch)
    return list(loader)


@pytest.mark.parametrize("pc", [2, 4])
@pytest.mark.parametrize("weighted", [False, True])
def test_blocked_shards_reassemble_single_process_batches(pc, weighted):
    ds = _ArangeDS(19, with_labels=weighted)
    kw = dict(batch_size=8, shuffle=True, drop_last=True, seed=11,
              prefetch=0, use_native=False, weighted=weighted)
    ref = _epoch(Loader(ds, process_index=0, process_count=1, **kw))
    shards = [
        _epoch(Loader(ds, process_index=p, process_count=pc, **kw))
        for p in range(pc)
    ]
    assert all(len(s) == len(ref) for s in shards)
    for b, ref_batch in enumerate(ref):
        for key in ref_batch:
            gathered = np.concatenate([shards[p][b][key] for p in range(pc)])
            np.testing.assert_array_equal(gathered, ref_batch[key], err_msg=key)


def test_blocked_shards_cover_eval_with_padding():
    ds = _ArangeDS(10)
    kw = dict(batch_size=8, shuffle=False, drop_last=False, pad_last=True,
              seed=0, prefetch=0, use_native=False)
    ref = _epoch(Loader(ds, **kw))
    shards = [_epoch(Loader(ds, process_index=p, process_count=2, **kw))
              for p in range(2)]
    for b, ref_batch in enumerate(ref):
        for key in ref_batch:  # includes the tail "valid" mask
            gathered = np.concatenate([shards[p][b][key] for p in range(2)])
            np.testing.assert_array_equal(gathered, ref_batch[key], err_msg=key)


def test_blocked_shards_partition_valid_rows():
    ds = _ArangeDS(10)
    kw = dict(batch_size=8, shuffle=False, drop_last=False, pad_last=True,
              seed=0, prefetch=0, use_native=False)
    shards = [_epoch(Loader(ds, process_index=p, process_count=2, **kw))
              for p in range(2)]
    seen = np.concatenate(
        [b["x"][b["valid"] > 0][:, 0] for s in shards for b in s]
    )
    assert sorted(seen.tolist()) == list(np.arange(10.0))


def test_local_block_helper():
    chunk = np.arange(8)
    np.testing.assert_array_equal(local_block(chunk, 0, 4), [0, 1])
    np.testing.assert_array_equal(local_block(chunk, 3, 4), [6, 7])
    full = np.concatenate([local_block(chunk, p, 4) for p in range(4)])
    np.testing.assert_array_equal(full, chunk)


def test_uneven_tail_without_padding_rejected():
    ds = _ArangeDS(9)
    loader = Loader(ds, batch_size=4, shuffle=False, drop_last=False,
                    prefetch=0, use_native=False, process_index=0,
                    process_count=2)
    with pytest.raises(ValueError, match="tail batch"):
        list(loader)


def test_batch_size_must_split_over_processes():
    with pytest.raises(AssertionError):
        Loader(_ArangeDS(8), batch_size=6, process_index=0, process_count=4,
               use_native=False)


_TWO_PROC_SCRIPT = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["MIRROR_COORDINATOR"] = f"localhost:{port}"
os.environ["MIRROR_NUM_PROCESSES"] = "2"
os.environ["MIRROR_PROCESS_ID"] = str(proc_id)

import numpy as np
import jax.numpy as jnp
from mirror_tpu.parallel import (
    create_mesh, maybe_initialize, shard_batch, replicate, allgather_rows,
    host_local_rows,
)
from mirror_tpu.data.loader import Loader

assert maybe_initialize()
assert jax.process_count() == 2 and jax.device_count() == 4
mesh = create_mesh()

class DS:
    def __len__(self):
        return 16
    def __getitem__(self, i, rng=None):
        return {"x": np.full((3,), float(i), np.float32)}

# loader auto-resolves process_index/count from the live runtime
loader = Loader(DS(), batch_size=8, shuffle=True, drop_last=True, seed=5,
                prefetch=0, use_native=False)
loader.set_epoch(0)
local_batches = list(loader)
assert local_batches[0]["x"].shape == (4, 3)  # half the global batch

# single-process reference epoch (pure host math, same seed)
ref = Loader(DS(), batch_size=8, shuffle=True, drop_last=True, seed=5,
             prefetch=0, use_native=False, process_index=0, process_count=1)
ref.set_epoch(0)
ref_batches = list(ref)

for lb, rb in zip(local_batches, ref_batches):
    lb.pop("valid"); valid = rb.pop("valid")
    g = shard_batch(mesh, lb)  # make_array_from_process_local_data path
    # global device array == the single-process batch, row for row
    gathered = allgather_rows(host_local_rows(mesh, g["x"]))
    np.testing.assert_array_equal(gathered, rb["x"])
    # a cross-process reduction over the global batch
    total = float(jax.jit(lambda t: jnp.sum(t["x"]))(g))
    assert total == float(rb["x"].sum())

# replicated state works across hosts
state = replicate(mesh, {"w": np.arange(4.0, dtype=np.float32)})
out = float(jax.jit(lambda s, t: jnp.sum(s["w"]) + jnp.sum(t["x"]))(
    state, shard_batch(mesh, local_batches[-1])))

# tensor-parallel state across hosts: a (data=2, model=2) mesh spanning both
# processes, an "mlp/fc1" kernel column-sharded over "model" -> the leaf is
# NOT fully addressable per process. The save protocol: gather_for_save on
# EVERY process (it is a collective), then _to_host reads locally; calling
# _to_host directly on the sharded leaf must raise the deadlock guard
# instead of hanging a process-0-only collective.
from mirror_tpu.parallel import shard_state
from mirror_tpu.train.checkpoint import _to_host, gather_for_save

mesh_tp = create_mesh(model_parallel=2)
host_tree = {"mlp": {"fc1": {"kernel":
    np.arange(24.0, dtype=np.float32).reshape(3, 8)}}}
tp_tree = shard_state(mesh_tp, host_tree)
leaf = tp_tree["mlp"]["fc1"]["kernel"]
assert "model" in str(leaf.sharding.spec), leaf.sharding
assert not leaf.is_fully_addressable
try:
    _to_host(tp_tree)
    raise SystemExit("expected the cross-host _to_host guard to raise")
except RuntimeError as e:
    assert "gather_for_save" in str(e), e
gathered = gather_for_save(tp_tree)  # collective: BOTH processes run this
np.testing.assert_array_equal(
    _to_host(gathered)["mlp"]["fc1"]["kernel"],
    host_tree["mlp"]["fc1"]["kernel"],
)
y = jax.jit(lambda t: jnp.sum(t["mlp"]["fc1"]["kernel"] ** 2))(tp_tree)
assert float(y) == float((host_tree["mlp"]["fc1"]["kernel"] ** 2).sum())

print("TWO_PROC_OK", proc_id, out, flush=True)
"""


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    """Full train_mirror CLI across TWO jax processes (run_distributed, the
    torchrun analogue) vs the same run single-process on the same total
    device count: the blocked loader sharding makes the global batches
    identical, so the final train loss must agree to float tolerance."""
    import json
    import re

    import yaml

    from mirror_tpu.data.synthetic import make_synthetic_cohort
    from mirror_tpu.tools.launcher import run_distributed

    cohort = make_synthetic_cohort(
        str(tmp_path / "cohort"), n_patients=12, feature_dim=32, rna_dim=96,
        num_folds=4,
    )
    cfg = str(tmp_path / "cfg.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(dict(
            wsi_feature_dir=cohort["feature_dir"],
            rna_feature_csv=cohort["rna_csv"],
            split_dir=cohort["splits_dir"],
            num_wsi_feature_tokens=16, batch_size=8, epochs=1, lr=1e-4,
            amp=False, log_interval=1,
            model_kwargs=dict(
                wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48,
                wsi_num_tokens=16, rna_mlp_ratio=2.0, num_prototypes=24,
                style_mlp_hidden_dim=24, style_mlp_out_dim=16,
                style_latent_dim=8,
            ),
        ), f)

    def summary_loss(stdout: str) -> float:
        m = re.search(r"--result\n(\{.*?\n\})", stdout, re.S)
        assert m, stdout[-2000:]
        return json.loads(m.group(1))["best_metric"]

    base_env = {
        "MIRROR_PLATFORM": "cpu",
        "PYTHONPATH": "/root/repo",
    }
    cmd = [sys.executable, "train_mirror.py", "--config", cfg, "--fold-nb",
           "0", "--output", "", "--workers", "0"]

    # single-process reference on 4 virtual devices
    env1 = {**{k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
            **base_env,
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    ref = subprocess.run(cmd, env=env1, cwd="/root/repo",
                         capture_output=True, text=True, timeout=600)
    assert ref.returncode == 0, ref.stdout + ref.stderr
    ref_loss = summary_loss(ref.stdout)

    # two processes x 2 devices = the same 4-device global mesh
    out0 = str(tmp_path / "proc0.json")
    env2 = {"XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            **base_env}
    # run via run_distributed with per-process stdout captured through a
    # wrapper that tees --result into a file
    wrapper = tmp_path / "wrap.py"
    wrapper.write_text(
        "import os, subprocess, sys\n"
        "p = subprocess.run(sys.argv[2:], capture_output=True, text=True)\n"
        "sys.stdout.write(p.stdout); sys.stderr.write(p.stderr)\n"
        "pid = os.environ.get('MIRROR_PROCESS_ID', '0')\n"
        "open(sys.argv[1] + pid, 'w').write(p.stdout)\n"
        "sys.exit(p.returncode)\n"
    )
    rcs = run_distributed(
        [sys.executable, str(wrapper), out0] + cmd,
        num_processes=2, coordinator="localhost:12427",
        env_extra={**{k: v for k, v in os.environ.items()
                      if k != "XLA_FLAGS"}, **env2},
    )
    assert rcs == [0, 0], rcs
    two_loss = summary_loss(open(out0 + "0").read())
    # both processes report identical metrics
    assert summary_loss(open(out0 + "1").read()) == two_loss
    assert two_loss == pytest.approx(ref_loss, rel=2e-4), (two_loss, ref_loss)


@pytest.mark.slow
def test_two_process_cpu_smoke(tmp_path):
    """Real jax.distributed over two processes (Gloo CPU collectives):
    rendezvous via MIRROR_* envs, per-process loader blocks, global-batch
    assembly, cross-process reductions, replicated state."""
    script = tmp_path / "two_proc.py"
    script.write_text(_TWO_PROC_SCRIPT)
    port = "12411"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "TWO_PROC_OK" in out, out
    # both processes computed the same replicated+global reduction
    vals = sorted(line.split()[-1] for out in outs
                  for line in out.splitlines() if "TWO_PROC_OK" in line)
    assert vals[0] == vals[1]
