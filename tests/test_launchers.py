"""Job-launcher integration: fold fan-out via subprocesses, checkpoint
discovery, downstream evaluation chaining."""

import os
import subprocess
import sys

import pytest
import yaml

from mirror_tpu.data import make_synthetic_cohort
from mirror_tpu.tools.downstream_tasks_evaluator import find_fold_checkpoint
from mirror_tpu.tools.launcher import TPUResourceManager, run_jobs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = dict(
    wsi_embed_dim=24, rna_embed_dim=48, embed_dim=48, rna_mlp_ratio=2.0,
)


def test_resource_manager_cycles_slots():
    mgr = TPUResourceManager(["a", "b"], virtual_factor=1)
    s1 = mgr.acquire()
    s2 = mgr.acquire()
    assert {s1, s2} == {"a", "b"}
    mgr.release(s1)
    assert mgr.acquire() == s1


def test_run_jobs_reports_failures():
    codes = run_jobs(
        [[sys.executable, "-c", "pass"], [sys.executable, "-c", "raise SystemExit(3)"]],
        slots=["0"],
    )
    assert codes == [0, 3]


def test_run_jobs_pins_distinct_slots_into_child_env(tmp_path):
    """Each child must see ITS slot's chip visibility (the reference pins
    CUDA_VISIBLE_DEVICES per job, pretrain_job_launcher.py:86)."""
    # the sleep guarantees the two pool threads overlap, so both slots are
    # in use simultaneously
    code = (
        "import os,sys,time; time.sleep(0.4); open(sys.argv[1],'w').write("
        "os.environ.get('TPU_VISIBLE_CHIPS','MISSING'))"
    )
    outs = [str(tmp_path / f"env_{i}.txt") for i in range(4)]
    codes = run_jobs(
        [[sys.executable, "-c", code, o] for o in outs],
        slots=["0", "1"],
    )
    assert codes == [0, 0, 0, 0]
    seen = {open(o).read() for o in outs}
    assert "MISSING" not in seen
    assert seen <= {"0", "1"}
    assert len(seen) == 2  # both slots actually pinned


def test_cpu_slot_forces_platform_env(tmp_path):
    code = (
        "import os,sys; open(sys.argv[1],'w').write("
        "os.environ.get('MIRROR_PLATFORM','MISSING'))"
    )
    out = str(tmp_path / "env.txt")
    codes = run_jobs([[sys.executable, "-c", code, out]], slots=["cpu"])
    assert codes == [0]
    assert open(out).read() == "cpu"


@pytest.mark.slow
def test_pretrain_launcher_then_evaluator(tmp_path):
    cohort = make_synthetic_cohort(
        str(tmp_path / "c"), n_patients=8, feature_dim=24, rna_dim=48, num_folds=2
    )
    out_root = str(tmp_path / "runs")
    cfg = dict(
        wsi_feature_dir=cohort["feature_dir"],
        rna_feature_csv=cohort["rna_csv"],
        split_dir=cohort["splits_dir"],
        num_wsi_feature_tokens=16,
        batch_size=4,
        epochs=1,
        lr=1e-4,
        amp=False,
        k=2,
        output=out_root,
        model_kwargs={
            **TINY, "wsi_num_tokens": 16, "num_prototypes": 12,
            "style_mlp_hidden_dim": 16, "style_mlp_out_dim": 12,
            "style_latent_dim": 6,
        },
    )
    cfg_path = str(tmp_path / "pre.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    env = dict(os.environ, JAX_PLATFORMS="")
    proc = subprocess.run(
        [sys.executable, "-m", "mirror_tpu.tools.pretrain_job_launcher",
         "--config", cfg_path, "--k", "2"],
        cwd=REPO, capture_output=True, text=True,
        env=dict(env, PYTHONPATH=REPO, MIRROR_PLATFORM="cpu",
                 XLA_FLAGS="--xla_force_host_platform_device_count=1"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    pretrain_root = os.path.join(out_root, "pretrain")
    for fold in range(2):
        assert find_fold_checkpoint(pretrain_root, fold) is not None

    # downstream evaluator chains the discovered checkpoints
    sub_cfg = dict(
        wsi_feature_dir=cohort["subtype_feature_dir"],
        rna_feature_csv=cohort["rna_csv"],
        split_dir=cohort["splits_dir"],
        classes=cohort["classes"],
        num_classes=2,
        num_wsi_feature_tokens=16,
        batch_size=4,
        epochs=1,
        lr=1e-3,
        amp=False,
        k=2,
        model="mirror_classifier",
        model_kwargs={**TINY, "fusion": "concat"},
    )
    sub_path = str(tmp_path / "sub.yaml")
    yaml.safe_dump(sub_cfg, open(sub_path, "w"))
    proc = subprocess.run(
        [sys.executable, "-m", "mirror_tpu.tools.downstream_tasks_evaluator",
         "--pretrain-root", pretrain_root,
         "--task-configs", f"subtyping:{sub_path}", "--k", "2"],
        cwd=REPO, capture_output=True, text=True,
        env=dict(env, PYTHONPATH=REPO, MIRROR_PLATFORM="cpu",
                 XLA_FLAGS="--xla_force_host_platform_device_count=1"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "--result" in proc.stdout
