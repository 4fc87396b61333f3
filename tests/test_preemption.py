"""Preemption safety: SIGTERM during training must checkpoint and exit 0
(the signal preemptible TPU VMs receive; the launchers' retry-with-resume
restarts from the recovery checkpoint)."""

import glob
import os
import signal
import subprocess
import sys
import time

import pytest
import yaml

from mirror_tpu.data import make_synthetic_cohort

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_sigterm_writes_recovery_and_exits_clean(tmp_path):
    cohort = make_synthetic_cohort(
        str(tmp_path / "cohort"), n_patients=12, feature_dim=32, rna_dim=96,
        num_folds=2,
    )
    out = str(tmp_path / "out")
    cfg = dict(
        wsi_feature_dir=cohort["feature_dir"],
        rna_feature_csv=cohort["rna_csv"],
        split_dir=cohort["splits_dir"],
        num_wsi_feature_tokens=16,
        batch_size=8,  # conftest exports 8 virtual devices to subprocesses
        epochs=500,  # far more than the grace period allows
        amp=False,
        output=out,
        experiment="pre",
        model_kwargs=dict(
            wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48,
            rna_mlp_ratio=2.0, wsi_num_tokens=16, num_prototypes=8,
            style_mlp_hidden_dim=16, style_mlp_out_dim=12, style_latent_dim=6,
        ),
    )
    cfg_path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    env = dict(os.environ, MIRROR_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "train_mirror.py"),
         "--config", cfg_path, "--fold-nb", "0"],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    run_dir = os.path.join(out, "pretrain", "pre")
    # wait until training is demonstrably under way (first epoch summary)
    deadline = time.time() + 300
    while time.time() < deadline:
        if glob.glob(os.path.join(run_dir, "summary.csv")):
            break
        if proc.poll() is not None:
            break
        time.sleep(1.0)
    assert proc.poll() is None, proc.stdout.read()

    proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, stdout[-2000:]
    assert '"preempted": true' in stdout, stdout[-2000:]
    assert glob.glob(os.path.join(run_dir, "recovery.*")), (
        os.listdir(run_dir), stdout[-1000:]
    )
    # and the recovery checkpoint resumes
    payload_files = glob.glob(os.path.join(run_dir, "recovery.*"))
    from mirror_tpu.train.checkpoint import load_checkpoint_file

    payload = load_checkpoint_file(payload_files[0])
    assert "state_dict" in payload
