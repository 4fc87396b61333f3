"""Two-stage YAML + CLI configuration.

Replicates the reference's config semantics (/root/reference/train_mirror.py:76-88,625-639):
1. a mini-parser consumes ``--config <yaml>``;
2. the YAML keys become argparse defaults;
3. the full parser parses the remaining argv so CLI flags override YAML.

Dest names match the reference YAML templates key-for-key
(configs/{pretrain,subtyping,survival}/mirror.template.yaml) so existing
configs drop in unchanged. GPU-only knobs (amp_impl, fuser, sync_bn, ...)
are accepted and ignored with a warning, keeping the CLI surface stable.

``ParseKwargs`` supports ``--model-kwargs key=value key2=value2`` dict flags
like the reference (train_mirror.py:203,319,511).
"""

import argparse
import ast
import logging
from typing import Any, Dict, Optional, Sequence, Tuple

import yaml

_logger = logging.getLogger(__name__)


class ParseKwargs(argparse.Action):
    def __call__(self, parser, namespace, values, option_string=None):
        kw = dict(getattr(namespace, self.dest) or {})
        for value in values:
            key, _, v = value.partition("=")
            try:
                kw[key] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                kw[key] = str(v)
        setattr(namespace, self.dest, kw)


def _add_common(parser: argparse.ArgumentParser) -> None:
    g = parser.add_argument_group("Dataset")
    g.add_argument("--wsi-feature-dir", type=str, default=None)
    g.add_argument("--rna-feature-csv", type=str, default=None)
    g.add_argument("--split-dir", type=str, default=None)
    g.add_argument("--num-wsi-feature-tokens", type=int, default=2048)
    g.add_argument("--k", type=int, default=5)
    g.add_argument("--fold-nb", type=int, default=0)
    g.add_argument("--cache", action="store_true", default=False)
    g.add_argument("--val", action="store_true", default=True)
    g.add_argument("--no-val", action="store_false", dest="val")

    g = parser.add_argument_group("Model")
    g.add_argument("--model", type=str, default="mirror")
    g.add_argument("--initial-checkpoint", type=str, default="")
    g.add_argument("--resume", type=str, default="")
    g.add_argument("--no-resume-opt", action="store_true", default=False)
    g.add_argument("--ckpt-format", type=str, default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="checkpoint serialization: flax msgpack files "
                        "(default, reference-contract payload) or Orbax "
                        "PyTree directories (production JAX checkpointer); "
                        "loaders auto-detect either format")
    g.add_argument("--batch-size", type=int, default=16)
    g.add_argument("--validation-batch-size", type=int, default=None)
    g.add_argument("--grad-accum-steps", type=int, default=1)
    g.add_argument("--grad-checkpointing", action="store_true", default=False)
    g.add_argument("--model-kwargs", nargs="*", default={}, action=ParseKwargs)
    # default None -> resolved to True on TPU backends, False elsewhere
    # (entry points call resolve_use_pallas); the fused kernels are the
    # measured-faster flagship path (BASELINE.md: 77.6 -> 203.7 samples/s)
    g.add_argument("--use-pallas", action="store_true", default=None,
                   help="fused Pallas TPU kernels (Nystrom attention, "
                        "Moore-Penrose pinv, landmark softmax, res-conv); "
                        "default: on for TPU backends")
    g.add_argument("--no-use-pallas", action="store_false", dest="use_pallas")
    g.add_argument("--pinv-grad", type=str, default="implicit",
                   choices=["exact", "implicit"],
                   help="Nystrom pinv backward. Default 'implicit' (the "
                        "converged implicit-function gradient -Z^T g Z^T): "
                        "+30%% step throughput, validated equivalent by the "
                        "round-3 adoption study (500 steps at production "
                        "dims: per-term losses match to ~1e-3, gradient "
                        "cosine >= 0.9988; PARITY.md [F]). 'exact' "
                        "differentiates through the 6 Moore-Penrose "
                        "iterations (reference-faithful autodiff) for "
                        "strict-parity runs")

    g = parser.add_argument_group("Device")
    g.add_argument("--device", type=str, default="tpu")
    g.add_argument("--distributed", action="store_true", default=False,
                   help="multi-host SPMD: run jax.distributed.initialize() "
                   "(auto-detected on TPU pods; elsewhere set "
                   "MIRROR_COORDINATOR/MIRROR_NUM_PROCESSES/MIRROR_PROCESS_ID"
                   " — the torchrun-rendezvous analogue)")
    g.add_argument("--amp", action="store_true", default=True)
    g.add_argument("--no-amp", action="store_false", dest="amp")
    g.add_argument("--amp-dtype", type=str, default="bfloat16")
    g.add_argument("--contrastive-negatives", type=str, default="local",
                   choices=["global", "local"],
                   help="'local' (default, SURVEY 2.8 parity posture): the "
                        "reference's exact multi-GPU semantics — each chip's "
                        "CE sees only its own shard's negatives. 'global': "
                        "negatives span the global batch (SPMD-natural, more "
                        "negatives per step — a measurably DIFFERENT "
                        "objective on >1 chip: grad cosine ~0.69, alignment "
                        "loss offset ~ln(n_dev); contrastive_study_r5.json). "
                        "Identical on 1 chip.")

    g = parser.add_argument_group("Optimizer")
    g.add_argument("--opt", type=str, default="adam")
    g.add_argument("--opt-eps", type=float, default=None)
    g.add_argument("--opt-betas", type=float, nargs="+", default=None)
    g.add_argument("--momentum", type=float, default=0.9)
    g.add_argument("--weight-decay", type=float, default=0.0)
    g.add_argument("--clip-grad", type=float, default=None)
    g.add_argument("--clip-mode", type=str, default="norm")
    g.add_argument("--layer-decay", type=float, default=None)
    g.add_argument("--opt-kwargs", nargs="*", default={}, action=ParseKwargs)

    g = parser.add_argument_group("Schedule")
    g.add_argument("--use-sched", action="store_true", default=False)
    g.add_argument("--sched", type=str, default="cosine")
    g.add_argument("--sched-on-updates", action="store_true", default=False)
    g.add_argument("--lr", type=float, default=None)
    g.add_argument("--lr-base", type=float, default=0.1)
    g.add_argument("--lr-base-size", type=int, default=256)
    g.add_argument("--lr-base-scale", type=str, default="")
    g.add_argument("--lr-noise", type=float, nargs="+", default=None,
                   help="lr noise on/off epoch fractions (timm: scaled by "
                        "epochs; 1 value = from there on, 2 = window)")
    g.add_argument("--lr-noise-pct", type=float, default=0.67)
    g.add_argument("--lr-noise-std", type=float, default=1.0)
    g.add_argument("--lr-cycle-mul", type=float, default=1.0)
    g.add_argument("--lr-cycle-decay", type=float, default=0.5)
    g.add_argument("--lr-cycle-limit", type=int, default=1)
    g.add_argument("--lr-k-decay", type=float, default=1.0)
    g.add_argument("--min-lr", type=float, default=0.0)
    g.add_argument("--warmup-lr", type=float, default=1e-5)
    g.add_argument("--epochs", type=int, default=100)
    g.add_argument("--start-epoch", type=int, default=None)
    g.add_argument("--decay-milestones", type=int, nargs="+", default=(90, 180, 270))
    g.add_argument("--decay-epochs", type=float, default=90)
    g.add_argument("--warmup-epochs", type=int, default=5)
    g.add_argument("--warmup-prefix", action="store_true", default=False)
    g.add_argument("--cooldown-epochs", type=int, default=0)
    g.add_argument("--patience-epochs", type=int, default=10)
    # "--dr" alias kept for reference command-line compatibility
    # (ref train_mirror.py:493-500)
    g.add_argument("--decay-rate", "--dr", type=float, default=0.1)

    g = parser.add_argument_group("EMA")
    g.add_argument("--model-ema", action="store_true", default=False)
    g.add_argument("--model-ema-decay", type=float, default=0.9998)
    g.add_argument("--model-ema-warmup", action="store_true", default=False)

    g = parser.add_argument_group("Misc")
    g.add_argument("--seed", type=int, default=42)
    # 50 like the reference (train_mirror.py default): pulling metrics to
    # host syncs the step (~30ms tunnel RTT), so logging every step taxes
    # throughput by several percent
    g.add_argument("--log-interval", type=int, default=50)
    g.add_argument("--recovery-interval", type=int, default=0)
    g.add_argument("--checkpoint-hist", type=int, default=5)
    g.add_argument("--workers", type=int, default=4,
                   help="host loader threads (native batch-assembly pool; "
                        "the reference's DataLoader worker count)")
    g.add_argument("--output", type=str, default="")
    g.add_argument("--experiment", type=str, default="")
    g.add_argument("--log-wandb", action="store_true", default=False)
    g.add_argument("--wandb-project", type=str, default="MIRROR")
    g.add_argument("--wandb-watch", action="store_true", default=False,
                   help="per-leaf parameter/gradient stats to wandb — the "
                        "wandb.watch(model) equivalent (ref "
                        "train_mirror.py:940-947); distribution moments "
                        "(norm/mean/std) per leaf instead of histograms so "
                        "the step stays host-sync-free")
    g.add_argument("--synchronize-step", action="store_true", default=False,
                   help="pull a scalar to host every step for accurate "
                        "per-step timing (ref train_mirror.py:1286-1287)")
    g.add_argument("--profile", action="store_true", default=False,
                   help="write a jax.profiler trace of one epoch to the run dir")
    g.add_argument("--model-parallel", type=int, default=1,
                   help="TPU extension: shard the wide GEMMs (RNA embedding, "
                        "retention head, prototypes, block MLPs) over a "
                        "'model' mesh axis of this size (Megatron-style via "
                        "GSPMD param shardings; parallel/tensor_parallel.py). "
                        "Device count must be divisible by it; default 1 = "
                        "pure data parallelism like the reference's DDP")
    g.add_argument("--optimizer-sharding", action="store_true", default=False,
                   help="TPU extension (ZeRO-1): shard optimizer + EMA state "
                        "over the 'data' mesh axis instead of replicating it "
                        "per chip (parallel/tensor_parallel.py::shard_state). "
                        "Frees ~2x param bytes of fp32 Adam moments per chip "
                        "for one update all-gather per step; no effect on a "
                        "single device")

    # GPU/torch-only reference flags: accepted so reference command lines
    # parse unchanged (MIGRATION.md's contract), then dropped with a warning
    # when set to a non-default value (same policy as the YAML-side
    # _IGNORED_KEYS). Literals/types match the reference argparse surface
    # (ref train_mirror.py device/DDP/loader groups).
    g = parser.add_argument_group("Ignored (GPU-only reference surface)")
    g.add_argument("--torchscript", action="store_true", default=False)
    g.add_argument("--torchcompile", nargs="?", type=str, default=None,
                   const="inductor")
    g.add_argument("--fuser", type=str, default="")
    g.add_argument("--fast-norm", action="store_true", default=False)
    g.add_argument("--amp-impl", type=str, default="native")
    g.add_argument("--no-ddp-bb", action="store_true", default=False)
    g.add_argument("--device-modules", type=str, nargs="+", default=None)
    g.add_argument("--local_rank", type=int, default=0)
    g.add_argument("--sync-bn", action="store_true", default=False)
    g.add_argument("--dist-bn", type=str, default="reduce")
    g.add_argument("--pin-mem", action="store_true", default=False)
    g.add_argument("--model-ema-force-cpu", action="store_true", default=False)
    g.add_argument("--worker-seeding", type=str, default="all")
    g.add_argument("--epoch-repeats", type=float, default=0.0)
    g.add_argument("--in-chans", type=int, default=None)



def build_parser(task: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=f"MIRROR-TPU {task}")
    _add_common(parser)
    if task == "pretrain":
        parser.add_argument("--wsi-mask-ratio", type=float, default=0.75)
        parser.add_argument("--rna-mask-ratio", type=float, default=0.75)
        parser.add_argument("--loss", type=str, default="mirror_loss")
        parser.add_argument("--loss-kwargs", nargs="*", default={}, action=ParseKwargs)
        parser.add_argument("--temperature", type=float, default=0.1,
                            help="InfoNCE temperature (train_pretrain path)")
        parser.add_argument("--eval-metric", type=str, default="loss")
    elif task == "subtyping":
        parser.add_argument("--classes", type=str, nargs="+", default=None)
        parser.add_argument("--num-classes", type=int, default=None)
        parser.add_argument("--wsi-feature-only", action="store_true", default=False)
        parser.add_argument("--loss", type=str, default="ce_loss")
        parser.add_argument("--smoothing", type=float, default=0.1)
        parser.add_argument("--init-head", action="store_true", default=False)
        parser.add_argument("--head-init-scale", type=float, default=None)
        parser.add_argument("--head-init-bias", type=float, default=None)
        # "--linear_probe" (underscore) is the literal the reference spells
        # (ref train_subtyping.py:665); kept as an alias
        parser.add_argument("--linear-probe", "--linear_probe",
                            action="store_true", default=False)
        parser.add_argument("--drop-last", action="store_true", default=True)
        parser.add_argument("--no-drop-last", action="store_false", dest="drop_last")
        parser.add_argument("--weighted-sampler", action="store_true", default=False)
        parser.add_argument("--eval-metric", type=str, default="acc")
        parser.add_argument("--eval-metric-average", type=str, default="macro")
    elif task == "survival":
        parser.add_argument("--survival-csv", type=str, default=None)
        parser.add_argument("--num-bins", type=int, default=4)
        parser.add_argument("--num-classes", type=int, default=4)
        parser.add_argument("--wsi-feature-only", action="store_true", default=False)
        parser.add_argument("--loss", type=str, default="nll_surv")
        parser.add_argument("--loss-alpha", type=float, default=0.0)
        parser.add_argument("--init-head", action="store_true", default=False)
        parser.add_argument("--head-init-scale", type=float, default=None)
        parser.add_argument("--head-init-bias", type=float, default=None)
        parser.add_argument("--linear-probe", "--linear_probe",
                            action="store_true", default=False)
        parser.add_argument("--drop-last", action="store_true", default=True)
        parser.add_argument("--no-drop-last", action="store_false", dest="drop_last")
        parser.add_argument("--weighted-sampler", action="store_true", default=False)
        parser.add_argument("--eval-metric", type=str, default="c-index")
    else:
        raise ValueError(f"unknown task {task}")
    return parser


# Reference-surface keys that have no TPU meaning; accepted + dropped.
# epoch_repeats is argparse-only in the reference too (never consumed — the
# map-style datasets bypass timm's create_dataset); in_chans is a timm image
# arg the mirror models kwarg-filter away.
_IGNORED_KEYS = {
    "fuser", "torchscript", "torchcompile", "fast_norm", "amp_impl", "no_ddp_bb",
    "local_rank", "device_modules", "sync_bn", "dist_bn", "pin_mem",
    "model_ema_force_cpu", "worker_seeding", "epoch_repeats", "in_chans",
}


def parse_args(
    task: str, argv: Optional[Sequence[str]] = None
) -> Tuple[argparse.Namespace, str]:
    """Returns (args, resolved-yaml-text). CLI overrides YAML overrides defaults."""
    config_parser = argparse.ArgumentParser(add_help=False)
    config_parser.add_argument("-c", "--config", type=str, default="")
    cfg_args, remaining = config_parser.parse_known_args(argv)

    parser = build_parser(task)
    if cfg_args.config:
        with open(cfg_args.config) as f:
            cfg: Dict[str, Any] = yaml.safe_load(f) or {}
        known_dests = {a.dest for a in parser._actions}
        defaults = {}
        for key, value in cfg.items():
            if key in _IGNORED_KEYS:
                continue
            if key not in known_dests:
                _logger.warning("Ignoring unknown config key: %s", key)
                continue
            defaults[key] = value
        parser.set_defaults(**defaults)

    args = parser.parse_args(remaining)
    for dest in sorted(_IGNORED_KEYS):
        if hasattr(args, dest) and getattr(args, dest) != parser.get_default(dest):
            _logger.warning(
                "Ignoring GPU-only flag --%s=%r (no TPU meaning)",
                dest.replace("_", "-"), getattr(args, dest),
            )
    if getattr(args, "wandb_watch", False) and not getattr(
        args, "log_wandb", False
    ):
        # watch stats are wandb-only (train/harness.py routes watch/* keys
        # exclusively to the wandb run): without --log-wandb the per-leaf
        # reductions would be computed every step and discarded
        _logger.warning(
            "--wandb-watch has no effect without --log-wandb; disabling"
        )
        args.wandb_watch = False
    args.config = cfg_args.config
    args_text = yaml.safe_dump(vars(args), default_flow_style=False)
    return args, args_text


def resolve_use_pallas(args: argparse.Namespace) -> bool:
    """--use-pallas default: the fused TPU kernels on TPU, dense math
    elsewhere (the kernels run in slow interpret mode off-TPU)."""
    if args.use_pallas is None:
        import jax

        args.use_pallas = jax.default_backend() == "tpu"
        if args.use_pallas:
            _logger.info("use_pallas defaulted to True (TPU backend)")
    return args.use_pallas


def resolve_lr(args: argparse.Namespace, global_batch_size: int) -> float:
    """LR auto-scaling (ref train_mirror.py:725-740): lr = lr_base *
    global_batch/base_size, linear or sqrt (sqrt for adam-family)."""
    if args.lr is not None:
        return args.lr
    scale = args.lr_base_scale
    if not scale:
        on = args.opt.lower()
        scale = "sqrt" if any(o in on for o in ("ada", "lamb")) else "linear"
    batch_ratio = global_batch_size * max(args.grad_accum_steps, 1) / args.lr_base_size
    if scale == "sqrt":
        batch_ratio = batch_ratio**0.5
    lr = args.lr_base * batch_ratio
    _logger.info(
        "Learning rate (%f) calculated from base lr (%f) and effective global "
        "batch size (%d) with %s scaling.",
        lr, args.lr_base, global_batch_size * max(args.grad_accum_steps, 1), scale,
    )
    return lr
