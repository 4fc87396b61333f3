"""HLO communications audit of the 8-device sharded train step + projected
v5e-8 DP scaling efficiency (VERDICT r4 #6).

No multi-chip hardware exists on this rig, so the quantified multi-chip
story is built the way XLA itself would: compile the FULL flagship-dims
MIRROR train step for an 8-device ``data`` mesh (GSPMD partitioner runs at
compile time — the inserted collectives are real, the backend is CPU), then
read every collective out of the optimized HLO with its shape:

  - all-reduce        (gradient psums over replicated params, loss scalars,
                       the pinv global-max reduction)
  - all-gather / reduce-scatter / collective-permute (if any)

and set the bytes moved against the step's FLOPs.

Projection model (arithmetic shown in the output and BASELINE.md):
  t_compute = measured single-chip step time (bench.py, 68 TFLOP/s
              sustained at B=64) with per-chip batch held at 64 (weak
              scaling — the reference's DDP regime)
  t_comm    = ring all-reduce: 2 * bytes * (n-1)/n / BW_per_chip
  BW        = v5e ICI, STATED ASSUMPTION: 4.5e10 B/s one-way per link,
              2 links in the ring direction of the 4x2 v5e-8 torus
              => 9e10 B/s usable per chip (jax-ml.github.io/scaling-book
              quotes v5e ICI 4.5e10 B/s/link one-way).
  efficiency = t_compute / (t_compute + t_comm) -- WORST CASE: XLA overlaps
              gradient all-reduces with remaining backward compute, so the
              real number sits between this and 1.0.

Writes multichip_projection_r5.json. Run on this rig:
  python scripts/bench_multichip_projection.py          # flagship dims
  python scripts/bench_multichip_projection.py --tiny   # fast sanity
"""

import argparse
import json
import os
import re
import sys

# peek --devices BEFORE the env line (it must precede jax import/backend
# init): hardcoding 8 made any --devices N > 8 reshape-crash later
_n_dev = 8
if "--devices" in sys.argv:
    _n_dev = max(8, int(sys.argv[sys.argv.index("--devices") + 1]))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_n_dev}"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mirror_tpu.losses import MirrorLossWeights
from mirror_tpu.registry import create_model
from mirror_tpu.train.optim import make_optimizer, make_schedule
from mirror_tpu.train.state import create_train_state
from mirror_tpu.train.steps import make_mirror_train_step

FLAGSHIP = dict(
    wsi_embed_dim=768, rna_embed_dim=10234, embed_dim=768,
    wsi_num_tokens=2048, rna_mlp_ratio=4.0, rna_norm_eps=1e-5,
    dtype="bfloat16",
)
TINY = dict(
    wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, wsi_num_tokens=16,
    rna_mlp_ratio=2.0, num_prototypes=24, style_mlp_hidden_dim=24,
    style_mlp_out_dim=16, style_latent_dim=8,
)

# bench.py round-4/5 measurements on the real v5e chip (B=64, implicit pinv)
MEASURED_SAMPLES_PER_S = 309.3
MEASURED_TFLOPS = 68.0
B_PER_CHIP = 64

# v5e ICI assumption (see module docstring)
ICI_BYTES_PER_S_PER_LINK = 4.5e10
RING_LINKS = 2


class _Args:
    opt = "adamw"
    opt_eps = None
    opt_betas = None
    momentum = 0.9
    weight_decay = 1e-4
    clip_grad = 1.0
    clip_mode = "norm"
    opt_kwargs = {}
    use_sched = True
    sched = "cosine"
    sched_on_updates = True
    warmup_lr = 1e-6
    min_lr = 1e-8
    epochs = 2
    warmup_epochs = 1
    warmup_prefix = False
    decay_epochs = 90
    decay_rate = 0.1
    decay_milestones = (90,)
    grad_accum_steps = 1


_DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
    "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}

# e.g. "bf16[64,2048,768]" or "(f32[10234,1536], f32[1536])"
_SHAPE_RE = re.compile(r"(f32|bf16|f16|f64|s32|u32|s8|u8|s64|u64|pred)\[([0-9,]*)\]")


def _bytes_of(shape_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def audit(model_kwargs, batch, n_devices=8, zero1=False, model_parallel=1):
    model = create_model("mirror", **model_kwargs)
    mesh = Mesh(
        np.array(jax.devices()[:n_devices]).reshape(
            n_devices // model_parallel, model_parallel
        ),
        ("data", "model"),
    )
    tokens = model_kwargs["wsi_num_tokens"]
    wsi_d = model_kwargs["wsi_embed_dim"]
    rna_d = model_kwargs["rna_embed_dim"]

    rngs = dict(zip(
        ["params", "dropout", "masking", "style"],
        jax.random.split(jax.random.PRNGKey(0), 4),
    ))
    wsi = jax.ShapeDtypeStruct((batch, tokens, wsi_d), jnp.float32)
    rna = jax.ShapeDtypeStruct((batch, rna_d), jnp.float32)
    var_shapes = jax.eval_shape(
        lambda r: model.init(
            r, jnp.zeros((1, tokens, wsi_d)), jnp.zeros((1, rna_d)),
            0.75, 0.75, True,
        ), rngs,
    )
    params = var_shapes["params"]
    schedule = make_schedule(_Args, steps_per_epoch=10, base_lr=1e-3)
    tx = make_optimizer(_Args, schedule)
    state = jax.eval_shape(lambda p: create_train_state(p, tx, True), params)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def shard_struct(tree, sharding):
        return jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding),
            tree,
        )

    if zero1 or model_parallel > 1:
        # mirror parallel/tensor_parallel.shard_state's per-leaf specs on
        # abstract structs (no giant host arrays needed for the audit)
        from mirror_tpu.parallel.tensor_parallel import (
            _ZERO1_FIELDS, _path_names, param_spec, zero1_spec,
        )

        data_size = mesh.shape["data"]

        def spec_of(path, s):
            spec = param_spec(path, s, model_parallel) \
                if model_parallel > 1 else P()
            names = _path_names(path)
            if zero1 and names and names[0] in _ZERO1_FIELDS:
                spec = zero1_spec(s, spec, data_size)
            return jax.ShapeDtypeStruct(
                s.shape, s.dtype, sharding=NamedSharding(mesh, spec)
            )

        state = jax.tree_util.tree_map_with_path(spec_of, state)
    else:
        state = shard_struct(state, repl)
    batch_dict = {
        "wsi": jax.ShapeDtypeStruct(wsi.shape, wsi.dtype, sharding=data),
        "rna": jax.ShapeDtypeStruct(rna.shape, rna.dtype, sharding=data),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    step = make_mirror_train_step(
        model, tx, MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1),
        ema_decay=0.9998, schedule=schedule,
    )
    print(f"lowering + compiling for {n_devices} devices "
          f"(GSPMD partitioner runs here) ...", flush=True)
    compiled = (
        jax.jit(step, donate_argnums=0)
        .lower(state, batch_dict, rng)
        .compile()
    )

    comms = {}
    per_op = []
    for mod_text in compiled.as_text().splitlines():
        m = re.search(
            r"(\ball-reduce|all-gather|reduce-scatter|collective-permute)"
            r"(?:-start|-done)?[.\d]*\s*=\s*(\([^)]*\)|\S+)",
            mod_text,
        )
        if not m or "-done" in mod_text.split("=")[0]:
            continue
        kind, shape = m.group(1), m.group(2)
        b = _bytes_of(shape)
        comms[kind] = comms.get(kind, 0) + b
        if b > 1_000_000:
            per_op.append({"kind": kind, "bytes": b,
                           "shape": shape[:120]})

    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    per_op.sort(key=lambda d: -d["bytes"])
    return comms, per_op, flops, compiled


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--layouts", nargs="+",
                    default=["dp", "zero1", "tp2"],
                    choices=["dp", "zero1", "tp2"])
    args = ap.parse_args()

    kw = TINY if args.tiny else FLAGSHIP
    batch = 2 * args.devices if args.tiny else B_PER_CHIP * args.devices
    comms, per_op, flops, _ = audit(kw, batch, args.devices)

    # alternative layouts: same step, different GSPMD shardings — the audit
    # measures what each buys/costs in collective bytes
    alt = {}
    if "zero1" in args.layouts:
        z_comms, _, _, _ = audit(kw, batch, args.devices, zero1=True)
        alt["zero1"] = z_comms
    if "tp2" in args.layouts and args.devices % 2 == 0:
        t_comms, _, _, _ = audit(
            kw, batch, args.devices, model_parallel=2
        )
        alt["tp2_model2"] = t_comms

    total_comm = sum(comms.values())
    n = args.devices
    bw = ICI_BYTES_PER_S_PER_LINK * RING_LINKS
    # ring all-reduce: each chip sends+receives 2*(n-1)/n of the buffer
    t_comm = 2.0 * total_comm * (n - 1) / n / bw
    t_compute = B_PER_CHIP / MEASURED_SAMPLES_PER_S
    eff = t_compute / (t_compute + t_comm)
    if args.tiny:
        # tiny collective bytes against the FLAGSHIP measured compute time
        # is a physically meaningless ratio — don't print an authoritative-
        # looking ~1.0 efficiency for a model that isn't the flagship
        eff = t_compute = t_comm = None

    result = {
        "dims": "tiny" if args.tiny else "flagship",
        "devices": n,
        "global_batch": batch,
        "collective_bytes_per_step": comms,
        "alt_layouts_collective_bytes": alt,
        "total_collective_bytes_per_step": total_comm,
        "largest_collectives": per_op[:12],
        "hlo_flops_total": flops,
        "assumptions": {
            "ici_bytes_per_s_per_link_oneway": ICI_BYTES_PER_S_PER_LINK,
            "ring_links": RING_LINKS,
            "per_chip_ring_bw_bytes_per_s": bw,
            "measured_single_chip_samples_per_s": MEASURED_SAMPLES_PER_S,
            "measured_single_chip_tflops": MEASURED_TFLOPS,
            "per_chip_batch": B_PER_CHIP,
            "overlap": "none (worst case); XLA overlaps grad all-reduce "
                       "with backward compute, so real efficiency >= this",
        },
        "t_compute_s": t_compute,
        "t_comm_worst_case_s": t_comm,
        "projected_dp_scaling_efficiency_worst_case": eff,
        "projected_v5e8_samples_per_s": (
            MEASURED_SAMPLES_PER_S * n * eff if eff is not None else None
        ),
    }
    out = os.path.join(os.path.dirname(__file__), "..",
                       "multichip_projection_r5.json")
    if not args.tiny:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out}")
    print(json.dumps({k: v for k, v in result.items()
                      if k != "largest_collectives"}, indent=1))
    for d in result["largest_collectives"]:
        print(f"  {d['kind']:20s} {d['bytes']/1e6:10.2f} MB  {d['shape']}")


if __name__ == "__main__":
    main()
