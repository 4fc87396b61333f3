#!/usr/bin/env python
"""Benchmark the subtyping fine-tune train step (MIRRORClassifier, concat
fusion, smoothed-CE, adam) on the current backend — the downstream analogue
of bench.py (ref /root/reference/train_subtyping.py main loop).

Usage: python scripts/bench_downstream.py [--batch 64] [--pinv-grad implicit]
Prints one JSON line per batch size.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(batch: int, pinv_grad: str, tokens: int = 2048) -> dict:
    from mirror_tpu.registry import create_model
    from mirror_tpu.train.optim import make_optimizer, make_schedule
    from mirror_tpu.train.state import create_train_state
    from mirror_tpu.train.steps import make_classifier_train_step

    model = create_model(
        "mirror_classifier",
        wsi_embed_dim=768, rna_embed_dim=10234, embed_dim=768,
        wsi_num_tokens=tokens, rna_mlp_ratio=4.0, rna_norm_eps=1e-5,
        num_classes=2, fusion="concat",
        use_pallas=True, pinv_grad=pinv_grad, dtype="bfloat16",
    )

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

    schedule = make_schedule(_Args, 10, 1e-3)
    tx = make_optimizer(_Args, schedule)
    train_step = make_classifier_train_step(model, tx, smoothing=0.1)

    key = jax.random.PRNGKey(0)
    wsi = jax.random.normal(key, (batch, tokens, 768), jnp.float32)
    rna = jax.random.normal(key, (batch, 10234), jnp.float32)
    label = jnp.zeros((batch,), jnp.int32)
    rngs = {"params": key, "dropout": jax.random.fold_in(key, 1)}
    params = jax.jit(lambda r, w, x: model.init(r, w, x, False))(
        rngs, wsi[:2], rna[:2]
    )["params"]
    state = create_train_state(params, tx, model_ema=False)
    batch_dict = {"wsi": wsi, "rna": rna, "label": label}

    n_steps = 30

    @jax.jit
    def multi(state, b, rng):
        def body(carry, i):
            st, _ = carry
            st, m = train_step(st, b, jax.random.fold_in(rng, i))
            return (st, m["loss"]), None

        (state, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(n_steps)
        )
        return state, loss

    compiled = multi.lower(state, batch_dict, jax.random.PRNGKey(1)).compile()
    state, loss = compiled(state, batch_dict, jax.random.PRNGKey(1))
    float(loss)  # warmup + settle
    times = []
    for i in range(3):
        t0 = time.time()
        state, loss = compiled(state, batch_dict, jax.random.PRNGKey(2 + i))
        float(loss)  # host sync
        times.append((time.time() - t0) / n_steps)
    step_s = sorted(times)[1]
    return {
        "metric": "subtyping_finetune_train_step_throughput",
        "value": round(batch / step_s, 2),
        "unit": "samples/sec/chip",
        "batch": batch,
        "ms_per_step": round(step_s * 1000, 2),
        "pinv_grad": pinv_grad,
        "backend": jax.default_backend(),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, nargs="+", default=[64, 16])
    p.add_argument("--pinv-grad", default="implicit",
                   choices=["exact", "implicit"])
    args = p.parse_args()
    for b in args.batch:
        print(json.dumps(bench(b, args.pinv_grad)))


if __name__ == "__main__":
    main()
