#!/usr/bin/env python
"""Input-pipeline feed-budget measurement (VERDICT r2 weak #3).

Measures the native C++ batch-assembly loader's throughput vs thread count
on a synthetic ``.npy`` cohort at production shapes, and prints the v5e-8
feed model: how many host cores are needed to keep 8 chips busy at the
measured per-chip training rate.

  python scripts/bench_loader.py [--slides 64] [--tokens 2048] [--dim 768] \
      [--batch 64] [--threads 1 2 4 8 16] [--chip-rate 226.5]

Host-only (no TPU). On this 1-core bench host thread scaling saturates at
~1 thread's worth of work (CLAUDE.md: thread pools do scale on real v5e
hosts, which have 100+ cores); the per-thread (== per-core) rate is the
number to extrapolate.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=64)
    ap.add_argument("--rows", type=int, default=3000,
                    help="patches per synthetic slide")
    ap.add_argument("--tokens", type=int, default=2048)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--chip-rate", type=float, default=226.5,
                    help="consumed samples/s per chip (BASELINE.md)")
    ap.add_argument("--n-chips", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/mirror_loader_bench")
    ap.add_argument("--output", default="")
    args = ap.parse_args()

    from mirror_tpu.data import native_loader

    if not native_loader.available():
        raise SystemExit("native loader unavailable (g++ build failed?)")

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(args.slides):
        p = os.path.join(args.workdir, f"slide_{i}.npy")
        if not os.path.exists(p):
            np.save(p, rng.normal(size=(args.rows, args.dim)).astype(np.float32))
        paths.append(p)
    # one warm pass so the page cache holds the cohort (steady-state regime:
    # real hosts keep hot slides cached; cold-IO is a separate axis)
    warm = paths[: args.batch] if len(paths) >= args.batch else paths
    native_loader.gather_batch(warm, args.tokens,
                               list(range(len(warm))), num_threads=1)

    out = np.empty((args.batch, args.tokens, args.dim), np.float32)
    results = {}
    bytes_per_batch = args.batch * args.tokens * args.dim * 4
    # discard one full pass: the first measured config otherwise absorbs
    # cold page-cache / allocator warmup (measured 20x distortion)
    for it in range(args.iters):
        sel = [paths[(it * args.batch + j) % args.slides]
               for j in range(args.batch)]
        native_loader.gather_batch(sel, args.tokens, list(range(args.batch)),
                                   num_threads=args.threads[0], out=out)
    for nt in args.threads:
        t0 = time.time()
        for it in range(args.iters):
            sel = [paths[(it * args.batch + j) % args.slides]
                   for j in range(args.batch)]
            native_loader.gather_batch(
                sel, args.tokens, list(range(args.batch)), num_threads=nt,
                out=out,
            )
        dt = time.time() - t0
        sps = args.iters * args.batch / dt
        results[nt] = {
            "samples_per_s": sps,
            "gbytes_per_s": args.iters * bytes_per_batch / dt / 1e9,
        }
        print(f"threads={nt:3d}: {sps:8.1f} samples/s "
              f"({results[nt]['gbytes_per_s']:.2f} GB/s)", flush=True)

    best = max(r["samples_per_s"] for r in results.values())
    # per-core basis: the 1-thread measurement if present, else the lowest
    # measured thread count (avoids a KeyError when --threads omits 1)
    base_nt = min(results)
    per_core = results[base_nt]["samples_per_s"] / base_nt
    need = args.chip_rate * args.n_chips
    cores_needed = need / per_core
    model = {
        "measured": results,
        "per_core_samples_per_s": per_core,
        "v5e8_feed_required_samples_per_s": need,
        "cores_needed_at_per_core_rate": cores_needed,
        "host_best_samples_per_s": best,
        "note": "linear-in-cores model; this bench host has "
                f"{os.cpu_count()} core(s). Real v5e-8 hosts have >= 112.",
    }
    print(json.dumps(model, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(model, f, indent=2)


if __name__ == "__main__":
    main()
