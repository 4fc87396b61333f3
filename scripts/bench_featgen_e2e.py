#!/usr/bin/env python
"""End-to-end feature-generation benchmark (VERDICT r3 next #6).

Measures the REAL streaming pipeline — synthetic patch JPEGs on disk ->
threaded cv2 decode -> uint8 host->device ship -> jitted bf16 backbone
(device-side ImageNet normalize fused in) -> per-slide .npy write — via the
production `extract_features` loop, and prints ONE JSON line.

Companion numbers that bound it:
- host_decode_patches_per_s: the stream consumed with no device work
  (decode+stack+pad only) — the host ceiling.
- device_patches_per_s: the jitted backbone on one resident uint8 batch,
  including the per-batch [B, D] feature pull, in a dependent chain — the
  device ceiling (this is the 4,130 patches/s figure's methodology).
- e2e is ~min(host, device) under the double-buffered queue; busy fractions
  say which side binds.

v5e-8 extrapolation (stated assumptions, per BASELINE.md's feed-plan memo):
this benchmark host exposes 1 CPU core (threaded decode does NOT scale
here); a production v5e-8 host has 112+ cores and decode scales ~linearly
with cores (independent JPEG decodes), while the backbone scales ~linearly
over 8 chips (embarrassingly parallel batch sharding, already implemented
in build_extractor's data-parallel wrap). extrapolated =
min(host_rate * host_cores, device_rate * 8).

Reference counterpart: tools/feature_generation/gen_patch_feature.py
:141-172 (per-GPU torch DataLoader loop).
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_synthetic_patches(root: str, n_slides: int, patches_per_slide: int,
                           size: int = 224, seed: int = 0) -> int:
    """H&E-ish noise JPEGs: smooth low-freq blobs + speckle so JPEG entropy
    (and so decode cost) is tissue-like rather than flat-color-trivial."""
    import cv2

    rng = np.random.default_rng(seed)
    total = 0
    for s in range(n_slides):
        sdir = os.path.join(root, f"SYN-{s:04d}")
        os.makedirs(sdir, exist_ok=True)
        for p in range(patches_per_slide):
            low = rng.normal(size=(14, 14, 3))
            img = cv2.resize(low, (size, size), interpolation=cv2.INTER_CUBIC)
            img = (img - img.min()) / (np.ptp(img) + 1e-9)
            base = np.array([200.0, 140.0, 180.0])  # eosin-ish
            arr = (base * (0.4 + 0.6 * img)).astype(np.uint8)
            noise = rng.integers(0, 25, arr.shape, dtype=np.uint8)
            arr = cv2.add(arr, noise)
            cv2.imwrite(os.path.join(sdir, f"{p // 64}_{p % 64}.jpeg"), arr)
            total += 1
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="phikon")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--slides", type=int, default=4)
    ap.add_argument("--patches-per-slide", type=int, default=512)
    ap.add_argument("--num-threads", type=int, default=8)
    ap.add_argument("--device-reps", type=int, default=12)
    ap.add_argument("--keep", default="", help="reuse/keep this work dir")
    a = ap.parse_args()

    from mirror_tpu.tools.gen_patch_feature import (
        batched_patch_stream,
        build_extractor,
        extract_features,
        list_slides,
    )

    work = a.keep or tempfile.mkdtemp(prefix="featgen_e2e_")
    patch_root = os.path.join(work, "patches")
    have = (os.path.isdir(patch_root)
            and any(os.scandir(patch_root)))
    if not have:
        os.makedirs(patch_root, exist_ok=True)
        t0 = time.time()
        n = make_synthetic_patches(patch_root, a.slides, a.patches_per_slide)
        print(f"# wrote {n} synthetic patch JPEGs in {time.time() - t0:.1f}s",
              file=sys.stderr)

    import jax

    use_pallas = jax.default_backend() == "tpu"
    extractor = build_extractor(a.model, use_pallas=use_pallas)
    fn, dim = extractor

    slides = list_slides(patch_root)
    all_files = []
    for _, sdir in slides:
        all_files += sorted(
            os.path.join(sdir, f) for f in os.listdir(sdir)
            if f.endswith(".jpeg")
        )
    n_patches = len(all_files)

    # ---- host ceiling: stream only, no device work ----
    t0 = time.time()
    seen = 0
    for batch, n_valid in batched_patch_stream(
        all_files, a.batch_size, num_threads=a.num_threads
    ):
        seen += n_valid
    host_rate = seen / (time.time() - t0)

    # ---- device ceiling: resident batch, dependent-free timed calls with
    # the [B, D] pull each rep (matches the production loop's np.asarray) ----
    warm = batch  # last batch from the stream, uint8 [B, 224, 224, 3]
    np.asarray(fn(warm))  # compile
    t0 = time.time()
    for _ in range(a.device_reps):
        out = np.asarray(fn(warm))
    device_rate = a.device_reps * a.batch_size / (time.time() - t0)
    assert np.isfinite(out).all()

    # ---- e2e: the production extract_features loop (decode -> ship ->
    # backbone -> .npy write), backbone already compiled ----
    out_dir = os.path.join(work, "features_timed")
    shutil.rmtree(out_dir, ignore_errors=True)
    stats = extract_features(
        patch_root, out_dir, a.model, batch_size=a.batch_size,
        num_threads=a.num_threads, fmt="npy", skip_existing=False,
        use_pallas=use_pallas, extractor=extractor,
    )
    e2e = stats["patches_per_sec"]
    for sname, _ in slides:
        f = np.load(os.path.join(out_dir, f"{sname}.npy"))
        assert f.shape[1] == dim

    host_cores = os.cpu_count() or 1
    extrap = min(host_rate * host_cores, device_rate * 8)
    result = {
        "metric": "featgen_e2e",
        "value": round(e2e, 1),
        "unit": "patches/s",
        "patches": n_patches,
        "batch_size": a.batch_size,
        "model": a.model,
        "host_decode_patches_per_s": round(host_rate, 1),
        "device_patches_per_s": round(device_rate, 1),
        "host_busy_fraction": round(min(e2e / host_rate, 1.0), 3),
        "device_busy_fraction": round(min(e2e / device_rate, 1.0), 3),
        "bound_by": "host" if host_rate < device_rate else "device",
        "host_cores": host_cores,
        "v5e8_extrapolated_patches_per_s": round(extrap, 1),
        "extrapolation_assumptions": (
            "decode ~linear in host cores (independent JPEGs), backbone "
            "~linear over 8 chips (data-parallel batch shard); "
            "= min(host*cores, device*8)"
        ),
    }
    print(json.dumps(result))
    if not a.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
