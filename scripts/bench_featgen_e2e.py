#!/usr/bin/env python
"""End-to-end feature-generation benchmark (VERDICT r3 next #6).

Measures the REAL streaming pipeline — synthetic patch JPEGs on disk ->
threaded cv2 decode -> uint8 host->device ship -> jitted bf16 backbone
(device-side ImageNet normalize fused in) -> per-slide .npy write — via the
production `extract_features` loop, and prints ONE JSON line.

Companion numbers that bound it:
- host_decode_patches_per_s: the stream consumed with no device work
  (decode+stack+pad only) — the host ceiling.
- device_compute_patches_per_s: the jitted backbone on one device-RESIDENT
  uint8 batch, N reps inside one jit via carry-dependent lax.scan, one
  scalar pull — the device ceiling (the 4,130 patches/s methodology).
- ship_mb_per_s / ship_patches_per_s: host->device transfer of the uint8
  batch. On this dev rig that is the axon tunnel (~20-40 MB/s) and binds
  the loop; on a real v5e host it is PCIe and overlaps compute.
- e2e is ~min(host, ship, compute) under the double-buffered queue; busy
  fractions say which side binds.

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

    # ---- device side, decomposed. On this dev rig the chip sits behind an
    # axon tunnel (~20 MB/s), so "ship a 38 MB uint8 batch" dominates and
    # would masquerade as device time; a real v5e host ships over PCIe
    # (~10 GB/s, negligible). Measure the three pieces separately:
    #   ship:    host->device transfer of the uint8 batch
    #   compute: backbone on a device-RESIDENT batch, synced by pulling ONE
    #            scalar element per rep (a full [B, D] pull re-enters the
    #            tunnel; block_until_ready alone can return early through it)
    #   loop:    ship + compute + [B, D] pull, what this rig's e2e loop sees
    import jax

    import functools

    import jax.numpy as jnp
    from jax import lax

    warm = batch  # last batch from the stream, uint8 [B, 224, 224, 3]
    resident = jax.device_put(warm)

    # Sync each ship by pulling one scalar FROM the shipped array — through
    # the tunnel, `block_until_ready` on the put alone can return before
    # delivery completes (CLAUDE.md), which reads as GB/s fantasy bandwidth.
    # The scalar pull adds one RTT (~30 ms) per rep; still honest at MB scale.
    t0 = time.time()
    for _ in range(a.device_reps):
        float(jax.device_put(warm)[0, 0, 0, 0])
    ship_s = (time.time() - t0) / a.device_reps
    ship_mb_s = warm.nbytes / 1e6 / ship_s

    # N backbone steps inside ONE jit (lax.scan, carry-dependent input so
    # the loop body can't be hoisted), one scalar pull at the end — pays the
    # tunnel RTT once instead of once per rep. The weights MUST be a jit
    # argument (fn.raw/fn.variables): tracing through the `fn` closure embeds
    # all ~86M ViT params as HLO literal constants, and the serialized
    # program then exceeds the remote-compile service's request-size limit
    # (HTTP 413 through the axon tunnel).
    raw, variables = getattr(fn, "raw", None), getattr(fn, "variables", None)
    if raw is not None:
        resident_v = jax.device_put(variables)

        @functools.partial(jax.jit, static_argnums=2)
        def chain(v, images, n):
            def body(c, _):
                feats = raw(v, jnp.roll(images, c, axis=0))
                return (feats[0, :8].sum() > 0).astype(jnp.int32), ()
            c, _ = lax.scan(body, jnp.int32(0), None, length=n)
            return c

        float(chain(resident_v, resident, a.device_reps))  # compile
        t0 = time.time()
        s = float(chain(resident_v, resident, a.device_reps))
        compute_rate = a.device_reps * a.batch_size / (time.time() - t0)
        assert np.isfinite(s)
    else:  # multi-device wrapper: no chain hook; per-rep loop is the proxy
        compute_rate = None

    t0 = time.time()
    for _ in range(a.device_reps):
        out = np.asarray(fn(warm))
    loop_rate = a.device_reps * a.batch_size / (time.time() - t0)
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
    # Extrapolation uses the RESIDENT compute rate: on a real v5e host the
    # PCIe ship (~4 ms for 38 MB) overlaps with compute and is never the
    # binding term; the tunnel ship is a dev-rig artifact.
    if compute_rate is None:
        compute_rate = loop_rate  # conservative proxy (includes ship+pull)
    extrap = min(host_rate * host_cores, compute_rate * 8)
    ship_rate = a.batch_size / ship_s
    ceilings = {"host-decode": host_rate, "ship": ship_rate,
                "device-compute": compute_rate}
    bound_by = min(ceilings, key=ceilings.get)
    if e2e < 0.6 * min(ceilings.values()):
        # e2e well below every ceiling: the binder is the serialized
        # per-batch tunnel round-trips (ship + [B, D] feature pull), a
        # dev-rig artifact — see device_loop_patches_per_s.
        bound_by = "tunnel-rtt-serialization (dev-rig artifact)"
    result = {
        "metric": "featgen_e2e",
        "value": round(e2e, 1),
        "unit": "patches/s",
        "patches": n_patches,
        "batch_size": a.batch_size,
        "model": a.model,
        "host_decode_patches_per_s": round(host_rate, 1),
        "device_compute_patches_per_s": round(compute_rate, 1),
        "ship_mb_per_s": round(ship_mb_s, 1),
        "ship_patches_per_s": round(a.batch_size / ship_s, 1),
        "device_loop_patches_per_s": round(loop_rate, 1),
        "host_busy_fraction": round(min(e2e / host_rate, 1.0), 3),
        "device_busy_fraction": round(min(e2e / compute_rate, 1.0), 3),
        "bound_by": bound_by,
        "host_cores": host_cores,
        "v5e8_extrapolated_patches_per_s": round(extrap, 1),
        "extrapolation_assumptions": (
            "decode ~linear in host cores (independent JPEGs); backbone "
            "~linear over 8 chips (data-parallel batch shard); PCIe ship "
            "overlaps compute on real hosts (tunnel ship here is a dev-rig "
            "artifact); = min(host*cores, resident_compute*8)"
        ),
    }
    print(json.dumps(result))
    if not a.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
