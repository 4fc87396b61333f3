#!/usr/bin/env python
"""Patch feature extraction: streaming image decode -> jitted TPU backbone ->
per-slide feature files.

Rebuild of /root/reference/tools/feature_generation/gen_patch_feature.py
(Config-class driven, README.md:90) + dataset_feature_generation.py as a
TPU pipeline:

- slides are directories of patch JPEGs under ``{root}/{class}/{slide}/``
  (gen_patch.py's output layout) or flat ``{root}/{slide}/``;
- host threads decode+resize patches (cv2, INTER_AREA to 224); batches
  ship to the device as raw uint8 (4x less host->device traffic) and the
  ImageNet normalization — the reference's albumentations transform —
  runs jitted on device, fused into the patch-embed prologue;
- fixed-size batches (tail padded) feed one jitted bf16 backbone; the
  TPU computes while the host decodes the next batch (double-buffered
  queue);
- per-slide ``[n_patches, D]`` features are written as ``.npy`` (native) or
  ``.pt`` (reference-compatible);
- K-fold slide sharding ``[fold::k]`` for multi-process runs matches
  KFoldPatchDataset (dataset_feature_generation.py:121-132).

Backbones: ``custom_resnet50`` (1024-d truncated ResNet50) and ``phikon``
(ViT-B/16 CLS, 768-d). Pretrained weights load from a local HF snapshot /
torch checkpoint when given; otherwise random init (feature *pipeline*
benchmarking still works).
"""

import argparse
import logging
import os
import queue
import threading
import time
from typing import Iterator, List, Tuple

import numpy as np

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("gen_patch_feature")

IMG_EXTS = (".jpeg", ".jpg", ".png")


def list_slides(patch_root: str) -> List[Tuple[str, str]]:
    """Returns (slide_name, slide_dir) pairs; supports class subdirs."""
    slides = []
    for entry in sorted(os.listdir(patch_root)):
        p = os.path.join(patch_root, entry)
        if not os.path.isdir(p):
            continue
        files = [f for f in os.listdir(p) if f.lower().endswith(IMG_EXTS)]
        if files:
            slides.append((entry, p))
        else:  # class dir containing slide dirs
            for sub in sorted(os.listdir(p)):
                sp = os.path.join(p, sub)
                if os.path.isdir(sp):
                    slides.append((os.path.join(entry, sub), sp))
    return slides


def decode_patch(path: str, size: int = 224) -> np.ndarray:
    import cv2

    img = cv2.imread(path)  # BGR
    if img is None:  # cv2 signals unreadable files by returning None
        raise ValueError(f"unreadable patch image: {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if img.shape[:2] != (size, size):
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
    return img


def batched_patch_stream(
    patch_files: List[str],
    batch_size: int,
    size: int = 224,
    num_threads: int = 4,
    prefetch: int = 4,
) -> Iterator[Tuple[np.ndarray, int]]:
    """Yields (uint8 RGB [B, size, size, 3], n_valid); normalization happens
    on device (see device_normalize). The tail batch is padded to keep one
    compiled XLA program."""
    from concurrent.futures import ThreadPoolExecutor

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    sentinel = object()
    error = []
    stop = threading.Event()

    def producer():
        # Full contract of data/loader.py's prefetch thread, both halves:
        # (1) forward decode errors and ALWAYS deliver the sentinel —
        # without the finally, one corrupt patch JPEG kills this thread
        # before the sentinel and the consumer blocks on q.get() forever;
        # (2) honor consumer abandonment via `stop` + timed puts — a plain
        # q.put would block forever once the consumer stops iterating
        # (device error mid-slide, early break), pinning this thread, the
        # decode pool, and ~prefetch decoded batches per aborted stream.
        try:
            with ThreadPoolExecutor(max_workers=num_threads) as pool:
                for i in range(0, len(patch_files), batch_size):
                    if stop.is_set():
                        return
                    chunk = patch_files[i : i + batch_size]
                    imgs = list(pool.map(lambda f: decode_patch(f, size),
                                         chunk))
                    arr = np.stack(imgs)
                    n_valid = len(chunk)
                    if n_valid < batch_size:
                        pad = np.repeat(arr[-1:], batch_size - n_valid, axis=0)
                        arr = np.concatenate([arr, pad])
                    while not stop.is_set():
                        try:
                            q.put((arr, n_valid), timeout=0.1)
                            break
                        except queue.Full:
                            continue
        except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
            error.append(e)
        finally:
            # Deliver the sentinel. While the consumer is LIVE the queue may
            # be Full simply because the consumer is slower than decode (the
            # common production case) — block, never drop: evicting to make
            # room here would silently lose a DATA batch at end-of-stream.
            # Only once `stop` is set (consumer abandoned) is eviction safe.
            while True:
                if stop.is_set():
                    try:
                        q.put_nowait(sentinel)
                        break
                    except queue.Full:  # make room: the consumer is gone
                        try:
                            q.get_nowait()
                        except queue.Empty:
                            pass
                else:
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
    finally:
        stop.set()
        while True:  # unblock a producer waiting in its timed put
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join()
    if error:
        raise error[0]


def build_extractor(model_name: str, checkpoint: str = "", dtype: str = "bfloat16",
                    use_pallas: bool = False, quant=None,
                    data_parallel: bool = True):
    """Returns (jitted_fn(images)->features, feature_dim).

    With ``data_parallel`` (default) and more than one device, the image
    batch is sharded over all chips of a ``data`` mesh — feature extraction
    is embarrassingly parallel, so one process drives the whole slice (the
    batch size must then be a multiple of the device count)."""
    import jax
    import jax.numpy as jnp

    from mirror_tpu.models.feature_extractors import (
        TruncatedResNet50,
        ViTB16,
        load_hf_vit_weights,
        load_torch_resnet50_weights,
    )
    from mirror_tpu.parallel import create_mesh, replicate
    from mirror_tpu.parallel.mesh import batch_sharding

    def _wrap(model, variables):
        from mirror_tpu.models.feature_extractors import device_normalize

        raw = jax.jit(lambda v, imgs: model.apply(v, device_normalize(imgs)))
        if not data_parallel or len(jax.devices()) == 1:
            fn = lambda imgs: raw(variables, imgs)
            # Exposed for benchmarks that re-trace the apply inside their own
            # jit (e.g. a lax.scan timing chain): passing `variables` as a jit
            # ARGUMENT keeps the weights out of the serialized HLO — tracing
            # through the closure would embed ~86M params as literal
            # constants, which overflows the remote-compile request limit.
            fn.raw, fn.variables = raw, variables
            return fn
        mesh = create_mesh()
        # the ViT half-block kernels must shard_map over the batch on a
        # multi-chip mesh (ops/_common.spmd_wrap)
        from mirror_tpu.ops._common import set_spmd_mesh

        set_spmd_mesh(mesh)
        shard = batch_sharding(mesh)
        variables = replicate(mesh, variables)
        n_dev = mesh.devices.size
        _logger.info("data-parallel feature extraction over %d devices", n_dev)

        def fn(imgs):
            assert imgs.shape[0] % n_dev == 0, (
                f"batch {imgs.shape[0]} must divide over {n_dev} devices"
            )
            return raw(variables, jax.device_put(imgs, shard))

        return fn

    dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
    if model_name == "phikon":
        # quant='int8': W8A8 QuantDense GEMMs — measured SLOWER on v5e at
        # B=512/197 tokens (2287 vs 2431 patches/s: the per-GEMM dynamic
        # quant/dequant elementwise traffic outweighs the 2x int8 MXU rate
        # at this sequence length); kept for larger-ViT / longer-seq regimes
        model = ViTB16(dtype=jnp.dtype(dtype), use_pallas=use_pallas,
                       quant=quant)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy)
        if checkpoint:
            hf_state = _load_hf_state(checkpoint)
            variables = {
                "params": load_hf_vit_weights(variables["params"], hf_state)
            }
            _logger.info("Loaded Phikon/ViT weights from %s", checkpoint)
        else:
            _logger.warning("No checkpoint given: random ViT weights")
        return _wrap(model, variables), 768
    if model_name == "custom_resnet50":
        model = TruncatedResNet50(dtype=jnp.dtype(dtype))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy)
        if checkpoint:
            import torch

            state = torch.load(checkpoint, map_location="cpu", weights_only=True)
            variables = load_torch_resnet50_weights(dict(variables), state)
            _logger.info("Loaded ResNet50 weights from %s", checkpoint)
        else:
            _logger.warning("No checkpoint given: random ResNet50 weights")
        return _wrap(model, variables), 1024
    raise SystemExit(f"Unknown model {model_name}")


def _load_hf_state(path_or_repo: str):
    """Local HF snapshot directory (pytorch_model.bin / model.safetensors)."""
    import os as _os

    if _os.path.isdir(path_or_repo):
        bin_path = _os.path.join(path_or_repo, "pytorch_model.bin")
        st_path = _os.path.join(path_or_repo, "model.safetensors")
        if _os.path.exists(st_path):
            from safetensors.numpy import load_file

            return load_file(st_path)
        import torch

        return torch.load(bin_path, map_location="cpu", weights_only=True)
    # repo id: only works with a warm HF cache / network
    from transformers import ViTModel

    return ViTModel.from_pretrained(path_or_repo).state_dict()


def extract_features(
    patch_root: str,
    output_dir: str,
    model_name: str = "phikon",
    checkpoint: str = "",
    batch_size: int = 256,
    fold: int = 0,
    k: int = 1,
    num_threads: int = 8,
    fmt: str = "npy",
    skip_existing: bool = True,
    use_pallas: bool = False,
    quant=None,
    extractor=None,
) -> dict:
    import jax

    from mirror_tpu.data.formats import save_feature_file

    n_dev = len(jax.devices())
    if batch_size % n_dev:
        batch_size = ((batch_size + n_dev - 1) // n_dev) * n_dev
        _logger.info("rounded batch size up to %d (multiple of %d devices)",
                     batch_size, n_dev)
    # a prebuilt (fn, dim) lets callers reuse one compiled backbone across
    # calls (scripts/bench_featgen_e2e.py warms the jit, then times a run)
    fn, dim = extractor or build_extractor(
        model_name, checkpoint, use_pallas=use_pallas, quant=quant)
    slides = list_slides(patch_root)[fold::k]
    _logger.info("%d slides (shard %d/%d)", len(slides), fold, k)
    total_patches = 0
    t_start = time.time()
    for slide_name, slide_dir in slides:
        out_path = os.path.join(output_dir, slide_name.replace(os.sep, "/")) + f".{fmt}"
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        if skip_existing and os.path.exists(out_path):
            _logger.info("skip existing %s", out_path)
            continue
        patch_files = sorted(
            os.path.join(slide_dir, f)
            for f in os.listdir(slide_dir)
            if f.lower().endswith(IMG_EXTS)
        )
        feats = []
        t0 = time.time()
        for batch, n_valid in batched_patch_stream(
            patch_files, batch_size, num_threads=num_threads
        ):
            out = np.asarray(fn(batch))
            feats.append(out[:n_valid])
        features = np.concatenate(feats) if feats else np.zeros((0, dim), np.float32)
        save_feature_file(out_path, features)
        dt = time.time() - t0
        total_patches += len(patch_files)
        _logger.info(
            "%s: %d patches -> %s in %.1fs (%.1f patches/s)",
            slide_name, len(patch_files), out_path, dt, len(patch_files) / max(dt, 1e-9),
        )
    wall = time.time() - t_start
    stats = {
        "slides": len(slides),
        "patches": total_patches,
        "seconds": wall,
        "patches_per_sec": total_patches / max(wall, 1e-9),
    }
    _logger.info("Done: %s", stats)
    return stats


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("patch_root", help="root dir of patch images")
    p.add_argument("output_dir")
    p.add_argument("--model", default="phikon", choices=["phikon", "custom_resnet50"])
    p.add_argument("--checkpoint", default="", help="local weights (HF dir or .pt)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--fold", type=int, default=0, help="slide shard index")
    p.add_argument("--k", type=int, default=1, help="total slide shards")
    p.add_argument("--num-threads", type=int, default=8)
    p.add_argument("--format", default="npy", choices=["npy", "pt"])
    p.add_argument("--no-skip-existing", action="store_false", dest="skip_existing")
    # default: fused sublayer kernels on TPU (3,579 vs 2,436 patches/s at
    # B=256, BASELINE.md round-3), dense math elsewhere (interpret mode is
    # slow off-TPU)
    p.add_argument("--use-pallas", action="store_true", default=None)
    p.add_argument("--no-use-pallas", action="store_false", dest="use_pallas")
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="W8A8 inference GEMMs (see build_extractor note)")
    a = p.parse_args()
    from mirror_tpu.utils import apply_forced_platform

    apply_forced_platform()  # before default_backend() initializes the backend
    if a.use_pallas is None:
        import jax

        a.use_pallas = jax.default_backend() == "tpu"
    extract_features(
        a.patch_root, a.output_dir, a.model, a.checkpoint, a.batch_size,
        a.fold, a.k, a.num_threads, a.format, a.skip_existing, a.use_pallas,
        a.quant,
    )


if __name__ == "__main__":
    main()
