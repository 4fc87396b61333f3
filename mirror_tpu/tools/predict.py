#!/usr/bin/env python
"""Batch inference from a trained downstream checkpoint to a CSV.

The reference ships training/evaluation entry points but no plain
"score these slides" tool; this closes that workflow gap:

    python -m mirror_tpu.tools.predict --checkpoint runs/.../model_best.msgpack \\
        --task subtyping --wsi-feature-dir feats/ --rna-feature-csv rna.csv \\
        --output predictions.csv

The model is rebuilt from the checkpoint's embedded run args (the
``args`` yaml the trainers store, train_subtyping.py model assembly), so no
model flags are needed. Output columns: ``slide_id`` plus per-class
``prob_{i}`` softmax probabilities (subtyping) or the ``risk`` score
-sum(cumprod(1-hazards)) (survival, train/steps.py::survival_risk).
Slides are every feature file in the directory; RNA rows are matched by
the reference's 15-char "Sample ID" prefix when a CSV is given.
"""

import argparse
import logging
import os

import numpy as np

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("predict")


def _rebuild_model(payload, rna_dim, task):
    import jax
    import yaml

    from mirror_tpu.registry import create_model

    run_args = yaml.safe_load(payload["args"]) if payload.get("args") else {}
    model_name = payload.get("arch") or run_args.get("model", "mirror_classifier")
    mk = dict(run_args.get("model_kwargs") or {})
    if task == "survival":
        mk["num_classes"] = run_args.get("num_bins") or run_args.get(
            "num_classes", 4
        )
    else:
        # train_subtyping: num_classes = args.num_classes or len(args.classes)
        mk["num_classes"] = (
            run_args.get("num_classes")
            or len(run_args.get("classes") or [])
            or mk.get("num_classes", 2)
        )
    if rna_dim is not None:
        mk["rna_embed_dim"] = rna_dim
    if run_args.get("amp", True):
        mk.setdefault("dtype", run_args.get("amp_dtype", "bfloat16"))
    mk.setdefault("use_pallas", jax.default_backend() == "tpu")
    if run_args.get("wsi_feature_only"):
        mk.setdefault("fusion", "add")
    model = create_model(model_name, **mk)
    num_tokens = int(run_args.get("num_wsi_feature_tokens", 2048))
    wsi_only = bool(run_args.get("wsi_feature_only", False))
    return model, num_tokens, wsi_only


def predict(
    checkpoint: str,
    task: str,
    wsi_feature_dir: str,
    output: str,
    rna_feature_csv: str = "",
    batch_size: int = 16,
    use_ema: bool = False,
    seed: int = 42,
    whole_slide: bool = False,
) -> list:
    """``whole_slide=True`` scores EVERY patch of each slide instead of the
    training-time ``num_wsi_feature_tokens`` subsample: the WSI encoder runs
    via the context-parallel whole-slide path (token axis sharded over the
    mesh, parallel/context_parallel.transmil_encode_cp) and its cls row
    feeds the same fusion/head (``MIRRORClassifier.head_from_wsi``). This is
    the capability the reference structurally lacks — its datasets cap every
    slide at 2048 sampled tokens (ref datasets/dataset_pretrain.py:157-161)."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from mirror_tpu.data.formats import load_feature_file
    from mirror_tpu.train.checkpoint import load_checkpoint_file
    from mirror_tpu.train.steps import survival_risk

    payload = load_checkpoint_file(checkpoint)
    params = payload.get("ema_state_dict") if use_ema else None
    if use_ema and not params:
        # a silent fallback would score raw weights and let an EMA-vs-raw
        # comparison return byte-identical CSVs
        _logger.warning(
            "--use-ema requested but the checkpoint has no ema_state_dict; "
            "scoring the raw state_dict"
        )
    if not params:
        params = payload["state_dict"]

    rna_df = None
    rna_dim = None
    if rna_feature_csv:
        rna_df = pd.read_csv(rna_feature_csv, index_col=0)
        rna_df.index = [str(i)[:15] for i in rna_df.index]
        # same dedup as datasets._filter_data: two vials sharing a 15-char
        # prefix would make .loc return a frame and break batch assembly
        rna_df = rna_df.loc[~rna_df.index.duplicated(keep="first")]
        rna_dim = rna_df.shape[1]

    model, num_tokens, wsi_only = _rebuild_model(payload, rna_dim, task)
    if rna_df is None and not wsi_only:
        raise SystemExit(
            "this checkpoint's model fuses RNA (wsi_feature_only was off at "
            "training time) — pass --rna-feature-csv"
        )

    from mirror_tpu.data.formats import list_feature_files

    # list_feature_files dedupes slides present in several formats (X.npy
    # next to X.pt after convert_features) — a raw glob would score such
    # slides twice and emit duplicate slide_id rows
    files = [
        os.path.join(wsi_feature_dir, f)
        for f in list_feature_files(wsi_feature_dir)
    ]
    if not files:
        # subtyping cohorts live in a class layout ({root}/{class}/{slide});
        # score every class subdir so users can point at the cohort root
        for sub in sorted(os.listdir(wsi_feature_dir)):
            subdir = os.path.join(wsi_feature_dir, sub)
            if os.path.isdir(subdir):
                files += [
                    os.path.join(subdir, f)
                    for f in list_feature_files(subdir)
                ]
    if rna_df is not None and not wsi_only:
        # gated on wsi_only like the batch assembly below: a wsi-only
        # checkpoint never consumes RNA, so missing RNA rows must not
        # silently drop slides from the output
        kept = [f for f in files
                if os.path.basename(f).split(".")[0][:15] in rna_df.index]
        if len(kept) < len(files):
            _logger.warning("%d slides have no RNA row; skipped",
                            len(files) - len(kept))
        files = kept
    if not files:
        raise SystemExit(f"no usable feature files under {wsi_feature_dir}")

    rng = np.random.default_rng(seed)
    # Multi-chip hosts: score data-parallel over every chip. Registering the
    # mesh is also REQUIRED for correctness there — a checkpoint trained
    # with the Pallas kernels rebuilds with them, and Mosaic custom calls
    # only lower for >1 device inside the kernels' shard_map
    # (ops/_common.spmd_wrap).
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        from mirror_tpu.ops._common import set_spmd_mesh
        from mirror_tpu.parallel import create_mesh
        from mirror_tpu.parallel.mesh import batch_sharding

        mesh = create_mesh()
        set_spmd_mesh(mesh)
        if batch_size % n_dev:
            batch_size = ((batch_size + n_dev - 1) // n_dev) * n_dev
            _logger.info(
                "rounded batch size up to %d (multiple of %d devices)",
                batch_size, n_dev,
            )
        batch_shard = batch_sharding(mesh)

    def to_device(arr):
        if mesh is None:
            return jnp.asarray(arr)
        return jax.device_put(arr, batch_shard)

    if whole_slide:
        from mirror_tpu.models.classifier import MIRRORClassifier
        from mirror_tpu.parallel import create_mesh
        from mirror_tpu.parallel.context_parallel import (
            transmil_encode_cp,
            wrap_pad_square,
        )

        cp_mesh = mesh if mesh is not None else create_mesh()
        ws_dtype = getattr(model, "dtype", None) or jnp.float32
        # jit caches one compiled program per distinct PADDED token count;
        # without it the encoder runs op-by-op (each dispatch pays the
        # host<->device round-trip, minutes per slide on a remote-tunnel
        # chip). Slides are wrap-padded to their square host-side first, so
        # the cache is keyed by ceil(sqrt(n)) — same math (the encoder's
        # own pad hoisted out), far fewer compiles over a cohort.
        encode_cp = jax.jit(
            lambda p, toks: transmil_encode_cp(p, toks, cp_mesh, dtype=ws_dtype)
        )
        fwd = jax.jit(
            lambda p, wsi_cls, rna: model.apply(
                {"params": p}, wsi_cls, rna, True,
                method=MIRRORClassifier.head_from_wsi,
            ).astype(jnp.float32)
        )
    else:
        fwd = jax.jit(
            lambda p, wsi, rna: model.apply(
                {"params": p}, wsi, rna, True
            ).astype(jnp.float32)
        )

    rows = []
    for i in range(0, len(files), batch_size):
        chunk = files[i : i + batch_size]
        wsi = []
        rna = []
        for f in chunk:
            feats = np.asarray(load_feature_file(f), np.float32)
            if whole_slide:
                # encode every patch: one long-sequence CP forward per
                # slide, keep the cls row. The host-side square wrap pad is
                # the encoder's own pad hoisted out (exact), so programs are
                # shared between slides with the same ceil(sqrt(n)).
                seq = encode_cp(
                    params["wsi_encoder"], jnp.asarray(wrap_pad_square(feats))
                )
                wsi.append(np.asarray(seq[0], np.float32))
            else:
                idx = rng.choice(
                    feats.shape[0], num_tokens,
                    replace=feats.shape[0] < num_tokens,
                )
                wsi.append(feats[idx])
            if rna_df is not None and not wsi_only:
                sid = os.path.basename(f).split(".")[0][:15]
                rna.append(rna_df.loc[sid].to_numpy(np.float32))
        n_valid = len(chunk)
        if n_valid < batch_size:  # pad to keep one compiled shape
            wsi += [wsi[-1]] * (batch_size - n_valid)
            if rna:
                rna += [rna[-1]] * (batch_size - n_valid)
        wsi_arr = to_device(np.stack(wsi))
        rna_arr = to_device(np.stack(rna)) if rna else None
        logits = np.asarray(fwd(params, wsi_arr, rna_arr))[:n_valid]
        for f, lg in zip(chunk, logits):
            sid = os.path.basename(f).split(".")[0]
            if task == "survival":
                rows.append({"slide_id": sid,
                             "risk": float(survival_risk(lg[None])[0])})
            else:
                p = np.exp(lg - lg.max())
                p = p / p.sum()
                row = {"slide_id": sid,
                       "pred": int(np.argmax(p))}
                row.update({f"prob_{j}": float(v) for j, v in enumerate(p)})
                rows.append(row)
        _logger.info("scored %d/%d slides", min(i + batch_size, len(files)),
                     len(files))

    pd.DataFrame(rows).to_csv(output, index=False)
    _logger.info("wrote %d predictions -> %s", len(rows), output)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--task", required=True, choices=["subtyping", "survival"])
    p.add_argument("--wsi-feature-dir", required=True)
    p.add_argument("--rna-feature-csv", default="")
    p.add_argument("--output", required=True)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--use-ema", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--whole-slide", action="store_true", default=False,
                   help="score EVERY patch (context-parallel whole-slide "
                   "encoder) instead of the training-time token subsample")
    a = p.parse_args(argv)
    from mirror_tpu.utils import apply_forced_platform

    apply_forced_platform()  # launcher 'cpu' slot contract (utils/platform.py)
    predict(a.checkpoint, a.task, a.wsi_feature_dir, a.output,
            a.rna_feature_csv, a.batch_size, a.use_ema, a.seed,
            whole_slide=a.whole_slide)


if __name__ == "__main__":
    main()
