#!/usr/bin/env python
"""Whole-slide embedding: encode EVERY patch of each slide with the
pretrained TransMIL WSI encoder, the patch-token axis sharded across all
chips (context parallelism) — no 2048-token subsampling.

This is the user-facing entry for the capability SURVEY.md section 5.7
describes: the reference caps each slide at ``num_wsi_feature_tokens``
random patches (ref datasets/dataset_pretrain.py:157-161) because one GPU
must hold the sequence; here a slide with tens of thousands of patches is
encoded exactly, with the Nystrom softmaxes computed distributed-exact
(mirror_tpu/parallel/context_parallel.py).

Usage:
  python -m mirror_tpu.tools.encode_slide \
      --wsi-feature-dir feats/ --checkpoint runs/.../model_best.msgpack \
      --output slide_embeddings/ [--save full|cls] [--dtype bfloat16]

Accepts either a full pretrain checkpoint (state_dict with ``wsi_encoder``)
or a ``wsi_*.msgpack`` produced by tools/split_weights.py.
"""

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from mirror_tpu.data.formats import list_feature_files, load_feature_file
from mirror_tpu.parallel import create_mesh
from mirror_tpu.parallel.context_parallel import (
    transmil_encode_cp,
    wrap_pad_square,
)
from mirror_tpu.train.checkpoint import load_checkpoint_file

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("encode_slide")


def wsi_encoder_params(checkpoint_path: str) -> dict:
    payload = load_checkpoint_file(checkpoint_path)
    params = payload["state_dict"]
    if "wsi_encoder" in params:
        return params["wsi_encoder"]
    # split_weights output: the encoder tree at the top level
    if "fc1" in params:
        return params
    raise SystemExit(
        f"checkpoint {checkpoint_path} has no wsi_encoder params "
        f"(top-level keys: {sorted(params)[:8]})"
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wsi-feature-dir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--save", choices=["cls", "full"], default="cls",
                   help="'cls': [D] slide embedding; 'full': [1+n, D] "
                        "normed sequence (cls row 0, then one row per REAL "
                        "patch — the wrap-pad duplicate rows are trimmed)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--skip-existing", action="store_true", default=True)
    p.add_argument("--no-skip-existing", dest="skip_existing",
                   action="store_false")
    args = p.parse_args(argv)

    from mirror_tpu.utils import apply_forced_platform

    apply_forced_platform()
    mesh = create_mesh()
    params = wsi_encoder_params(args.checkpoint)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    os.makedirs(args.output, exist_ok=True)

    files = list_feature_files(args.wsi_feature_dir)
    _logger.info(
        "encoding %d slides over %d chips (whole-slide, no subsampling)",
        len(files), mesh.devices.size,
    )
    # slides are wrap-padded to their square host-side (the encoder's own
    # pad hoisted out — same math), so one compiled program serves every
    # slide with the same ceil(sqrt(n)); cls row is index 0
    encode = jax.jit(
        lambda tokens: transmil_encode_cp(
            params, tokens, mesh, axis_name="data",
            heads=args.heads, dtype=dtype,
        )
    )
    done = 0
    for fname in files:
        slide_id = fname.split(".")[0]
        out_path = os.path.join(args.output, slide_id + ".npy")
        if args.skip_existing and os.path.exists(out_path):
            continue
        feats = np.asarray(
            load_feature_file(os.path.join(args.wsi_feature_dir, fname)),
            np.float32,
        )
        n_real = feats.shape[0]
        out = encode(jnp.asarray(wrap_pad_square(feats)))
        out = np.asarray(out, np.float32)
        # rows: [0] cls, [1 : n_real+1] real patches, then wrap-pad
        # duplicates (appended last by wrap_pad_square) — trim the pads so
        # 'full' rows map 1:1 onto the slide's patches
        np.save(out_path, out[0] if args.save == "cls" else out[: n_real + 1])
        done += 1
        if done % 25 == 0:
            _logger.info("%d slides encoded", done)
    _logger.info("done: %d slides -> %s", done, args.output)


if __name__ == "__main__":
    main()
