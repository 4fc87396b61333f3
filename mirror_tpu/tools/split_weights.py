#!/usr/bin/env python
"""Split a MIRROR pretrain checkpoint into per-modality weight files.

Semantics of /root/reference/tools/split_weights.py:28-79: load the latest
per-fold checkpoint, split the state dict into ``wsi_encoder.*`` /
``rna_encoder.*`` subsets (dropping mask tokens), and re-wrap each with the
epoch/arch/args/metric/version payload keys as ``wsi_<name>`` /
``rna_<name>`` files next to the original.
"""

import argparse
import glob
import os

from mirror_tpu.train.checkpoint import load_checkpoint_file, save_checkpoint_file


def split_weights(checkpoint_path: str, output_dir: str = "") -> None:
    payload = load_checkpoint_file(checkpoint_path)
    params = payload["state_dict"]
    out_dir = output_dir or os.path.dirname(checkpoint_path)
    base = os.path.basename(checkpoint_path)
    for modality in ("wsi", "rna"):
        enc_key = f"{modality}_encoder"
        if enc_key not in params:
            raise SystemExit(f"checkpoint has no {enc_key} params")
        enc_params = {
            k: v for k, v in params[enc_key].items() if k != "mask_token"
        }
        out_payload = {
            "epoch": payload.get("epoch", -1),
            "arch": payload.get("arch", ""),
            "state_dict": {enc_key: enc_params},
            "ema_state_dict": {},
            "opt_state": None,
            "metric": payload.get("metric"),
            "args": payload.get("args", ""),
            "version": payload.get("version", 2),
        }
        out_path = os.path.join(out_dir, f"{modality}_{base}")
        save_checkpoint_file(out_path, out_payload)
        n = len(list(_leaves(enc_params)))
        print(f"{out_path}: {n} tensors")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def find_latest_checkpoint(run_root: str, pattern: str = "model_best*") -> str:
    """Latest timestamped run dir's best checkpoint (the evaluator's
    discovery rule, ref tools/downstream_tasks_evaluator.py:114-116)."""
    candidates = sorted(glob.glob(os.path.join(run_root, "*", pattern)))
    if not candidates:
        raise SystemExit(f"No checkpoints under {run_root}")
    return candidates[-1]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help="checkpoint file or run directory")
    p.add_argument("--output-dir", default="")
    a = p.parse_args()
    path = a.checkpoint
    # orbax checkpoints ARE directories; only treat a dir as a run dir to
    # search when it is not itself a loadable checkpoint
    if os.path.isdir(path) and not path.rstrip("/").endswith(".orbax"):
        path = find_latest_checkpoint(path)
    split_weights(path, a.output_dir)


if __name__ == "__main__":
    main()
