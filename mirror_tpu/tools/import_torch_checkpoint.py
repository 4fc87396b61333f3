#!/usr/bin/env python
"""Import a reference PyTorch MIRROR checkpoint into mirror_tpu.

The reference publishes timm-style ``.pth.tar`` checkpoints whose
``state_dict`` keys follow the module tree of
/root/reference/models/mirror.py (MIRROR :720-915, MIRRORClassifier
:921-1015) and whose payload schema is observed in
/root/reference/tools/split_weights.py:46-76 (epoch/arch/state_dict/
version/args/metric, EMA weights under ``state_dict_ema``).  This tool maps
that schema onto the flax param tree so published pretrain weights can
initialize downstream fine-tunes here (the reference consumes them via
non-strict load, train_subtyping.py:740-745 -> our
``checkpoint.load_pretrained``).

Accepted inputs:
- a full pretrain/classifier checkpoint (``--checkpoint``), or
- per-modality split files produced by the reference's split_weights tool
  (``--wsi wsi_*.pth.tar`` / ``--rna rna_*.pth.tar``; their keys lack the
  ``wsi_encoder.``/``rna_encoder.`` prefix, split_weights.py:48-55).

Layout conventions translated (torch -> flax):
- ``nn.Linear.weight`` [out, in] -> ``kernel`` [in, out] (transpose;
  torch computes x @ W.T, flax x @ kernel)
- ``nn.Conv2d.weight`` [out, in/groups, kh, kw] -> HWIO ``kernel``
  [kh, kw, in/groups, out] (PPEG depthwise convs, ref :317-331)
- ``nn.LayerNorm.weight`` -> ``scale`` (bias unchanged)
- NystromAttention ``res_conv.weight`` [heads, 1, K, 1] ->
  ``res_conv_kernel`` verbatim (models/nystrom.py stores the torch layout)
- ``to_out.0`` (Sequential Linear+Dropout) -> ``to_out``;
  ``_fc1.0`` (Sequential Linear+ReLU, ref :346) -> ``fc1``;
  ``blocks.N`` -> ``block_N``; ``retention_blocks.N`` -> ``retention_block_N``
- packed qkv orders agree (q|k|v blocks along the output dim, each
  heads-major), so a plain transpose suffices for ``attn.qkv`` and
  ``attn.to_qkv``.

``to_torch_state_dict`` is the exact inverse, giving users a migration path
back to the reference ecosystem and the tests a round-trip oracle.
"""

import argparse
import logging
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("import_torch")

# torch state_dict wrapper prefixes to strip (DDP / torch.compile)
_WRAP_PREFIXES = ("module.", "_orig_mod.")
# top-level key families of full (non-split) checkpoints
_FULL_PREFIXES = (
    "wsi_encoder.", "rna_encoder.", "style_encoder_mlp.", "style_mu.",
    "style_logstd.", "style_decoder.", "prototypes.", "logit_scale", "head.",
)


def _contig(a: np.ndarray) -> np.ndarray:
    # np.ascontiguousarray promotes 0-d to (1,) — keep scalars (logit_scale)
    # 0-d to match the flax param shape
    return a if a.ndim == 0 else np.ascontiguousarray(a)


def _to_numpy(t: Any) -> np.ndarray:
    """torch tensor (incl. bf16/fp16) or array-like -> float numpy."""
    if hasattr(t, "detach"):  # torch.Tensor
        t = t.detach().cpu()
        if t.dtype.is_floating_point and t.element_size() < 4:
            t = t.float()  # numpy has no bf16; params are fp32 on our side
        return t.numpy()
    return np.asarray(t)


def _translate_parts(parts: List[str]) -> List[str]:
    """Module-path rewrites (everything except the leaf)."""
    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "_fc1" and i + 1 < len(parts) and parts[i + 1] == "0":
            out.append("fc1")
            i += 2
        elif p == "to_out" and i + 1 < len(parts) and parts[i + 1] == "0":
            out.append("to_out")
            i += 2
        elif p in ("blocks", "retention_blocks") and i + 1 < len(parts) and parts[
            i + 1
        ].isdigit():
            out.append(f"{p[:-1]}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return out


def convert_state_dict(
    state_dict: Dict[str, Any]
) -> Tuple[Dict[str, Any], List[str]]:
    """torch state_dict -> nested flax param tree.

    Returns (tree, unmapped_keys). Unknown keys are reported, not fatal —
    ``load_pretrained`` merges non-strictly anyway.
    """
    tree: Dict[str, Any] = {}
    unmapped: List[str] = []
    for key, val in state_dict.items():
        for pref in _WRAP_PREFIXES:
            if key.startswith(pref):
                key = key[len(pref):]
        if key.endswith("num_batches_tracked"):
            continue
        arr = _to_numpy(val)
        parts = key.split(".")
        leaf_name = parts[-1]
        module_parts = _translate_parts(parts[:-1])
        if leaf_name == "weight":
            if module_parts and module_parts[-1] == "res_conv":
                module_parts = module_parts[:-1]
                leaf, out = "res_conv_kernel", arr
            elif arr.ndim == 4:  # Conv2d OIHW -> HWIO
                leaf, out = "kernel", np.transpose(arr, (2, 3, 1, 0))
            elif arr.ndim == 2:  # Linear [out, in] -> [in, out]
                leaf, out = "kernel", arr.T
            elif arr.ndim == 1:  # LayerNorm
                leaf, out = "scale", arr
            else:
                unmapped.append(key)
                continue
        elif leaf_name in ("bias", "gamma"):
            leaf, out = leaf_name, arr
        else:
            # bare parameters: cls_token, mask_token, gene_embed,
            # retention_gene_embed, logit_scale, ...
            leaf, out = leaf_name, arr
        node = tree
        for p in module_parts:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                unmapped.append(key)
                node = None
                break
        if node is None:
            continue
        node[leaf] = _contig(out)
    return tree, unmapped


def to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Exact inverse of convert_state_dict: flax tree -> torch key/value map
    (numpy values; callers torch.as_tensor them to save a .pth.tar)."""
    flat: Dict[str, np.ndarray] = {}

    def untranslate(p: str, parent: Tuple[str, ...]) -> str:
        m = re.fullmatch(r"(retention_block|block)_(\d+)", p)
        if m:
            return f"{m.group(1)}s.{m.group(2)}"
        if p == "fc1" and parent and parent[-1] in ("wsi_encoder",):
            return "_fc1.0"
        if p == "fc1" and not parent:  # split wsi tree root
            return "_fc1.0"
        if p == "to_out":
            return "to_out.0"
        return p

    def walk(node: Any, path: Tuple[str, ...], tpath: Tuple[str, ...]):
        if isinstance(node, dict):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + (k,), tpath + (untranslate(k, path),))
                else:
                    arr = np.asarray(v)
                    if k == "res_conv_kernel":
                        flat[".".join(tpath + ("res_conv", "weight"))] = arr
                    elif k == "kernel":
                        if arr.ndim == 4:
                            flat[".".join(tpath + ("weight",))] = np.transpose(
                                arr, (3, 2, 0, 1)
                            )
                        else:
                            flat[".".join(tpath + ("weight",))] = arr.T
                    elif k == "scale":
                        flat[".".join(tpath + ("weight",))] = arr
                    else:  # bias, gamma, bare params
                        flat[".".join(tpath + (k,))] = arr
        return flat

    walk(params, (), ())
    # "to_out" untranslate is context-free, but nystrom's fc1 sits under
    # wsi_encoder (handled); RNA mlp fc1/fc2 keep their names — torch's timm
    # Mlp uses the same ones.
    return {k: _contig(v) for k, v in flat.items()}


def _is_split_state_dict(sd: Dict[str, Any]) -> bool:
    return not any(
        k.startswith(p) or k == "logit_scale"
        for k in sd
        for p in _FULL_PREFIXES
    )


def _load_torch_payload(path: str) -> Dict[str, Any]:
    import torch

    try:
        payload = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # reference checkpoints embed an argparse Namespace under "args"
        # (timm CheckpointSaver) which weights_only rejects
        _logger.info("weights_only load failed for %s; retrying full pickle", path)
        payload = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(payload, dict):
        raise ValueError(f"{path}: expected a dict checkpoint payload")
    if "state_dict" not in payload:
        # bare state_dict file
        payload = {"state_dict": payload}
    return payload


def _args_text(raw: Any) -> str:
    import yaml

    if isinstance(raw, str):
        return raw
    if raw is None:
        return ""
    try:
        d = vars(raw) if not isinstance(raw, dict) else raw
        return yaml.safe_dump(
            {k: v for k, v in d.items() if isinstance(
                v, (str, int, float, bool, list, tuple, dict, type(None)))},
            default_flow_style=False,
        )
    except Exception:
        return ""


def import_checkpoint(
    checkpoint: Optional[str] = None,
    wsi: Optional[str] = None,
    rna: Optional[str] = None,
) -> Dict[str, Any]:
    """Build a mirror_tpu checkpoint payload from reference torch files."""
    assert checkpoint or wsi or rna, "nothing to import"
    assert not (checkpoint and (wsi or rna)), "--checkpoint excludes --wsi/--rna"

    merged_sd: Dict[str, Any] = {}
    merged_ema: Dict[str, Any] = {}
    meta: Dict[str, Any] = {}

    def ingest(path: str, prefix: str = ""):
        payload = _load_torch_payload(path)
        sd = payload["state_dict"]
        if prefix and not _is_split_state_dict(sd):
            raise ValueError(
                f"{path}: looks like a FULL checkpoint; pass it via --checkpoint"
            )
        if not prefix and _is_split_state_dict(sd):
            raise ValueError(
                f"{path}: looks like a split per-modality file; pass --wsi/--rna"
            )
        for k, v in sd.items():
            merged_sd[prefix + k] = v
        for k, v in (payload.get("state_dict_ema") or {}).items():
            merged_ema[prefix + k] = v
        if not meta:
            meta.update(
                epoch=int(payload.get("epoch", 0) or 0),
                arch=str(payload.get("arch", "") or "mirror"),
                metric=(-1.0 if payload.get("metric") is None
                        else float(payload["metric"])),
                args=_args_text(payload.get("args")),
                src_version=payload.get("version"),
            )

    if checkpoint:
        ingest(checkpoint)
    if wsi:
        ingest(wsi, prefix="wsi_encoder.")
    if rna:
        ingest(rna, prefix="rna_encoder.")

    tree, unmapped = convert_state_dict(merged_sd)
    if unmapped:
        _logger.warning("unmapped torch keys (kept out): %s", unmapped)
    ema_tree: Dict[str, Any] = {}
    if merged_ema:
        ema_tree, ema_unmapped = convert_state_dict(merged_ema)
        if ema_unmapped:
            _logger.warning("unmapped EMA keys: %s", ema_unmapped)
    import jax

    n_leaves = len(jax.tree.leaves(tree))
    _logger.info(
        "imported %d param tensors (%d unmapped) from %s",
        n_leaves, len(unmapped),
        checkpoint or ", ".join(p for p in (wsi, rna) if p),
    )
    return {
        "epoch": meta.get("epoch", 0),
        "step": 0,
        "arch": meta.get("arch", "mirror"),
        "state_dict": tree,
        "ema_state_dict": ema_tree,
        "opt_state": None,
        "metric": meta.get("metric", -1.0),
        "args": meta.get("args", ""),
        "version": 2,
        "imported_from": "torch",
    }



def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert a reference PyTorch MIRROR checkpoint to "
        "a mirror_tpu msgpack checkpoint"
    )
    parser.add_argument("--checkpoint", default=None,
                        help="full pretrain/classifier .pth.tar")
    parser.add_argument("--wsi", default=None,
                        help="split wsi_*.pth.tar (keys without the "
                        "wsi_encoder. prefix)")
    parser.add_argument("--rna", default=None, help="split rna_*.pth.tar")
    parser.add_argument("--output", required=True,
                        help="output .msgpack (or .orbax directory with "
                        "--format orbax)")
    parser.add_argument("--format", default="msgpack",
                        choices=["msgpack", "orbax"])
    args = parser.parse_args(argv)

    from mirror_tpu.train.checkpoint import save_checkpoint_file

    payload = import_checkpoint(args.checkpoint, args.wsi, args.rna)
    # msgpack cannot serialize None: drop empty optional sections
    payload = {k: v for k, v in payload.items() if v is not None}
    save_checkpoint_file(args.output, payload, fmt=args.format)
    _logger.info("wrote %s (%s)", args.output, args.format)
    return os.path.abspath(args.output)


if __name__ == "__main__":
    main()
