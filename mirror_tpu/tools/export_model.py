#!/usr/bin/env python
"""Export a trained model's inference function as a serialized StableHLO
artifact (``jax.export``) for serving.

The reference has no deployment story beyond torch checkpoints; on TPU the
natural serving unit is an ahead-of-time-exportable XLA program: the
artifact is self-contained (weights baked in as constants), runs from any
JAX process via ``jax.export.deserialize(blob).call(...)`` without the
model code, and can be loaded by other StableHLO consumers.

Modes (``--mode``):
- ``classifier`` — MIRRORClassifier logits ``f(wsi [B,T,D], rna [B,R]) ->
  [B, num_classes]`` (also the survival head: same signature, hazards
  logits).
- ``embed``     — MIRROR pretrain encoders' aligned embeddings
  ``f(wsi, rna) -> (wsi_emb [B,E], rna_emb [B,E])`` for retrieval /
  downstream probes.

Shapes are static (fixed serving batch); export once per batch size you
serve. A JSON manifest with shapes/dtypes/mode is written alongside.
"""

import argparse
import json
import logging
import os

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("export_model")


def build_inference_fn(mode: str, model_name: str, ckpt_path: str,
                       model_kwargs: dict):
    import jax

    from mirror_tpu.registry import create_model
    from mirror_tpu.train.checkpoint import load_checkpoint_file

    payload = load_checkpoint_file(ckpt_path)
    model = create_model(model_name, **model_kwargs)
    params = payload["state_dict"]

    if mode == "classifier":
        def fn(wsi, rna):
            return model.apply({"params": params}, wsi, rna, True)
    elif mode == "embed":
        def fn(wsi, rna):
            out = model.apply(
                {"params": params}, wsi, rna, 0.0, 0.0, True,
                rngs={"masking": jax.random.PRNGKey(0),
                      "style": jax.random.PRNGKey(0)},
            )
            # MIRROR forward returns the reference 15-tuple (MirrorOutput):
            # wsi_alignment_emb is field 0, rna_alignment_emb field 7
            return out[0], out[7]
    else:
        raise SystemExit(f"unknown mode {mode}")
    return fn


def export_model(
    mode: str,
    model_name: str,
    ckpt_path: str,
    output: str,
    batch: int,
    num_tokens: int,
    wsi_dim: int,
    rna_dim: int,
    model_kwargs: dict,
) -> dict:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fn = build_inference_fn(mode, model_name, ckpt_path, model_kwargs)
    wsi_spec = jax.ShapeDtypeStruct((batch, num_tokens, wsi_dim), jnp.float32)
    rna_spec = jax.ShapeDtypeStruct((batch, rna_dim), jnp.float32)
    exported = jexport.export(jax.jit(fn))(wsi_spec, rna_spec)
    blob = exported.serialize()
    with open(output, "wb") as f:
        f.write(blob)
    manifest = {
        "mode": mode,
        "model": model_name,
        "checkpoint": os.path.abspath(ckpt_path),
        "inputs": {
            "wsi": [batch, num_tokens, wsi_dim],
            "rna": [batch, rna_dim],
        },
        "dtype": "float32",
        "bytes": len(blob),
        "platforms": list(exported.platforms),
    }
    with open(output + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    _logger.info("exported %s (%d bytes) -> %s", mode, len(blob), output)
    return manifest


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True, help="output .stablehlo path")
    p.add_argument("--mode", default="classifier",
                   choices=["classifier", "embed"])
    p.add_argument("--model", default="mirror_classifier")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--num-tokens", type=int, default=2048)
    p.add_argument("--wsi-dim", type=int, default=768)
    p.add_argument("--rna-dim", type=int, default=10234)
    from mirror_tpu.config import ParseKwargs

    p.add_argument("--model-kwargs", nargs="*", default={}, action=ParseKwargs,
                   help="k=v pairs forwarded to the model registry")
    a = p.parse_args(argv)
    from mirror_tpu.utils import apply_forced_platform

    apply_forced_platform()  # launcher 'cpu' slot contract (utils/platform.py)
    export_model(a.mode, a.model, a.checkpoint, a.output, a.batch,
                 a.num_tokens, a.wsi_dim, a.rna_dim, a.model_kwargs or {})


if __name__ == "__main__":
    main()
