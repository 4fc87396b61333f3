"""jax.export serving artifacts: the serialized StableHLO program must
reproduce the live model's outputs (weights baked in; equality up to float
noise from independent XLA compilation of the same program)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mirror_tpu.registry import create_model
from mirror_tpu.tools.export_model import export_model
from mirror_tpu.train.checkpoint import CheckpointSaver
from mirror_tpu.train.state import create_train_state

TINY = dict(
    wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, rna_mlp_ratio=2.0,
)


def _save_ckpt(tmp_path, model_name, init_args, model_kwargs):
    model = create_model(model_name, **model_kwargs)
    k = jax.random.PRNGKey(0)
    rngs = dict(
        zip(["params", "dropout", "masking", "style"], jax.random.split(k, 4))
    )
    params = model.init(rngs, *init_args)["params"]
    state = create_train_state(params, optax.adam(1e-3), model_ema=False)
    saver = CheckpointSaver(str(tmp_path), decreasing=True, async_save=False)
    saver.save_checkpoint(state, 0, 1.0)
    return model, params, str(tmp_path / "model_best.msgpack")


def test_export_classifier_roundtrip(tmp_path):
    mk = {**TINY, "num_classes": 3, "fusion": "concat"}
    wsi = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    rna = jax.random.normal(jax.random.PRNGKey(2), (2, 96))
    model, params, ckpt = _save_ckpt(
        tmp_path, "mirror_classifier", (wsi, rna, True), mk
    )
    out_path = str(tmp_path / "clf.stablehlo")
    manifest = export_model(
        "classifier", "mirror_classifier", ckpt, out_path,
        batch=2, num_tokens=16, wsi_dim=32, rna_dim=96, model_kwargs=mk,
    )
    assert manifest["inputs"]["wsi"] == [2, 16, 32]
    assert os.path.exists(out_path) and os.path.exists(out_path + ".json")
    assert json.load(open(out_path + ".json"))["mode"] == "classifier"

    from jax import export as jexport

    restored = jexport.deserialize(open(out_path, "rb").read())
    got = restored.call(wsi, rna)
    want = model.apply({"params": params}, wsi, rna, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_export_embed_roundtrip(tmp_path):
    mk = {
        **TINY, "wsi_num_tokens": 16, "num_prototypes": 8,
        "style_mlp_hidden_dim": 16, "style_mlp_out_dim": 12,
        "style_latent_dim": 6,
    }
    wsi = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    rna = jax.random.normal(jax.random.PRNGKey(2), (2, 96))
    model, params, ckpt = _save_ckpt(
        tmp_path, "mirror", (wsi, rna, 0.75, 0.75, True), mk
    )
    out_path = str(tmp_path / "emb.stablehlo")
    export_model(
        "embed", "mirror", ckpt, out_path,
        batch=2, num_tokens=16, wsi_dim=32, rna_dim=96, model_kwargs=mk,
    )
    from jax import export as jexport

    restored = jexport.deserialize(open(out_path, "rb").read())
    wsi_e, rna_e = restored.call(wsi, rna)
    assert wsi_e.shape == (2, 48) and rna_e.shape == (2, 48)
    assert bool(jnp.isfinite(wsi_e).all() and jnp.isfinite(rna_e).all())


def test_export_cli_model_kwargs(tmp_path):
    """The CLI path parses k=v model kwargs and writes the artifact."""
    mk = {**TINY, "num_classes": 2, "fusion": "concat"}
    wsi = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32))
    rna = jax.random.normal(jax.random.PRNGKey(2), (1, 96))
    _, _, ckpt = _save_ckpt(tmp_path, "mirror_classifier", (wsi, rna, True), mk)
    out = str(tmp_path / "cli.stablehlo")

    from mirror_tpu.tools.export_model import main

    main([
        "--checkpoint", ckpt, "--output", out, "--mode", "classifier",
        "--model", "mirror_classifier", "--batch", "1", "--num-tokens", "16",
        "--wsi-dim", "32", "--rna-dim", "96",
        "--model-kwargs", "wsi_embed_dim=32", "rna_embed_dim=96",
        "embed_dim=48", "rna_mlp_ratio=2.0", "num_classes=2",
        "fusion=concat",
    ])
    assert os.path.exists(out)
    assert json.load(open(out + ".json"))["inputs"]["wsi"] == [1, 16, 32]
