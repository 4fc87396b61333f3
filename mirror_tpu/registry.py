"""Model registry mirroring the reference's timm-registry surface.

``create_model("mirror", **kwargs)`` filters accepted kwargs and warns about
extras, exactly like the reference registry functions
(/root/reference/models/mirror.py:1018-1083). Config conveniences handled
here:
- ``rna_norm_layer``: "layernorm" -> LayerNorm eps 1e-5 (torch default);
  None/"" -> eps 1e-6 (the reference's partial(nn.LayerNorm, eps=1e-6)).
- ``rna_act_layer``: only "gelu" (the reference default) is supported.
- extra TPU-only kwargs: ``dtype`` ("bfloat16"/"float32") and ``use_pallas``.
"""

import logging
from typing import Any, Callable, Dict

import jax.numpy as jnp

from .models import MIRROR, MIRRORClassifier
from .models.dual import MIRRORDual

_logger = logging.getLogger(__name__)

_REGISTRY: Dict[str, Callable] = {}


def register_model(fn: Callable) -> Callable:
    _REGISTRY[fn.__name__] = fn
    return fn


def list_models():
    return sorted(_REGISTRY)


def create_model(name: str, **kwargs: Any):
    if name not in _REGISTRY:
        raise ValueError(f"Unknown model '{name}'; available: {list_models()}")
    return _REGISTRY[name](**kwargs)


def _resolve_common(kwargs: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(kwargs)
    norm_layer = out.pop("rna_norm_layer", None)
    if norm_layer in ("layernorm", "layer_norm"):
        # setdefault: an explicitly supplied eps must win over the
        # "layernorm" preset (the assignment form silently clobbered it)
        out.setdefault("rna_norm_eps", 1e-5)
    elif norm_layer in (None, ""):
        out.setdefault("rna_norm_eps", 1e-6)
    else:
        raise ValueError(f"Unsupported rna_norm_layer: {norm_layer!r}")
    act_layer = out.pop("rna_act_layer", None)
    if act_layer not in (None, "", "gelu"):
        raise ValueError(f"Unsupported rna_act_layer: {act_layer!r}")
    dtype = out.pop("dtype", None)
    if isinstance(dtype, str):
        out["dtype"] = jnp.dtype(dtype)
    elif dtype is not None:
        out["dtype"] = dtype
    return out


def _filter(kwargs: Dict[str, Any], accepted: set) -> Dict[str, Any]:
    filtered = {k: v for k, v in kwargs.items() if k in accepted}
    dropped = [k for k in kwargs if k not in accepted]
    if dropped:
        _logger.warning("Filtered model kwargs: %s", ", ".join(dropped))
    return filtered


@register_model
def mirror(**kwargs: Any) -> MIRROR:
    accepted = {
        "wsi_embed_dim", "rna_embed_dim", "embed_dim", "wsi_num_tokens",
        "wsi_retention_decoder_depth", "rna_encoder_depth", "rna_gene_embed",
        "rna_mlp_ratio", "rna_pos_drop_rate", "rna_proj_drop_rate",
        "rna_attn_drop_rate", "rna_drop_path_rate", "rna_norm_eps",
        "rna_retention_decoder_depth", "init_logit_scale",
        "style_mlp_hidden_dim", "style_mlp_out_dim", "style_latent_dim",
        "num_prototypes", "use_pallas", "pinv_grad", "grad_checkpointing", "dtype",
    }
    return MIRROR(**_filter(_resolve_common(kwargs), accepted))


@register_model
def mirror_dual(**kwargs: Any) -> MIRRORDual:
    accepted = {
        "wsi_embed_dim", "rna_embed_dim", "embed_dim", "projection_dim",
        "rna_encoder_depth", "rna_gene_embed", "rna_mlp_ratio",
        "rna_pos_drop_rate", "rna_proj_drop_rate", "rna_attn_drop_rate",
        "rna_drop_path_rate", "rna_norm_eps", "use_pallas", "pinv_grad",
        "grad_checkpointing", "dtype",
    }
    return MIRRORDual(**_filter(_resolve_common(kwargs), accepted))


@register_model
def mirror_classifier(**kwargs: Any) -> MIRRORClassifier:
    accepted = {
        "wsi_embed_dim", "rna_embed_dim", "embed_dim", "rna_encoder_depth",
        "rna_gene_embed", "rna_mlp_ratio", "rna_pos_drop_rate",
        "rna_proj_drop_rate", "rna_attn_drop_rate", "rna_drop_path_rate",
        "rna_norm_eps", "num_classes", "fusion", "use_pallas", "pinv_grad", "grad_checkpointing", "dtype",
    }
    return MIRRORClassifier(**_filter(_resolve_common(kwargs), accepted))
