"""Patch feature-extraction backbones (flax.linen), TPU-first.

Rebuilds the reference's two feature extractors
(/root/reference/tools/feature_generation/):
- ``ViTB16`` — Phikon is an iBOT-pretrained ViT-B/16 whose CLS embedding of
  the last hidden state is the 768-d patch feature
  (feature_models/phikon.py:5-13 wraps HF ViTModel). Architecture matches HF
  ``ViTModel`` (LN eps 1e-12, learned pos embeddings, GELU) so HF weights
  convert 1:1 via ``load_hf_vit_weights``.
- ``TruncatedResNet50`` — CLAM-style ResNet50 cut after layer3 with adaptive
  average pooling => 1024-d (feature_models/resnet_custom.py:53-127).
  torchvision weights convert via ``load_torch_resnet50_weights``.

Both run in bf16 with fp32 params; BatchNorm uses running statistics
(inference mode) exactly like the reference's frozen eval-mode backbones.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import trunc_normal_init


# ---------------------------------------------------------------------------
# ViT-B/16 (Phikon-compatible)
# ---------------------------------------------------------------------------


class QuantDense(nn.Module):
    """W8A8 dynamically-quantized Dense for inference: per-output-channel
    weight scales + per-token activation scales, s8 x s8 -> s32 on the MXU
    (v5e int8 peak is 2x bf16). Param tree is identical to nn.Dense
    (kernel [in, out] fp32 + bias [out]) so HF/torch weight converters and
    checkpoints are unchanged — quantization happens at trace time from the
    fp32 params. Inference-only (no custom VJP; feature extraction never
    differentiates)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (d, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        # per-output-channel weight quantization (tiny: [d, out] params)
        w_s = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 127.0  # [1, o]
        w_s = jnp.maximum(w_s, 1e-12)
        w_q = jnp.round(kernel / w_s).astype(jnp.int8)
        # per-token dynamic activation quantization
        xf = x.astype(jnp.float32)
        x_s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # [..., 1]
        x_s = jnp.maximum(x_s, 1e-12)
        x_q = jnp.round(xf / x_s).astype(jnp.int8)
        y = jax.lax.dot_general(
            x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * (x_s * w_s) + bias
        return out.astype(self.dtype or x.dtype)


class _DenseParams(nn.Module):
    """Creates the exact param tree of ``nn.Dense`` (kernel [in, out] +
    bias [out], same names/initializers/param_dtype) but returns the raw
    weights instead of applying them — the fused ViT sublayer kernels
    (ops/vit_attn_pallas) consume them directly, so checkpoints and the HF
    weight converter are byte-compatible between the dense and fused paths."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class _LnParams(nn.Module):
    """Creates the exact param tree of ``nn.LayerNorm`` (scale + bias, fp32)
    but returns the raw weights for the fused half-block kernels."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param(
            "scale", nn.initializers.ones, (features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (features,), jnp.float32
        )
        return scale, bias


class ViTSelfAttention(nn.Module):
    num_heads: int = 12
    use_pallas: bool = False
    quant: Optional[str] = None  # None | "int8" (inference-only W8A8)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, fused_ln=None) -> jax.Array:
        """fused_ln: None for the standard post-LN input contract, or
        (ln_scale, ln_bias, eps) — then ``x`` is the PRE-norm residual
        stream and the whole pre-LN half-block (LN + qkv + attention + out
        projection + residual add) runs as one Pallas program."""
        b, n, d = x.shape
        head_dim = d // self.num_heads
        scale = head_dim**-0.5

        def proj(name):
            if self.quant == "int8":
                return QuantDense(d, name=name, dtype=self.dtype)
            return nn.Dense(d, name=name, dtype=self.dtype, param_dtype=jnp.float32)

        if self.use_pallas and self.quant == "int8":
            # int8 projections + fused natural-layout attention: q/k/v stay
            # [b, n, d_model], heads sliced in VMEM (ops/vit_attn_pallas).
            from mirror_tpu.ops.vit_attn_pallas import mha_natural

            q = proj("query")(x)
            k = proj("key")(x)
            v = proj("value")(x)
            out = mha_natural(q, k, v, self.num_heads).astype(x.dtype)
            return proj("output")(out)

        if self.use_pallas and fused_ln is not None:
            # whole-half-block fusion (ops/vit_attn_pallas.attn_block): LN,
            # the q/k/v/out projection GEMMs, natural-layout attention
            # (heads sliced in VMEM), and the residual add in one program —
            # the y/q/k/v/attn-out streams never round-trip HBM and XLA
            # inserts no transposes. Supersedes the losing fused attempts
            # (per-(b,h)-program: 2087 vs 2477 patches/s; head-major
            # blocks: 7.0 vs 5.5 ms) and the partial fusions (attn only
            # 6.31, +projections 5.59 -> 5.78 with LN+residual vs 6.28
            # split). Inference-only (the extractor backbone is frozen,
            # like the reference's eval-mode wrapper).
            from mirror_tpu.ops.vit_attn_pallas import attn_block

            ln_s, ln_b, eps = fused_ln
            cdt = self.dtype or jnp.float32
            wq, bq = _DenseParams(d, name="query")(d)
            wk, bk = _DenseParams(d, name="key")(d)
            wv, bv = _DenseParams(d, name="value")(d)
            wo, bo = _DenseParams(d, name="output")(d)
            bqkv = jnp.concatenate([bq, bk, bv])[None, :].astype(jnp.float32)
            return attn_block(
                x.astype(cdt), ln_s[None, :].astype(jnp.float32),
                ln_b[None, :].astype(jnp.float32), wq.astype(cdt),
                wk.astype(cdt), wv.astype(cdt), bqkv, wo.astype(cdt),
                bo[None, :].astype(jnp.float32), self.num_heads, eps,
            ).astype(x.dtype)

        q = proj("query")(x).reshape(b, n, self.num_heads, head_dim)
        k = proj("key")(x).reshape(b, n, self.num_heads, head_dim)
        v = proj("value")(x).reshape(b, n, self.num_heads, head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, d)
        return proj("output")(out)


class ViTBlock(nn.Module):
    num_heads: int = 12
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-12
    use_pallas: bool = False
    quant: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def ln(name):
            return nn.LayerNorm(
                epsilon=self.norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
                name=name,
            )

        def dense(f, name):
            if self.quant == "int8":
                return QuantDense(f, name=name, dtype=self.dtype)
            return nn.Dense(f, name=name, dtype=self.dtype, param_dtype=jnp.float32)

        d = x.shape[-1]
        if self.use_pallas and self.quant != "int8":
            # two fused half-block kernels per block (ops/vit_attn_pallas
            # .attn_block / .mlp_block): LN + GEMMs + attention/GELU +
            # residual each in one program; between kernels only the
            # [b, n, d] residual stream touches HBM. The [b, n, 4d] hidden
            # stream and its fp32 GELU stay in VMEM (MLP half 8.03 vs 9.23
            # ms/block unfused at B=512).
            from mirror_tpu.ops.vit_attn_pallas import mlp_block

            ln1_s, ln1_b = _LnParams(name="layernorm_before")(d)
            x = ViTSelfAttention(
                self.num_heads, use_pallas=True, quant=self.quant,
                dtype=self.dtype, name="attention",
            )(x, fused_ln=(ln1_s, ln1_b, self.norm_eps))
            ln2_s, ln2_b = _LnParams(name="layernorm_after")(d)
            cdt = self.dtype or jnp.float32
            w1, b1 = _DenseParams(int(d * self.mlp_ratio),
                                  name="intermediate")(d)
            w2, b2 = _DenseParams(d, name="output")(int(d * self.mlp_ratio))
            return mlp_block(
                x.astype(cdt), ln2_s[None, :].astype(jnp.float32),
                ln2_b[None, :].astype(jnp.float32), w1.astype(cdt),
                b1[None, :].astype(jnp.float32), w2.astype(cdt),
                b2[None, :].astype(jnp.float32), self.norm_eps,
            ).astype(x.dtype)
        x = x + ViTSelfAttention(
            self.num_heads, use_pallas=self.use_pallas, quant=self.quant,
            dtype=self.dtype, name="attention",
        )(ln("layernorm_before")(x))
        y = ln("layernorm_after")(x)
        y = dense(int(d * self.mlp_ratio), "intermediate")(y)
        y = nn.gelu(y, approximate=False)
        y = dense(d, "output")(y)
        return x + y


class ViTB16(nn.Module):
    """ViT-B/16 encoder returning the CLS embedding ([B, 768])."""

    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    norm_eps: float = 1e-12
    use_pallas: bool = False
    quant: Optional[str] = None  # "int8": W8A8 GEMMs (see QuantDense)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3] normalized (NHWC)."""
        b = images.shape[0]
        x = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="patch_embed",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(images.astype(self.dtype or jnp.float32))
        x = x.reshape(b, -1, self.hidden_size)
        n_patches = x.shape[1]
        # layers.trunc_normal_init == torch trunc_normal_ (absolute
        # +-2.0 cutoffs, effectively untruncated N(0, 0.02^2)); jax's
        # truncated_normal would cut at +-2 sigma and shrink the init std
        cls = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, self.hidden_size)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.hidden_size)), x],
            axis=1,
        )
        pos = self.param(
            "pos_embed", trunc_normal_init(0.02),
            (1, n_patches + 1, self.hidden_size),
        )
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = ViTBlock(
                self.num_heads, norm_eps=self.norm_eps,
                use_pallas=self.use_pallas, quant=self.quant, dtype=self.dtype,
                name=f"block_{i}",
            )(x)
        x = nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
            name="layernorm",
        )(x)
        return x[:, 0].astype(jnp.float32)


def load_hf_vit_weights(params: Dict, hf_state: Dict[str, Any]) -> Dict:
    """Convert a HF ViTModel state_dict (torch tensors or numpy) into our
    param tree. Keys follow transformers.ViTModel naming."""

    def g(name):
        t = hf_state[name]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    p = jax.tree.map(np.asarray, params)
    emb = "embeddings."
    p["cls_token"] = g(emb + "cls_token")
    p["pos_embed"] = g(emb + "position_embeddings")
    # conv: torch OIHW -> flax HWIO
    p["patch_embed"]["kernel"] = g(
        emb + "patch_embeddings.projection.weight"
    ).transpose(2, 3, 1, 0)
    p["patch_embed"]["bias"] = g(emb + "patch_embeddings.projection.bias")
    # derive the block count from the param tree (not a hard-coded 12):
    # depth != 12 either converts fully or fails loudly below on a missing
    # HF key instead of silently leaving blocks at random init
    depth = sum(1 for k in p if k.startswith("block_"))
    for i in range(depth):
        hb = f"encoder.layer.{i}."
        blk = p[f"block_{i}"]
        for ours, theirs in (
            ("query", "attention.attention.query"),
            ("key", "attention.attention.key"),
            ("value", "attention.attention.value"),
            ("output", "attention.output.dense"),
        ):
            blk["attention"][ours]["kernel"] = g(hb + theirs + ".weight").T
            blk["attention"][ours]["bias"] = g(hb + theirs + ".bias")
        blk["intermediate"]["kernel"] = g(hb + "intermediate.dense.weight").T
        blk["intermediate"]["bias"] = g(hb + "intermediate.dense.bias")
        blk["output"]["kernel"] = g(hb + "output.dense.weight").T
        blk["output"]["bias"] = g(hb + "output.dense.bias")
        blk["layernorm_before"]["scale"] = g(hb + "layernorm_before.weight")
        blk["layernorm_before"]["bias"] = g(hb + "layernorm_before.bias")
        blk["layernorm_after"]["scale"] = g(hb + "layernorm_after.weight")
        blk["layernorm_after"]["bias"] = g(hb + "layernorm_after.bias")
    p["layernorm"]["scale"] = g("layernorm.weight")
    p["layernorm"]["bias"] = g("layernorm.bias")
    return p


# ---------------------------------------------------------------------------
# Truncated ResNet50 (CLAM-style, 1024-d)
# ---------------------------------------------------------------------------


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def conv(f, k, s, name):
            return nn.Conv(
                f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
                use_bias=False, name=name, dtype=self.dtype,
                param_dtype=jnp.float32,
            )

        def bn(name):
            return nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        residual = x
        y = nn.relu(bn("bn1")(conv(self.features, 1, 1, "conv1")(x)))
        y = nn.relu(bn("bn2")(conv(self.features, 3, self.strides, "conv2")(y)))
        y = bn("bn3")(conv(self.features * 4, 1, 1, "conv3")(y))
        if self.downsample:
            residual = bn("downsample_bn")(
                conv(self.features * 4, 1, self.strides, "downsample_conv")(x)
            )
        return nn.relu(y + residual)


class TruncatedResNet50(nn.Module):
    """ResNet50 through layer3 + global average pool => [B, 1024]."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3] normalized (NHWC)."""
        x = images.astype(self.dtype or jnp.float32)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            name="conv1", dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=self.dtype,
            param_dtype=jnp.float32, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        stages = ((64, 3, 1), (128, 4, 2), (256, 6, 2))  # layer1..layer3
        for li, (f, blocks, stride) in enumerate(stages, start=1):
            for bi in range(blocks):
                x = Bottleneck(
                    f,
                    strides=stride if bi == 0 else 1,
                    downsample=bi == 0,
                    dtype=self.dtype,
                    name=f"layer{li}_block{bi}",
                )(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # [B, 1024]


def load_torch_resnet50_weights(params: Dict, torch_state: Dict[str, Any]) -> Dict:
    """Convert torchvision resnet50 state_dict (through layer3) into our
    param/batch_stats trees. Returns {'params': ..., 'batch_stats': ...}."""

    def g(name):
        t = torch_state[name]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    p = jax.tree.map(np.asarray, params["params"])
    bs = jax.tree.map(np.asarray, params["batch_stats"])

    def set_conv(dst, name):
        dst["kernel"] = g(name + ".weight").transpose(2, 3, 1, 0)

    def set_bn(dst_p, dst_s, name):
        dst_p["scale"] = g(name + ".weight")
        dst_p["bias"] = g(name + ".bias")
        dst_s["mean"] = g(name + ".running_mean")
        dst_s["var"] = g(name + ".running_var")

    set_conv(p["conv1"], "conv1")
    set_bn(p["bn1"], bs["bn1"], "bn1")
    blocks = {1: 3, 2: 4, 3: 6}
    for li, nb in blocks.items():
        for bi in range(nb):
            ours_p = p[f"layer{li}_block{bi}"]
            ours_s = bs[f"layer{li}_block{bi}"]
            theirs = f"layer{li}.{bi}"
            for ci in (1, 2, 3):
                set_conv(ours_p[f"conv{ci}"], f"{theirs}.conv{ci}")
                set_bn(ours_p[f"bn{ci}"], ours_s[f"bn{ci}"], f"{theirs}.bn{ci}")
            if bi == 0:
                set_conv(ours_p["downsample_conv"], f"{theirs}.downsample.0")
                set_bn(
                    ours_p["downsample_bn"], ours_s["downsample_bn"],
                    f"{theirs}.downsample.1",
                )
    return {"params": p, "batch_stats": bs}


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_images(uint8_images: np.ndarray) -> np.ndarray:
    """uint8 [B, H, W, 3] RGB -> ImageNet-normalized float32 (the reference's
    albumentations Normalize, dataset_feature_generation.py:55-72)."""
    x = uint8_images.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def device_normalize(uint8_images: jax.Array) -> jax.Array:
    """The same ImageNet normalization, jitted ON DEVICE from uint8 input:
    the feature-gen pipeline ships raw uint8 batches host->device (77 MB at
    B=512 vs 308 MB normalized fp32 — 4x less PCIe/tunnel traffic) and the
    cast+normalize fuses into the patch-embed prologue."""
    x = uint8_images.astype(jnp.float32) * (1.0 / 255.0)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std
