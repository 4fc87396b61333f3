"""Pure-functional torch oracle of the reference MIRROR network + loss.

Test fixture ONLY. The reference implementation
(/root/reference/models/mirror.py, losses/mirror_loss.py) cannot run here
(timm / nystrom_attention are not installed), so this module transcribes its
MATH — every function cites the reference lines it reproduces — into plain
torch functions over a flat ``state_dict``-style parameter mapping (the exact
key/value layout produced by
``mirror_tpu.tools.import_torch_checkpoint.to_torch_state_dict``).

Deliberately structured NOTHING like the reference: no nn.Module, no
classes, no registration — parameters in, tensors out — so the oracle and
the production flax code share only the semantics they must.

Stochastic elements (MAE masking noise, VAE reparameterization eps) are
INJECTED as explicit tensor arguments — the "inject-noise hook" SURVEY.md
hard-part #2 calls for — so the same draws can be fed to both frameworks.

Everything runs in eval semantics (dropout/droppath off), fp32.
"""

import math
from typing import Dict, Optional, Tuple

import torch
import torch.nn.functional as F

Params = Dict[str, torch.Tensor]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def linear(p: Params, key: str, x: torch.Tensor) -> torch.Tensor:
    return F.linear(x, p[f"{key}.weight"], p.get(f"{key}.bias"))


def layer_norm(p: Params, key: str, x: torch.Tensor, eps: float) -> torch.Tensor:
    return F.layer_norm(
        x, (x.shape[-1],), p[f"{key}.weight"], p[f"{key}.bias"], eps
    )


def mlp(p: Params, key: str, x: torch.Tensor, norm_eps: float = 1e-6) -> torch.Tensor:
    """timm-style Mlp: fc1 -> GELU -> [norm] -> fc2 (used by the reference's
    RNA embedding, models/mirror.py:217-224, and the style encoder :815-822;
    the mid-norm exists only when a norm_layer was passed, i.e. when
    ``{key}.norm.weight`` is present in the state_dict)."""
    x = F.gelu(linear(p, f"{key}.fc1", x))
    if f"{key}.norm.weight" in p:
        x = layer_norm(p, f"{key}.norm", x, norm_eps)
    return linear(p, f"{key}.fc2", x)


def maybe_layerscale(p: Params, key: str, x: torch.Tensor) -> torch.Tensor:
    """timm LayerScale (enabled iff init_values; ref mirror.py:132-134)."""
    g = p.get(f"{key}.gamma")
    return x if g is None else x * g


# ---------------------------------------------------------------------------
# RNA branch (single-vector transformer; ref mirror.py:50-289)
# ---------------------------------------------------------------------------

def rna_attention(p: Params, key: str, x: torch.Tensor, num_heads: int) -> torch.Tensor:
    """Heads-as-sequence attention over a single vector (ref :77-102):
    [B, D] -> qkv [B, 3, h, dh]; softmax attention over the HEADS axis; the
    merge transposes (1, 2) before flattening (a feature-order scramble
    relative to the qkv split) — reproduced exactly."""
    bsz, dim = x.shape
    head_dim = dim // num_heads
    qkv = linear(p, f"{key}.qkv", x).reshape(bsz, 3, num_heads, head_dim)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    attn = torch.softmax((q * head_dim ** -0.5) @ k.transpose(-2, -1), dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(bsz, dim)
    return linear(p, f"{key}.proj", out)


def rna_block(
    p: Params, key: str, x: torch.Tensor, num_heads: int, norm_eps: float
) -> torch.Tensor:
    """Pre-norm block, ref :149-152 (eval: DropPath is identity)."""
    y = rna_attention(p, f"{key}.attn", layer_norm(p, f"{key}.norm1", x, norm_eps), num_heads)
    x = x + maybe_layerscale(p, f"{key}.ls1", y)
    y = mlp(p, f"{key}.mlp", layer_norm(p, f"{key}.norm2", x, norm_eps), norm_eps)
    return x + maybe_layerscale(p, f"{key}.ls2", y)


def transformer_encode(
    p: Params, key: str, x: torch.Tensor, depth: int,
    num_heads: int = 12, norm_eps: float = 1e-6,
) -> torch.Tensor:
    """TransFormer.forward (ref :283-289): Mlp embedding w/ mid-norm, additive
    gene embedding, blocks, final norm (pre_norm off by default)."""
    x = mlp(p, f"{key}.embedding", x, norm_eps)
    ge = p.get(f"{key}.gene_embed")
    if ge is not None:
        x = x + ge
    for i in range(depth):
        x = rna_block(p, f"{key}.blocks.{i}", x, num_heads, norm_eps)
    return layer_norm(p, f"{key}.norm", x, norm_eps)


def l2norm(x: torch.Tensor) -> torch.Tensor:
    """F.normalize(p=2, dim=-1) with the fp32 eps branch (ref :539-540)."""
    return F.normalize(x, dim=-1, p=2, eps=1e-12)


def rna_scalar_masking(
    x: torch.Tensor, mask_token: torch.Tensor, noise: torch.Tensor, mask_ratio: float
) -> Tuple[torch.Tensor, torch.Tensor]:
    """Scalar-level MAE masking over features (ref :510-533), with the noise
    draw injected. Reproduces the gather-based reconstruction verbatim so the
    flax side's ``where(rank >= len_keep, ...)`` equivalence is TESTED, not
    assumed."""
    bsz, n = x.shape
    len_keep = int(n * (1 - mask_ratio))
    ids_shuffle = torch.argsort(noise, dim=1)
    ids_restore = torch.argsort(ids_shuffle, dim=1)
    kept = torch.gather(x, 1, ids_shuffle[:, :len_keep])
    filler = mask_token.repeat(bsz, n - len_keep)
    x_masked = torch.gather(torch.cat([kept, filler], dim=1), 1, ids_restore)
    mask = torch.ones(bsz, n)
    mask[:, :len_keep] = 0
    mask = torch.gather(mask, 1, ids_restore)
    return x_masked, mask


# ---------------------------------------------------------------------------
# WSI branch (TransMIL; ref mirror.py:295-380, 575-714)
# ---------------------------------------------------------------------------

def moore_penrose_pinv(x: torch.Tensor, iters: int = 6) -> torch.Tensor:
    """The nystrom_attention package's iterative pseudo-inverse as used by the
    reference (instantiated at mirror.py:299-309 with pinv_iterations=6):
    z0 = x^T / (max(row-sums) * max(col-sums)) with GLOBAL maxima over all
    batch/head dims (the scaling quirk), then 6 iterations of
    z <- z/4 (13I - xz(15I - xz(7I - xz)))."""
    ax = x.abs()
    z = x.transpose(-2, -1) / (ax.sum(dim=-1).max() * ax.sum(dim=-2).max())
    eye = torch.eye(x.shape[-1], dtype=x.dtype)
    for _ in range(iters):
        xz = x @ z
        z = 0.25 * z @ (13.0 * eye - xz @ (15.0 * eye - xz @ (7.0 * eye - xz)))
    return z


def nystrom_attention(
    p: Params, key: str, x: torch.Tensor,
    heads: int, dim_head: int, num_landmarks: int,
    pinv_iterations: int = 6, conv_kernel: int = 33,
) -> torch.Tensor:
    """Nystrom linear attention as the reference consumes it from the
    ``nystrom_attention`` pip package (hyperparams fixed at mirror.py:299-309;
    algorithm steps documented in mirror_tpu/models/nystrom.py:1-28): front
    zero-pad to a landmark multiple, bias-free packed qkv, contiguous-group
    landmark means, three softmaxes, Moore-Penrose pinv of the middle matrix,
    depthwise (per-head) conv residual over the value path, trim the pad."""
    bsz, n, _ = x.shape
    inner = heads * dim_head
    pad = (num_landmarks - n % num_landmarks) % num_landmarks
    if pad:
        x = F.pad(x, (0, 0, pad, 0))
    n_pad = n + pad

    qkv = F.linear(x, p[f"{key}.to_qkv.weight"])  # bias-free
    q, k, v = (
        t.reshape(bsz, n_pad, heads, dim_head).permute(0, 2, 1, 3)
        for t in qkv.split(inner, dim=-1)
    )
    q = q * dim_head ** -0.5

    group = n_pad // num_landmarks
    q_l = q.reshape(bsz, heads, num_landmarks, group, dim_head).mean(dim=3)
    k_l = k.reshape(bsz, heads, num_landmarks, group, dim_head).mean(dim=3)

    attn1 = torch.softmax(q @ k_l.transpose(-2, -1), dim=-1)
    attn2 = torch.softmax(q_l @ k_l.transpose(-2, -1), dim=-1)
    attn3 = torch.softmax(q_l @ k.transpose(-2, -1), dim=-1)

    out = attn1 @ moore_penrose_pinv(attn2, pinv_iterations) @ (attn3 @ v)
    # residual=True: Conv2d(heads, heads, (K, 1), pad (K//2, 0), groups=heads,
    # no bias) over [b, heads, n_pad, dim_head]
    out = out + F.conv2d(
        v, p[f"{key}.res_conv.weight"], padding=(conv_kernel // 2, 0), groups=heads
    )
    out = out.permute(0, 2, 1, 3).reshape(bsz, n_pad, inner)
    out = linear(p, f"{key}.to_out.0", out)
    return out[:, -n:]


def translayer(p: Params, key: str, x: torch.Tensor, dim: int) -> torch.Tensor:
    """Pre-norm Nystrom residual block, dim-derived hyperparams
    (ref :295-314): dim_head=dim//8, heads=8, landmarks=dim//2."""
    y = layer_norm(p, f"{key}.norm", x, 1e-5)
    return x + nystrom_attention(
        p, f"{key}.attn", y, heads=8, dim_head=dim // 8, num_landmarks=dim // 2
    )


def ppeg(p: Params, key: str, x: torch.Tensor, h: int, w: int) -> torch.Tensor:
    """Pyramid position encoding (ref :317-331): 7/5/3 depthwise convs over
    the token grid summed with the identity; cls token bypasses."""
    bsz, _, c = x.shape
    cls_tok, feat = x[:, :1], x[:, 1:]
    img = feat.transpose(1, 2).reshape(bsz, c, h, w)
    acc = img
    for name, ks in (("proj", 7), ("proj1", 5), ("proj2", 3)):
        acc = acc + F.conv2d(
            img, p[f"{key}.{name}.weight"], p[f"{key}.{name}.bias"],
            padding=ks // 2, groups=c,
        )
    return torch.cat([cls_tok, acc.flatten(2).transpose(1, 2)], dim=1)


def transmil_encode(
    p: Params, key: str, h: torch.Tensor, embed_dim: int
) -> Tuple[torch.Tensor, int]:
    """Shared FeatureTransMIL trunk (ref :352-380 == hybrid :651-679):
    Linear+ReLU embed, wrap-pad to the next square grid, cls token,
    layer1 -> PPEG -> layer2, final LayerNorm. Returns (full normed sequence,
    pad length)."""
    h = F.relu(linear(p, f"{key}._fc1.0", h))
    n = h.shape[1]
    side = int(math.ceil(math.sqrt(n)))
    add = side * side - n
    if add:
        h = torch.cat([h, h[:, :add]], dim=1)
    h = torch.cat([p[f"{key}.cls_token"].expand(h.shape[0], -1, -1), h], dim=1)
    h = translayer(p, f"{key}.layer1", h, embed_dim)
    h = ppeg(p, f"{key}.pos_layer", h, side, side)
    h = translayer(p, f"{key}.layer2", h, embed_dim)
    return layer_norm(p, f"{key}.norm", h, 1e-5), add


def wsi_token_masking(
    h: torch.Tensor, mask_token: torch.Tensor, noise: torch.Tensor, mask_ratio: float
) -> Tuple[torch.Tensor, torch.Tensor]:
    """Token-level MAE masking (ref :624-649), gather-based, noise injected."""
    bsz, n, c = h.shape
    len_keep = int(n * (1 - mask_ratio))
    ids_shuffle = torch.argsort(noise, dim=1)
    ids_restore = torch.argsort(ids_shuffle, dim=1)
    idx = ids_shuffle[:, :len_keep].unsqueeze(-1).repeat(1, 1, c)
    kept = torch.gather(h, 1, idx)
    filler = mask_token.repeat(bsz, n - len_keep, 1)
    h_masked = torch.gather(
        torch.cat([kept, filler], dim=1),
        1, ids_restore.unsqueeze(-1).repeat(1, 1, c),
    )
    mask = torch.ones(bsz, n)
    mask[:, :len_keep] = 0
    mask = torch.gather(mask, 1, ids_restore)
    return h_masked, mask


# ---------------------------------------------------------------------------
# MIRROR (ref mirror.py:720-915) and MIRRORClassifier (:921-1015)
# ---------------------------------------------------------------------------

def style_clustering(
    p: Params, emb: torch.Tensor, eps: torch.Tensor
) -> Tuple[torch.Tensor, torch.Tensor, torch.Tensor]:
    """One modality of forward_style_clustering (ref :835-858) with the
    N(0,1) reparameterization draw injected: score, mu, logstd."""
    e = mlp(p, "style_encoder_mlp", emb)
    mu = linear(p, "style_mu", e)
    logstd = linear(p, "style_logstd", e)
    z = mu + torch.exp(0.5 * logstd) * eps  # Normal(mu, std).rsample()
    z = linear(p, "style_decoder", z)
    return F.linear(z, p["prototypes.weight"]), mu, logstd


def mirror_forward(
    p: Params,
    wsi_emb: torch.Tensor,
    rna_emb: torch.Tensor,
    wsi_noise: torch.Tensor,
    rna_noise: torch.Tensor,
    wsi_eps: torch.Tensor,
    rna_eps: torch.Tensor,
    embed_dim: int,
    wsi_mask_ratio: float = 0.75,
    rna_mask_ratio: float = 0.75,
    rna_depth: int = 2,
    rna_num_heads: int = 12,
    rna_norm_eps: float = 1e-6,
    wsi_retention_depth: int = 1,
    rna_retention_depth: int = 1,
) -> Tuple[torch.Tensor, ...]:
    """MIRROR.forward (ref :860-915): both hybrid branches inlined so the
    style path sees the raw (unnormalized) wsi cls row and rna encoding
    exactly as :883-897 does. Returns the 15-tuple in order (:899-915)."""
    # WSI branch (forward_encoder + forward_decoders, ref :883-887)
    h, add = transmil_encode(p, "wsi_encoder", wsi_emb, embed_dim)
    if add:
        h = h[:, : h.shape[1] - add]
    w_align = linear(p, "wsi_encoder.alignment_head", l2norm(h)[:, 0])
    r = linear(p, "wsi_encoder.retention_embed", h)
    r_tok, w_mask = wsi_token_masking(
        r[:, 1:], p["wsi_encoder.mask_token"], wsi_noise, wsi_mask_ratio
    )
    r = torch.cat([r[:, :1], r_tok], dim=1) + p["wsi_encoder.retention_gene_embed"]
    for i in range(wsi_retention_depth):
        r = translayer(p, f"wsi_encoder.retention_blocks.{i}", r, embed_dim)
    r = layer_norm(p, "wsi_encoder.retention_norm", r, 1e-5)
    w_ret = linear(p, "wsi_encoder.retention_head", r)[:, 1:]
    w_target = h[:, 1:]

    # RNA branch (ref :889-893)
    x = transformer_encode(p, "rna_encoder", rna_emb, rna_depth, rna_num_heads, rna_norm_eps)
    r_align = linear(p, "rna_encoder.alignment_head", l2norm(x))
    rr = linear(p, "rna_encoder.retention_embed", x)
    rr, r_mask = rna_scalar_masking(
        rr, p["rna_encoder.mask_token"], rna_noise, rna_mask_ratio
    )
    rr = rr + p["rna_encoder.retention_gene_embed"]
    for i in range(rna_retention_depth):
        rr = rna_block(p, f"rna_encoder.retention_blocks.{i}", rr, rna_num_heads, rna_norm_eps)
    rr = layer_norm(p, "rna_encoder.retention_norm", rr, rna_norm_eps)
    r_ret = linear(p, "rna_encoder.retention_head", rr)
    r_target = x

    # style clustering on the raw wsi cls row + rna encoding (ref :895-897)
    w_score, w_mu, w_logstd = style_clustering(p, h[:, 0], wsi_eps)
    r_score, r_mu, r_logstd = style_clustering(p, x, rna_eps)

    return (
        w_align, w_ret, w_target, w_mask, w_score, w_mu, w_logstd,
        r_align, r_ret, r_target, r_mask, r_score, r_mu, r_logstd,
        p["logit_scale"].exp(),
    )


def classifier_forward(
    p: Params,
    wsi_emb: torch.Tensor,
    rna_emb: Optional[torch.Tensor],
    embed_dim: int,
    fusion: str = "concat",
    rna_depth: int = 2,
    rna_num_heads: int = 12,
    rna_norm_eps: float = 1e-6,
) -> torch.Tensor:
    """MIRRORClassifier.forward (ref :998-1015): TransMIL cls vector +
    optional RNA encoding, add/concat fusion, linear head."""
    h, _ = transmil_encode(p, "wsi_encoder", wsi_emb, embed_dim)
    wsi_vec = h[:, 0]
    if rna_emb is not None:
        rna_vec = transformer_encode(
            p, "rna_encoder", rna_emb, rna_depth, rna_num_heads, rna_norm_eps
        )
        fused = wsi_vec + rna_vec if fusion == "add" else torch.cat(
            [wsi_vec, rna_vec], dim=1
        )
        return linear(p, "head", fused)
    return linear(p, "head", wsi_vec)


# ---------------------------------------------------------------------------
# MIRRORLoss (ref losses/mirror_loss.py:16-135)
# ---------------------------------------------------------------------------

def clip_loss(
    wsi_f: torch.Tensor, rna_f: torch.Tensor, logit_scale: torch.Tensor
) -> torch.Tensor:
    """Symmetric contrastive loss with arange labels (ref :37-52)."""
    labels = torch.arange(wsi_f.shape[0])
    return (
        F.cross_entropy(logit_scale * wsi_f @ rna_f.T, labels)
        + F.cross_entropy(logit_scale * rna_f @ wsi_f.T, labels)
    ) / 2


def mirror_loss(
    outputs: Tuple[torch.Tensor, ...],
    alignment_w: float = 0.5,
    wsi_retention_w: float = 0.1,
    rna_retention_w: float = 0.1,
    style_w: float = 0.1,
    cluster_w: float = 0.2,
) -> Tuple[torch.Tensor, ...]:
    """MIRRORLoss.forward (ref :74-135) on the 15-tuple; returns
    (total, alignment, wsi_retention, rna_retention, style, cluster).
    The RNA retention term has NO feature mean (the reference quirk,
    ref :102-103)."""
    (w_align, w_ret, w_tgt, w_mask, w_score, w_mu, w_logstd,
     r_align, r_ret, r_tgt, r_mask, r_score, r_mu, r_logstd, scale) = outputs

    alignment = clip_loss(w_align, r_align, scale)

    w_retention = ((w_ret - w_tgt) ** 2).mean(dim=-1)
    w_retention = (w_retention * w_mask).sum() / w_mask.sum()

    r_retention = ((r_ret - r_tgt) ** 2 * r_mask).sum() / r_mask.sum()

    style = 0.5 * (
        (w_logstd.exp() + w_mu ** 2 - 1.0 - w_logstd).sum(dim=1).mean()
        + (r_logstd.exp() + r_mu ** 2 - 1.0 - r_logstd).sum(dim=1).mean()
    )

    w_prob = F.softmax(w_score, dim=-1)
    r_prob = F.softmax(r_score, dim=-1)
    cluster = 0.5 * (
        F.kl_div(w_prob.log(), r_prob, reduction="batchmean")
        + F.kl_div(r_prob.log(), w_prob, reduction="batchmean")
    )

    total = (
        alignment_w * alignment
        + wsi_retention_w * w_retention
        + rna_retention_w * r_retention
        + style_w * style
        + cluster_w * cluster
    )
    return total, alignment, w_retention, r_retention, style, cluster
