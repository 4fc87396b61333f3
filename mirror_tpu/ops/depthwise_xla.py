"""GSPMD-safe depthwise convolution for the dense (non-Pallas) paths.

XLA's SPMD partitioner mis-partitions the WEIGHT gradient of grouped
convolutions: under a mesh with an axis the conv does not use (e.g. a
``model`` axis of size k alongside the batch-sharded ``data`` axis), the
kernel gradient comes back exactly k times too large, while the forward
and the data gradient are correct. Minimal repro (jax 0.9.0, CPU and the
TPU lowering path): grad of ``sum(conv(x, kern, feature_group_count=C)**2)``
w.r.t. a replicated ``kern`` over a (data=8/mp, model=mp) mesh scales with
mp — see tests/test_tensor_parallel.py::test_grouped_conv_weight_grad_bug.

This wraps the grouped conv in a custom VJP: forward and the data gradient
keep the fast grouped-conv form (both partition correctly); the WEIGHT
gradient is computed tap-by-tap as plain multiply-reduce contractions —
no grouped conv anywhere in that computation, so GSPMD has nothing to
mis-partition. The tap loop is static (49 taps for the merged PPEG, 33 for
the Nystrom residual conv) and lives on the dense fallback path only — the
TPU-default Pallas kernels carry their own fused backwards
(ops/{ppeg,conv1d,nystrom}_pallas) and shard_map themselves over the mesh.
"""

import functools

import jax
import jax.numpy as jnp


def _conv(img, kern, pads):
    c = img.shape[-1]
    return jax.lax.conv_general_dilated(
        img, kern, window_strides=(1, 1), padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv_nhwc(img, kern, pads):
    """Depthwise conv, NHWC x HWIO[kh, kw, 1, C] -> NHWC.

    ``pads``: ((ph_lo, ph_hi), (pw_lo, pw_hi)) — static zero padding."""
    return _conv(img, kern, pads)


def _vjp_fwd(img, kern, pads):
    return _conv(img, kern, pads), (img, kern)


def _vjp_bwd(pads, res, g):
    img, kern = res
    kh, kw = kern.shape[0], kern.shape[1]
    (ph_lo, ph_hi), (pw_lo, pw_hi) = pads
    # data gradient: correlation with the spatially-flipped taps — a grouped
    # conv again (its partitioning is correct; only the weight-grad form of
    # the op is buggy). Output padding such that shapes invert exactly.
    flipped = kern[::-1, ::-1]
    dimg = _conv(
        g, flipped,
        ((kh - 1 - ph_lo, kh - 1 - ph_hi), (kw - 1 - pw_lo, kw - 1 - pw_hi)),
    )
    # weight gradient: dk[ky, kx, 0, c] = sum_{b,y,x} img_pad[b, y+ky, x+kx, c]
    # * g[b, y, x, c] — static tap loop of elementwise mul-reduces.
    h_out, w_out = g.shape[1], g.shape[2]
    img_pad = jnp.pad(
        img, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0))
    )
    g32 = g.astype(jnp.float32)
    taps = [
        jnp.sum(
            img_pad[:, ky:ky + h_out, kx:kx + w_out, :].astype(jnp.float32)
            * g32,
            axis=(0, 1, 2),
        )
        for ky in range(kh)
        for kx in range(kw)
    ]
    dkern = jnp.stack(taps).reshape(kh, kw, 1, img.shape[-1])
    return dimg, dkern.astype(kern.dtype)


depthwise_conv_nhwc.defvjp(_vjp_fwd, _vjp_bwd)
