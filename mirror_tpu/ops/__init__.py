"""Pallas TPU kernels.

Production kernels (wired into the models):
- ``nystrom_pallas`` — fused softmax-matmul attention incl. the conv-fused
  residual value path
- ``pinv_pallas`` — Moore-Penrose iterations with in-kernel VJP replay
  (exact) and the implicit-function gradient (default)
- ``landmark_pallas`` — fused landmark-mean + softmax
- ``ppeg_pallas`` — fused channel-blocked PPEG depthwise convs
- ``vit_attn_pallas`` — ViT half-block kernels (feature extraction)
- ``conv1d_pallas`` — standalone banded depthwise conv (superseded inside
  the model by the conv-fused attention kernel; still the public
  ``depthwise_conv1d_seq`` API)

EXPERIMENTAL (library-only, wired to nothing): ``ln_qkv_pallas`` — the
LN+qkv half-block fusion for the training TransLayer. Measured NEUTRAL-to-
losing on the train step (BASELINE.md round-4 memo: the step tail is
fusion-bound, XLA already ties) and kept as a recorded negative result with
its benchmark harness (scripts/exp_ln_qkv.py), not as a production path.
"""
