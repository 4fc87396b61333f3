"""Shared plumbing for the Pallas TPU kernels.

Single source for the interpret-mode check (non-TPU backends fall back to
``pl.pallas_call(interpret=True)`` so the CPU test suite exercises the same
kernel code) and the widened scoped-VMEM budget used by the batch-grouped /
channel-blocked kernels whose working sets exceed Mosaic's 16 MB default.
"""

import jax

# gb=8 batch-grouped conv blocks and the channel-blocked PPEG overflow the
# 16 MB default scoped window; the chip's physical VMEM is 128 MB, and 64 MB
# leaves headroom for Mosaic's own temporaries (measured: the fused PPEG
# backward at [64,46,46,768] needs >76 MB unblocked — see BASELINE.md).
VMEM_LIMIT_WIDE = 64 * 1024 * 1024


def use_interpret() -> bool:
    """True off-TPU: run the kernel in Pallas interpret mode."""
    return jax.default_backend() != "tpu"
