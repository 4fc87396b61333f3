"""fit_mesh_to_batch: few-shot batches smaller than the slice shrink the
data mesh to the largest divisor instead of failing (the reference's
power-of-2 clamp, ref train_subtyping.py:935-939, assumes one GPU)."""

import jax
import numpy as np
import pytest

from mirror_tpu.parallel import create_mesh, fit_mesh_to_batch, shard_batch


@pytest.mark.parametrize("batch,expected", [(8, 8), (16, 8), (4, 4), (6, 2),
                                            (2, 2), (1, 1), (3, 1)])
def test_fit_mesh_to_batch(batch, expected):
    mesh = create_mesh()
    assert mesh.devices.size == 8
    sub = fit_mesh_to_batch(mesh, batch)
    assert sub.devices.size == expected
    assert sub.shape.get("model", 1) == 1
    # the shrunk mesh still shards a batch of that size evenly
    out = shard_batch(sub, {"x": np.zeros((batch, 3), np.float32)})
    assert out["x"].shape == (batch, 3)
    jax.block_until_ready(out["x"])


def test_fit_mesh_noop_when_divisible():
    mesh = create_mesh()
    assert fit_mesh_to_batch(mesh, 64) is mesh
