"""Exact epoch train metrics + grad/param-norm observability.

The reference averages its loss meters over EVERY batch
(/root/reference/train_mirror.py:1296-1333); the harness previously sampled
only log-interval batches (~2%).  train_one_epoch now accumulates the step
metric dict device-side and reads it back once per epoch, so summary.csv
train columns equal the every-batch mean exactly.  wandb.watch's gradient
visibility (ref train_mirror.py:941-949) maps to in-step global grad/param
norms.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np

from mirror_tpu.parallel import create_mesh
from mirror_tpu.train.harness import TrainHarness


class _SeqLoader:
    """Yields batches whose means are 0, 1, ..., n-1."""

    def __init__(self, n, batch=8):
        self.n, self.batch = n, batch

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            yield {"x": np.full((self.batch, 4), float(i), np.float32)}


def _args(**kw):
    base = dict(log_interval=5, recovery_interval=0, synchronize_step=False,
                epochs=1, output=None, experiment=None, log_wandb=False,
                profile=False, start_epoch=None)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_epoch_mean_is_exact_not_interval_sampled():
    mesh = create_mesh()

    def train_step(state, batch, rng):
        return state + 1, {"loss": jnp.mean(batch["x"]),
                           "constant": jnp.float32(2.0)}

    n = 13  # not a multiple of log_interval: interval sampling would see
    # batches {0, 5, 10, 12} -> mean 6.75; the exact mean is 6.0
    harness = TrainHarness(
        _args(), mesh, jnp.int32(0), train_step, _SeqLoader(n),
        eval_fn=None, saver=None, out_dir=None, rng=jax.random.key(0),
    )
    metrics = harness.train_one_epoch(0)
    assert metrics["loss"] == np.mean(np.arange(n))  # == 6.0 exactly
    assert metrics["constant"] == 2.0
    assert int(harness.state) == n


def test_train_steps_report_grad_and_param_norms():
    import optax

    from mirror_tpu.registry import create_model
    from mirror_tpu.train.state import create_train_state
    from mirror_tpu.train.steps import make_classifier_train_step

    model = create_model(
        "mirror_classifier", wsi_embed_dim=16, rna_embed_dim=32, embed_dim=24,
        num_classes=2, fusion="concat", rna_mlp_ratio=2.0,
    )
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    params = model.init(rngs, jnp.zeros((2, 9, 16)), jnp.zeros((2, 32)), True)[
        "params"
    ]
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    step = jax.jit(make_classifier_train_step(model, tx))
    batch = {
        "wsi": jnp.ones((2, 9, 16)), "rna": jnp.ones((2, 32)),
        "label": jnp.array([0, 1]),
    }
    _, metrics = step(state, batch, jax.random.key(2))
    gn, pn = float(metrics["grad_norm"]), float(metrics["param_norm"])
    assert np.isfinite(gn) and gn > 0
    assert np.isfinite(pn) and pn > 0
    # param_norm must equal the global L2 norm of the live params
    np.testing.assert_allclose(
        pn, float(optax.global_norm(state.params)), rtol=1e-6
    )
