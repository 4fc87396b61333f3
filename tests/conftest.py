"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (the driver's dryrun does the same for the real
multi-chip path). The axon TPU plugin ignores the JAX_PLATFORMS env var, so
the platform is forced through the config API before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_spmd_mesh():
    """The harness registers the SPMD mesh for the Pallas layer as process
    state (ops/_common.set_spmd_mesh). Tests that drive the CLIs would leak
    it into later kernel tests whose batches don't divide 8 devices."""
    yield
    from mirror_tpu.ops._common import set_spmd_mesh

    set_spmd_mesh(None)
