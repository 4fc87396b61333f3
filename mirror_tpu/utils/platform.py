"""Backend selection shared by every CLI entry point.

The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so launchers pin
subprocess jobs to a backend via ``MIRROR_PLATFORM=cpu|tpu`` instead
(tools/launcher.py ``default_slot_env``) and each entry point must route it
through the config API before the backend initializes. Centralized here so
the slot-isolation contract holds for ALL tools, not just the trainers.
"""

import os


def apply_forced_platform() -> None:
    forced = os.environ.get("MIRROR_PLATFORM")
    if forced:
        import jax

        jax.config.update("jax_platforms", forced)
