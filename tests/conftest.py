"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip shardings (DP / spatial halo / disparity partition) are validated
on a virtual 8-device CPU mesh, per SURVEY.md §4 — this is how JAX code tests
"multi-node without a real cluster". Must run before any jax computation.

Note: the environment's sitecustomize registers a remote TPU backend in every
interpreter; ``jax.config.update`` below overrides it even though the
JAX_PLATFORMS env var is force-set at interpreter start.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
