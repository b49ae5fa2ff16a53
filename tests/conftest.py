"""Test harness config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference test strategy's "fake backend" idea (reference:
tests/test_rollouts.py uses pure-JAX fake sims); multi-chip sharding logic is
exercised on forced host CPU devices so no TPU pod is required.

Note: the ambient environment's sitecustomize registers a TPU backend and
pins ``jax_platforms`` via ``jax.config.update`` (which overrides the
JAX_PLATFORMS env var), so we must update the config, not the env.
"""

import os

# Must be set before any backend is initialized.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
