"""Numerical parity against the actually-running reference implementation.

These tests import the reference package from /root/reference/src and run its
advantage/return/zscore math side by side with ours on identical fixed-seed
trajectories (reference: algo_common.py:45-140). This replaces the
parity-by-construction claims in PARITY.md with executed comparisons.

The reference targets an older JAX; the only API it uses that no longer
exists is ``jax.tree_map``, shimmed below to ``jax.tree.map`` (pure alias,
no behavior change). Skipped wholesale if the reference tree is absent.
"""

import os
import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_SRC = "/root/reference/src"

if not os.path.isdir(REF_SRC):  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

if not hasattr(jax, "tree_map"):
    jax.tree_map = jax.tree.map

sys.path.insert(0, REF_SRC)

from madrona_learn.algo_common import (  # noqa: E402
    compute_advantages as ref_compute_advantages,
    compute_returns as ref_compute_returns,
    zscore_data as ref_zscore_data,
)

from madrona_learn_tpu.ops.gae import (  # noqa: E402
    compute_advantages,
    compute_returns,
    zscore_data,
)

GAMMA = 0.99
LAMBDA = 0.95


def _fake_trajectories(seed, C=3, TC=5, P=2, B=8):
    rng = np.random.default_rng(seed)
    shape = (C, TC, P, B, 1)
    rewards = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    values = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    dones = jnp.asarray(rng.random(shape) < 0.1)
    bootstrap = jnp.asarray(
        rng.standard_normal((P, B, 1)), jnp.float32)
    return rewards, values, dones, bootstrap


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gae_bitwise_matches_reference(seed):
    rewards, values, dones, bootstrap = _fake_trajectories(seed)
    cfg = SimpleNamespace(gamma=GAMMA, gae_lambda=LAMBDA)

    ref = jax.jit(lambda r, v, d, b: ref_compute_advantages(cfg, r, v, d, b))(
        rewards, values, dones, bootstrap)
    ours = jax.jit(
        lambda r, v, d, b: compute_advantages(GAMMA, LAMBDA, r, v, d, b))(
            rewards, values, dones, bootstrap)

    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


@pytest.mark.parametrize("seed", [0, 1])
def test_returns_bitwise_matches_reference(seed):
    rewards, _, dones, bootstrap = _fake_trajectories(seed, C=2, TC=7)
    cfg = SimpleNamespace(gamma=GAMMA)

    ref = jax.jit(lambda r, d, b: ref_compute_returns(cfg, r, d, b))(
        rewards, dones, bootstrap)
    ours = jax.jit(lambda r, d, b: compute_returns(GAMMA, r, d, b))(
        rewards, dones, bootstrap)

    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


def test_zscore_matches_reference():
    rng = np.random.default_rng(7)
    data = jnp.asarray(rng.standard_normal((64, 5)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(ref_zscore_data(data)), np.asarray(zscore_data(data)))


def test_gae_pallas_kernel_matches_reference():
    """The Pallas GAE kernel (interpret mode on CPU) against the reference's
    fori_loop — the strongest cross-implementation check we have."""
    from madrona_learn_tpu.ops.pallas.gae import compute_advantages_pallas

    rewards, values, dones, bootstrap = _fake_trajectories(5, C=2, TC=8,
                                                           P=1, B=16)
    cfg = SimpleNamespace(gamma=GAMMA, gae_lambda=LAMBDA)
    ref = ref_compute_advantages(cfg, rewards, values, dones, bootstrap)
    ours = compute_advantages_pallas(
        GAMMA, LAMBDA, rewards, values, dones, bootstrap, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(ours), rtol=1e-6, atol=1e-6)
