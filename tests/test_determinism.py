"""Bitwise reproducibility: identical seeds and state must give identical
results — the property that makes fixed-seed debugging and the driver's
deterministic-trajectory parity checks possible at all."""

import jax
import jax.numpy as jnp
import numpy as np

from test_train_e2e import run_training


def _params_bytes(mgr):
    return [np.asarray(l).tobytes()
            for l in jax.tree.leaves(
                jax.device_get(mgr.state.policy_states.params))]


def test_same_seed_same_results():
    """Two independent end-to-end runs with the same seed produce bitwise
    identical params and metrics."""
    mgr_a, _ = run_training(num_updates=3, num_worlds=32, seed=77)
    mgr_b, _ = run_training(num_updates=3, num_worlds=32, seed=77)

    assert _params_bytes(mgr_a) == _params_bytes(mgr_b)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(mgr_a.metrics.metrics["Rewards"].mean)),
        np.asarray(jax.device_get(mgr_b.metrics.metrics["Rewards"].mean)))


def test_different_seed_different_results():
    mgr_a, _ = run_training(num_updates=3, num_worlds=32, seed=77)
    mgr_c, _ = run_training(num_updates=3, num_worlds=32, seed=78)
    assert _params_bytes(mgr_a) != _params_bytes(mgr_c)


def test_update_is_pure():
    """Applying the jitted update to copies of the same state yields
    bitwise identical outputs (no hidden host state in the hot path)."""
    mgr, _ = run_training(num_updates=1, num_worlds=32, seed=5)

    update = jax.jit(lambda m: m.update_iter())  # no donation: reuse input
    out1 = update(mgr)
    out2 = update(mgr)
    assert _params_bytes(out1) == _params_bytes(out2)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out1.metrics.metrics["Loss"].mean)),
        np.asarray(jax.device_get(out2.metrics.metrics["Loss"].mean)))
