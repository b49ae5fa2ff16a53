"""Checkpoint save/load round trips, eval-time policy loading, and the
offline eval_policies path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import madrona_learn_tpu as mlt
from madrona_learn_tpu.envs import ToyEnvConfig, make_toy_env

from test_train_e2e import make_policy, run_training


def test_ckpt_roundtrip(tmp_path):
    mgr, _ = run_training(num_updates=2, num_worlds=16, seed=21)

    ckpt_dir = str(tmp_path / "ckpts")
    mgr.save_ckpt(ckpt_dir)
    ckpt_path = os.path.join(ckpt_dir, "2")
    assert os.path.exists(ckpt_path)

    # Fresh manager restored from the checkpoint must produce identical
    # parameters and continue from the saved update index.
    mgr2, _ = run_training(num_updates=1, num_worlds=16, seed=21)
    restored = mgr2.load_ckpt(ckpt_path)

    orig_params = jax.device_get(mgr.state.policy_states.params)
    rest_params = jax.device_get(restored.state.policy_states.params)
    jax.tree.map(np.testing.assert_array_equal, orig_params, rest_params)

    orig_opt = jax.device_get(mgr.state.train_states.opt_state)
    rest_opt = jax.device_get(restored.state.train_states.opt_state)
    jax.tree.map(np.testing.assert_array_equal, orig_opt, rest_opt)

    assert int(restored.update_idx) == 2

    # Training continues from a restored checkpoint.
    update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)
    restored = update(restored)
    assert int(restored.update_idx) == 3


def test_eval_load_and_eval_policies(tmp_path):
    mgr, _ = run_training(num_updates=1, num_worlds=16, seed=22)
    ckpt_dir = str(tmp_path / "ckpts")
    mgr.save_ckpt(ckpt_dir)
    ckpt_path = os.path.join(ckpt_dir, "1")

    actions = {"move": mlt.DiscreteActionsConfig(actions_num_buckets=[5])}
    policy = make_policy(actions)

    policy_states, num_policies = mlt.eval_load_ckpt(policy, ckpt_path)
    assert num_policies == 1

    env_cfg = ToyEnvConfig(num_worlds=16, episode_len=10, grid_size=5,
                           seed=3)
    sim_fns = make_toy_env(env_cfg)

    eval_cfg = mlt.EvalConfig(
        num_worlds=16,
        num_teams=1,
        team_size=1,
        num_eval_steps=12,
        actions=actions,
        reward_gamma=0.95,
        policy_dtype=jnp.float32,
        eval_competitive=False,
        use_deterministic_policy=True,
    )

    seen_steps = []

    def step_cb(step_data):
        # Called inside jit: record traced structure, return sim state.
        seen_steps.append(jax.tree.map(jnp.shape, step_data["dones"]))
        return step_data["sim_state"]

    result = mlt.eval_policies(
        None, eval_cfg, sim_fns, policy,
        init_sim_ctrl=jnp.zeros((1,), jnp.int32),
        policy_states=policy_states,
        step_cb=step_cb,
    )
    assert seen_steps  # callback traced
    # Non-competitive eval returns episode-score estimates.
    assert result is not None


def test_async_ckpt_roundtrip(tmp_path):
    """Non-blocking save: training continues while orbax serializes; after
    wait_for_checkpoints the restore is bit-identical to the live state."""
    mgr, _ = run_training(num_updates=1, num_worlds=16, seed=27)

    want = jax.device_get(mgr.state.policy_states.params)

    ckpt_dir = str(tmp_path / "async_ckpts")
    mgr.save_ckpt(ckpt_dir, block=False)

    # Keep training (with donation!) while the save commits in the
    # background — the save must have snapshotted the buffers.
    update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)
    mgr2 = update(mgr)

    mlt.wait_for_checkpoints()
    restored = mgr2.load_ckpt(os.path.join(ckpt_dir, "1"))
    assert int(restored.update_idx) == 1

    got = jax.device_get(restored.state.policy_states.params)
    for x, y in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
