"""Crash-resume helper, user-state checkpointing, profiler server."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import madrona_learn_tpu as mlt
from madrona_learn_tpu.envs import ToyEnvConfig, make_toy_env

from test_hooks_and_entity_net import CountingHooks
from test_train_e2e import make_policy, run_training


def test_latest_checkpoint(tmp_path):
    ckpt_dir = str(tmp_path / "ck")
    assert mlt.latest_checkpoint(ckpt_dir) is None

    mgr, _ = run_training(num_updates=2, num_worlds=16, seed=61)
    mgr.save_ckpt(ckpt_dir)
    assert mlt.latest_checkpoint(ckpt_dir).endswith("/2")

    update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)
    mgr = update(mgr)
    mgr.save_ckpt(ckpt_dir)
    assert mlt.latest_checkpoint(ckpt_dir).endswith("/3")

    # restore_ckpt wiring resumes from the newest checkpoint.
    mgr2, _ = run_training(num_updates=1, num_worlds=16, seed=61)
    restored = mgr2.load_ckpt(mlt.latest_checkpoint(ckpt_dir))
    assert int(restored.update_idx) == 3


@pytest.mark.slow
def test_user_state_checkpoint_roundtrip(tmp_path):
    """User hook state rides along in checkpoints (reference:
    train_state.py:159)."""
    num_worlds = 16
    actions = {"move": mlt.DiscreteActionsConfig(actions_num_buckets=[5])}
    sim_fns = make_toy_env(ToyEnvConfig(
        num_worlds=num_worlds, episode_len=10, grid_size=5, seed=62))

    cfg = mlt.TrainConfig(
        num_worlds=num_worlds,
        num_agents_per_world=1,
        num_updates=2,
        actions=actions,
        steps_per_update=8,
        num_bptt_chunks=2,
        lr=1e-3,
        gamma=0.95,
        gae_lambda=0.95,
        seed=62,
        metrics_buffer_size=1,
        algo=mlt.PPOConfig(
            num_epochs=1, minibatch_size=2 * num_worlds, clip_coef=0.2,
            value_loss_coef=0.5, entropy_coef=0.01, max_grad_norm=0.5),
        dreamer_v3_critic=False,
    )

    hooks = CountingHooks()
    mgr = mlt.init_training(
        None, cfg, sim_fns, make_policy(actions),
        init_sim_ctrl=jnp.zeros((1,), jnp.int32), user_hooks=hooks)

    update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)
    mgr = update(mgr)
    mgr = update(mgr)
    assert int(mgr.state.user_state["rollout_count"]) == 2

    ckpt_dir = str(tmp_path / "ck")
    mgr.save_ckpt(ckpt_dir)

    fresh = mlt.init_training(
        None, cfg, sim_fns, make_policy(actions),
        init_sim_ctrl=jnp.zeros((1,), jnp.int32), user_hooks=hooks)
    restored = fresh.load_ckpt(mlt.latest_checkpoint(ckpt_dir))
    assert int(restored.state.user_state["rollout_count"]) == 2


def test_profiler_server_start_stop(tmp_path):
    mgr, _ = run_training(num_updates=1, num_worlds=16, seed=63)
    # profile_port flows through init; exercise the raw profiler server.
    jax.profiler.start_server(9952)
    mgr2 = mgr.replace(profile_port=9952)
    mlt.stop_training(mgr2)  # blocks on state then stops the server
