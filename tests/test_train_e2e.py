"""End-to-end training: MLP PPO on the toy env must run and learn.

Covers BASELINE.json config #1 (single policy, no PBT, advantages on).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import madrona_learn_tpu as mlt
from madrona_learn_tpu.envs import ToyEnvConfig, make_toy_env
from madrona_learn_tpu.models import (
    ActorCritic,
    BackboneEncoder,
    BackboneShared,
    BackboneSeparate,
    DenseLayerCritic,
    DenseLayerDiscreteActor,
    DictActor,
    DreamerV3Critic,
    LSTM,
    MLP,
    RecurrentBackboneEncoder,
)


def make_policy(actions_cfg, dtype=jnp.float32, dreamer_critic=False,
                recurrent=False, separate=False):
    prefix = lambda obs, train: jnp.concatenate(
        [obs["delta"], obs["time"]], axis=-1)

    def make_encoder():
        net = MLP(num_channels=64, num_layers=2, dtype=dtype)
        if recurrent:
            return RecurrentBackboneEncoder(
                net=net,
                rnn=LSTM(num_hidden_channels=32, num_layers=1, dtype=dtype))
        return BackboneEncoder(net=net)

    if separate:
        backbone = BackboneSeparate(
            prefix=prefix,
            actor_encoder=make_encoder(),
            critic_encoder=make_encoder(),
        )
    else:
        backbone = BackboneShared(prefix=prefix, encoder=make_encoder())
    critic = (DreamerV3Critic(dtype=dtype) if dreamer_critic
              else DenseLayerCritic(dtype=dtype))
    actor_critic = ActorCritic(
        backbone=backbone,
        actor=DictActor(heads={
            "move": DenseLayerDiscreteActor(
                cfg=actions_cfg["move"], dtype=dtype),
        }),
        critic=critic,
    )
    return mlt.Policy(
        actor_critic=actor_critic,
        obs_preprocess=mlt.ObservationsEMANormalizer.create(
            decay=0.99, dtype=dtype),
    )


def run_training(num_updates=20, dreamer_critic=False, normalize_values=False,
                 num_worlds=64, seed=5, recurrent=False, separate=False):
    actions = {"move": mlt.DiscreteActionsConfig(actions_num_buckets=[5])}
    env_cfg = ToyEnvConfig(num_worlds=num_worlds, episode_len=20, grid_size=5,
                           seed=seed)
    sim_fns = make_toy_env(env_cfg)

    cfg = mlt.TrainConfig(
        num_worlds=num_worlds,
        num_agents_per_world=1,
        num_updates=num_updates,
        actions=actions,
        steps_per_update=40,
        num_bptt_chunks=2,
        lr=1e-3,
        gamma=0.95,
        gae_lambda=0.95,
        seed=seed,
        metrics_buffer_size=1,
        algo=mlt.PPOConfig(
            num_epochs=2,
            # num sequences = num_bptt_chunks * num_worlds
            minibatch_size=min(64, 2 * num_worlds),
            clip_coef=0.2,
            value_loss_coef=0.5,
            entropy_coef=0.01,
            max_grad_norm=0.5,
        ),
        dreamer_v3_critic=dreamer_critic,
        normalize_values=normalize_values,
        compute_advantages=True,
        normalize_advantages=True,
    )

    policy = make_policy(actions, dreamer_critic=dreamer_critic,
                         recurrent=recurrent, separate=separate)
    mgr = mlt.init_training(
        None, cfg, sim_fns, policy, init_sim_ctrl=jnp.zeros((1,), jnp.int32))

    update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)

    mean_rewards = []
    for i in range(num_updates):
        mgr = update(mgr)
        m = jax.device_get(mgr.metrics.metrics["Rewards"])
        mean_rewards.append(float(np.asarray(m.mean).reshape(-1)[0]))
    return mgr, mean_rewards


@pytest.mark.slow
def test_mlp_ppo_learns_toy_env():
    mgr, mean_rewards = run_training(num_updates=30)
    early = np.mean(mean_rewards[:3])
    late = np.mean(mean_rewards[-3:])
    # The task gives positive reward for moving toward the target; a learning
    # policy must beat the random-walk baseline decisively.
    assert late > early + 0.1, f"no learning: early={early}, late={late}"
    assert np.isfinite(mean_rewards).all()


@pytest.mark.slow
def test_dreamer_critic_path_runs():
    mgr, mean_rewards = run_training(num_updates=3, dreamer_critic=True)
    assert np.isfinite(mean_rewards).all()


@pytest.mark.slow
def test_value_normalized_path_runs():
    mgr, mean_rewards = run_training(
        num_updates=3, dreamer_critic=False, normalize_values=True)
    assert np.isfinite(mean_rewards).all()


@pytest.mark.slow
def test_lstm_ppo_runs_and_learns():
    """Recurrent actor-critic PPO (BASELINE.json config #2 shape)."""
    mgr, mean_rewards = run_training(
        num_updates=20, recurrent=True, num_worlds=32)
    assert np.isfinite(mean_rewards).all()
    early = np.mean(mean_rewards[:3])
    late = np.mean(mean_rewards[-3:])
    assert late > early, f"no improvement: early={early}, late={late}"


@pytest.mark.slow
def test_separate_backbone_lstm_runs():
    mgr, mean_rewards = run_training(
        num_updates=2, recurrent=True, separate=True, num_worlds=16)
    assert np.isfinite(mean_rewards).all()


def test_update_is_deterministic_under_fixed_seed():
    _, rewards_a = run_training(num_updates=2, num_worlds=16, seed=11)
    _, rewards_b = run_training(num_updates=2, num_worlds=16, seed=11)
    np.testing.assert_array_equal(rewards_a, rewards_b)
