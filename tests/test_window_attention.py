"""WindowAttentionMemory: protocol compliance + training end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from madrona_learn_tpu.models import WindowAttentionMemory


def test_sequence_matches_stepwise():
    dtype = jnp.float32
    N, T, H, F, W = 4, 10, 16, 16, 4
    mem = WindowAttentionMemory(
        num_hidden_channels=H, window=W, num_heads=2, dtype=dtype)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(T, N, F)), dtype)
    dones = jnp.asarray(rng.random((T, N, 1)) < 0.25)

    init_state = mem.init_recurrent_state(N)
    params = mem.init(random.PRNGKey(0), init_state, xs[0], False)

    state = init_state
    outs = []
    for t in range(T):
        out, state = mem.apply(params, state, xs[t], False)
        state = mem.clear_recurrent_state(state, dones[t])
        outs.append(out)
    stepwise = jnp.stack(outs)

    seq_out = mem.apply(
        params, init_state, dones, xs, False, method="sequence")

    np.testing.assert_allclose(
        np.asarray(stepwise), np.asarray(seq_out), rtol=1e-5, atol=1e-5)


def test_memory_horizon_is_window_limited():
    """Outputs must depend on the last `window` inputs only."""
    dtype = jnp.float32
    N, H, F, W = 2, 8, 8, 3
    mem = WindowAttentionMemory(
        num_hidden_channels=H, window=W, num_heads=1, dtype=dtype)

    rng = np.random.default_rng(1)
    init_state = mem.init_recurrent_state(N)
    x0 = jnp.asarray(rng.normal(size=(N, F)), dtype)
    params = mem.init(random.PRNGKey(0), init_state, x0, False)

    def run(prefix, tail):
        state = mem.init_recurrent_state(N)
        for x in list(prefix) + list(tail):
            out, state = mem.apply(params, state, x, False)
        return out

    tail = [jnp.asarray(rng.normal(size=(N, F)), dtype) for _ in range(W)]
    pre_a = [jnp.asarray(rng.normal(size=(N, F)), dtype) for _ in range(3)]
    pre_b = [jnp.asarray(rng.normal(size=(N, F)), dtype) for _ in range(3)]

    out_a = run(pre_a, tail)
    out_b = run(pre_b, tail)
    # Same last-W inputs -> identical output regardless of older history.
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_window_attention_backbone_trains():
    import madrona_learn_tpu as mlt
    from madrona_learn_tpu.envs import ToyEnvConfig, make_toy_env
    from madrona_learn_tpu.models import (
        ActorCritic, BackboneShared, DenseLayerCritic,
        DenseLayerDiscreteActor, DictActor, MLP, RecurrentBackboneEncoder,
    )

    num_worlds = 32
    dtype = jnp.float32
    actions = {"move": mlt.DiscreteActionsConfig(actions_num_buckets=[5])}
    sim_fns = make_toy_env(ToyEnvConfig(
        num_worlds=num_worlds, episode_len=20, grid_size=5, seed=12))

    ac = ActorCritic(
        backbone=BackboneShared(
            prefix=lambda obs, train: jnp.concatenate(
                [obs["delta"], obs["time"]], axis=-1),
            encoder=RecurrentBackboneEncoder(
                net=MLP(num_channels=32, num_layers=1, dtype=dtype),
                rnn=WindowAttentionMemory(
                    num_hidden_channels=32, window=8, num_heads=2,
                    dtype=dtype),
            ),
        ),
        actor=DictActor(heads={
            "move": DenseLayerDiscreteActor(cfg=actions["move"], dtype=dtype),
        }),
        critic=DenseLayerCritic(dtype=dtype),
    )
    policy = mlt.Policy(actor_critic=ac)

    cfg = mlt.TrainConfig(
        num_worlds=num_worlds,
        num_agents_per_world=1,
        num_updates=10,
        actions=actions,
        steps_per_update=40,
        num_bptt_chunks=2,
        lr=1e-3,
        gamma=0.95,
        gae_lambda=0.95,
        seed=12,
        metrics_buffer_size=1,
        algo=mlt.PPOConfig(
            num_epochs=2,
            minibatch_size=2 * num_worlds,
            clip_coef=0.2,
            value_loss_coef=0.5,
            entropy_coef=0.01,
            max_grad_norm=0.5,
        ),
        dreamer_v3_critic=False,
    )

    mgr = mlt.init_training(
        None, cfg, sim_fns, policy, init_sim_ctrl=jnp.zeros((1,), jnp.int32))
    update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)
    rewards = []
    for _ in range(10):
        mgr = update(mgr)
        m = jax.device_get(mgr.metrics.metrics["Rewards"])
        rewards.append(float(np.asarray(m.mean).reshape(-1)[0]))
    assert np.isfinite(rewards).all()
    assert np.mean(rewards[-3:]) > np.mean(rewards[:2])
