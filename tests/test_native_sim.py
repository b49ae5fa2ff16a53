"""Native C++ batch simulator: contract compliance + end-to-end training.

Validates the external-simulator path (host-callback boundary) that stands in
for a Madrona-style engine (reference: rollouts.py:905-947).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import madrona_learn_tpu as mlt
from madrona_learn_tpu.envs.native_sim import NativeSimConfig, make_native_sim

from test_train_e2e import make_policy


def test_native_sim_contract():
    cfg = NativeSimConfig(num_worlds=64, episode_len=10, grid_size=5, seed=1)
    sim_fns = make_native_sim(cfg)

    out = sim_fns["init"]()
    assert out["obs"]["delta"].shape == (64, 2)
    assert out["obs"]["time"].shape == (64, 1)

    actions = {"move": jnp.zeros((64, 1), jnp.int32)}
    step_in = {
        "state": out["state"],
        "actions": actions,
        "resets": jnp.zeros((64, 1), jnp.int32),
        "sim_ctrl": jnp.zeros((1,), jnp.int32),
        "pbt": {},
    }
    step_out = jax.jit(sim_fns["step"])(step_in)
    assert step_out["rewards"].shape == (64, 1)
    assert step_out["dones"].dtype == jnp.bool_
    # Action 0 = stay: zero reward unless already on target.
    delta0 = np.asarray(out["obs"]["delta"])
    on_target = (np.abs(delta0).sum(-1) == 0)
    r = np.asarray(step_out["rewards"]).reshape(-1)
    np.testing.assert_allclose(r[~on_target], 0.0)
    np.testing.assert_allclose(r[on_target], 1.0)


def test_native_sim_deterministic():
    cfg = NativeSimConfig(num_worlds=32, episode_len=5, grid_size=5, seed=7)
    a = make_native_sim(cfg)
    b = make_native_sim(cfg)
    out_a, out_b = a["init"](), b["init"]()
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)),
        out_a, out_b)


@pytest.mark.slow
def test_train_on_native_sim():
    """Full PPO training with the C++ simulator in the loop."""
    num_worlds = 32
    actions = {"move": mlt.DiscreteActionsConfig(actions_num_buckets=[5])}
    sim_fns = make_native_sim(NativeSimConfig(
        num_worlds=num_worlds, episode_len=20, grid_size=5, seed=5))

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
        seed=5,
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
        compute_advantages=True,
    )

    policy = make_policy(actions)
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


def test_ffi_custom_call_matches_callback_path():
    """The XLA-FFI custom-call step must agree exactly with the ctypes
    host-callback step (same C++ core)."""
    from madrona_learn_tpu.envs.native_sim_ffi import make_native_sim_ffi

    cfg = NativeSimConfig(num_worlds=64, episode_len=6, grid_size=5, seed=9)
    cb = make_native_sim(cfg)
    ffi = make_native_sim_ffi(cfg)

    out_cb, out_ffi = cb["init"](), ffi["init"]()
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), out_cb, out_ffi)

    state_cb, state_ffi = out_cb["state"], out_ffi["state"]
    key = jax.random.PRNGKey(0)
    step_ffi = jax.jit(ffi["step"])
    for i in range(10):
        key, k = jax.random.split(key)
        actions = {"move": jax.random.randint(k, (64, 1), 0, 5)}
        inp = {
            "resets": jnp.zeros((64, 1), jnp.int32),
            "sim_ctrl": jnp.zeros((1,), jnp.int32),
            "actions": actions,
            "pbt": {},
        }
        o_cb = cb["step"]({**inp, "state": state_cb})
        o_ffi = step_ffi({**inp, "state": state_ffi})
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            {k: v for k, v in o_cb.items() if k != "state"},
            {k: v for k, v in o_ffi.items() if k != "state"})
        state_cb, state_ffi = o_cb["state"], o_ffi["state"]
