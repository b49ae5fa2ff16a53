"""GAE / returns scans vs a naive numpy oracle."""

import jax.numpy as jnp
import numpy as np

from madrona_learn_tpu.ops.gae import (
    compute_advantages,
    compute_returns,
    zscore_data,
)


def naive_gae(gamma, lam, rewards, values, dones, bootstrap):
    # rewards/values/dones: [T, N]; bootstrap: [N]
    T, N = rewards.shape
    adv = np.zeros((T, N))
    next_adv = np.zeros(N)
    next_val = bootstrap.copy()
    for t in reversed(range(T)):
        nv = np.where(dones[t], 0.0, next_val)
        na = np.where(dones[t], 0.0, next_adv)
        delta = rewards[t] + gamma * nv - values[t]
        adv[t] = delta + gamma * lam * na
        next_adv = adv[t]
        next_val = values[t]
    return adv


def naive_returns(gamma, rewards, dones, bootstrap):
    T, N = rewards.shape
    ret = np.zeros((T, N))
    next_ret = bootstrap.copy()
    for t in reversed(range(T)):
        nr = np.where(dones[t], 0.0, next_ret)
        ret[t] = rewards[t] + gamma * nr
        next_ret = ret[t]
    return ret


def make_data(seed=0, C=2, TC=8, P=2, B=3):
    rng = np.random.default_rng(seed)
    shape = (C, TC, P, B, 1)
    rewards = rng.normal(size=shape).astype(np.float32)
    values = rng.normal(size=shape).astype(np.float32)
    dones = rng.random(shape) < 0.15
    bootstrap = rng.normal(size=(P, B, 1)).astype(np.float32)
    return rewards, values, dones, bootstrap


def test_advantages_match_oracle():
    gamma, lam = 0.99, 0.95
    rewards, values, dones, bootstrap = make_data()
    C, TC, P, B, _ = rewards.shape
    T, N = C * TC, P * B

    adv = compute_advantages(
        gamma, lam, jnp.asarray(rewards), jnp.asarray(values),
        jnp.asarray(dones), jnp.asarray(bootstrap))

    expected = naive_gae(
        gamma, lam,
        rewards.reshape(T, N), values.reshape(T, N),
        dones.reshape(T, N), bootstrap.reshape(N))

    np.testing.assert_allclose(
        np.asarray(adv).reshape(T, N), expected, rtol=1e-5, atol=1e-5)


def test_returns_match_oracle():
    gamma = 0.97
    rewards, _, dones, bootstrap = make_data(seed=3)
    C, TC, P, B, _ = rewards.shape
    T, N = C * TC, P * B

    ret = compute_returns(
        gamma, jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(bootstrap))

    expected = naive_returns(
        gamma, rewards.reshape(T, N), dones.reshape(T, N), bootstrap.reshape(N))

    np.testing.assert_allclose(
        np.asarray(ret).reshape(T, N), expected, rtol=1e-5, atol=1e-5)


def test_gae_reduces_to_returns_minus_values_at_lambda1():
    gamma = 0.99
    rewards, values, dones, bootstrap = make_data(seed=9)
    adv = compute_advantages(
        gamma, 1.0, jnp.asarray(rewards), jnp.asarray(values),
        jnp.asarray(dones), jnp.asarray(bootstrap))
    ret = compute_returns(
        gamma, jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(bootstrap))
    np.testing.assert_allclose(
        np.asarray(adv + jnp.asarray(values)), np.asarray(ret),
        rtol=1e-4, atol=1e-4)


def test_zscore():
    x = jnp.asarray(np.random.default_rng(0).normal(3, 2, size=(1000,)),
                    jnp.float32)
    z = zscore_data(x)
    assert abs(float(z.mean())) < 1e-4
    assert abs(float(z.std()) - 1.0) < 1e-2
