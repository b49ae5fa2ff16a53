"""Distribution layer tests: categorical heads, continuous heads, two-hot,
HL-Gauss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from madrona_learn_tpu.config import ContinuousActionsConfig
from madrona_learn_tpu.models.critics import (
    make_hlgauss_bins,
    make_hlgauss_two_part_bins,
)
from madrona_learn_tpu.ops.dists import (
    ContinuousActionDistributions,
    DiscreteActionDistributions,
    HLGaussDist,
    SymExpTwoHotDistribution,
)


def test_discrete_sample_and_stats_consistent():
    buckets = [3, 5]
    logits = jnp.asarray(
        np.random.default_rng(0).normal(size=(64, sum(buckets))), jnp.float32)
    dist = DiscreteActionDistributions(buckets, logits)

    actions, log_probs = dist.sample(random.key(0))
    assert actions.shape == (64, 2)
    assert log_probs.shape == (64, 2)
    assert (np.asarray(actions[:, 0]) < 3).all()
    assert (np.asarray(actions[:, 1]) < 5).all()

    stats_lp, entropies = dist.action_stats(actions)
    np.testing.assert_allclose(
        np.asarray(stats_lp), np.asarray(log_probs), rtol=1e-5, atol=1e-5)
    assert (np.asarray(entropies) >= 0).all()
    assert (np.asarray(entropies[:, 0]) <= np.log(3) + 1e-5).all()
    assert (np.asarray(entropies[:, 1]) <= np.log(5) + 1e-5).all()


def test_discrete_best_is_argmax():
    buckets = [4]
    logits = jnp.asarray([[0.1, 3.0, -1.0, 0.0]], jnp.float32)
    dist = DiscreteActionDistributions(buckets, logits)
    assert int(dist.best()[0, 0]) == 1


def test_discrete_deterministic_sampling_peaked_logits():
    buckets = [2, 3]
    logits = jnp.asarray([[100.0, -100.0, -100.0, 100.0, -100.0]], jnp.float32)
    dist = DiscreteActionDistributions(buckets, logits)
    actions, log_probs = dist.sample(random.key(1))
    assert int(actions[0, 0]) == 0
    assert int(actions[0, 1]) == 1
    np.testing.assert_allclose(np.asarray(log_probs), 0.0, atol=1e-5)


def test_continuous_sample_stats_consistent():
    cfgs = [ContinuousActionsConfig(stddev_min=0.1, stddev_max=1.0, num_dims=3)]
    means = jnp.asarray(
        np.random.default_rng(1).normal(size=(16, 1, 3)), jnp.float32)
    stds = jnp.zeros((16, 1, 3), jnp.float32)
    dist = ContinuousActionDistributions(cfgs, means, stds)

    actions, log_probs = dist.sample(random.key(0))
    assert actions.shape == (16, 1, 3)
    stats_lp, entropies = dist.action_stats(actions)
    np.testing.assert_allclose(
        np.asarray(stats_lp), np.asarray(log_probs), rtol=1e-4, atol=1e-5)
    # entropy of N(mu, sigma) with sigma in [0.1, 1.0]
    assert np.asarray(entropies).min() > 0.5 * np.log(
        2 * np.pi * 0.1**2) + 0.5 - 1e-4

    best = dist.best()
    np.testing.assert_allclose(
        np.asarray(best), np.tanh(np.asarray(means)), rtol=1e-5)


def test_two_hot_uniform_mean_is_zero():
    num_bins = 63
    logits = jnp.zeros((8, num_bins), jnp.float32)
    dist = SymExpTwoHotDistribution.create(logits)
    np.testing.assert_allclose(np.asarray(dist.mean()), 0.0, atol=1e-6)


def test_two_hot_loss_minimized_at_target_bin():
    num_bins = 63
    dist0 = SymExpTwoHotDistribution.create(jnp.zeros((1, num_bins)))
    bins = np.asarray(dist0._compute_bins())
    target_bin = 40
    target = jnp.full((1, 1), bins[target_bin], jnp.float32)

    # Peaked logits at the right bin should give near-zero CE loss.
    peaked = jnp.full((1, num_bins), -100.0).at[0, target_bin].set(100.0)
    dist = SymExpTwoHotDistribution.create(peaked)
    loss = dist.two_hot_cross_entropy_loss(target)
    assert float(loss[0, 0]) < 1e-4

    # Uniform logits should have higher loss.
    uniform_loss = dist0.two_hot_cross_entropy_loss(target)
    assert float(uniform_loss[0, 0]) > float(loss[0, 0])

    # Mean of the peaked distribution should recover the bin value.
    np.testing.assert_allclose(
        float(dist.mean()[0, 0]), bins[target_bin], rtol=1e-4)


def test_hlgauss_mean_and_loss():
    centers, bounds = make_hlgauss_bins(num_bins=127, min_bound=-100,
                                        max_bound=100)
    logits = jnp.zeros((4, 127), jnp.float32)
    dist = HLGaussDist(logits=logits, smoothness=0.75, centers=centers,
                       bounds=bounds)
    np.testing.assert_allclose(np.asarray(dist.mean()), 0.0, atol=1e-5)

    targets = jnp.asarray([[0.0], [5.0], [-50.0], [99.0]], jnp.float32)
    loss = dist.loss(targets)
    assert loss.shape == (4, 1)
    assert np.isfinite(np.asarray(loss)).all()

    # Gradient descent on the loss should move the mean toward the target.
    def loss_fn(lg):
        d = HLGaussDist(logits=lg, smoothness=0.75, centers=centers,
                        bounds=bounds)
        return d.loss(targets).sum()

    g = jax.grad(loss_fn)(logits)
    stepped = HLGaussDist(logits=logits - 10.0 * g, smoothness=0.75,
                          centers=centers, bounds=bounds)
    before = np.abs(np.asarray(dist.mean()) - np.asarray(targets))
    after = np.abs(np.asarray(stepped.mean()) - np.asarray(targets))
    assert (after <= before + 1e-6).all()


def test_hlgauss_two_part_bins_shapes():
    (sc, sb), (lc, lb) = make_hlgauss_two_part_bins()
    assert sc.shape[0] == 127 and lc.shape[0] == 127
    assert sb.shape[0] == 128 and lb.shape[0] == 128
    # Bins are strictly increasing.
    assert (np.diff(np.asarray(sc)) > 0).all()
    assert (np.diff(np.asarray(lc)) > 0).all()
