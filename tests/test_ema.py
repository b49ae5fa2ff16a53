"""EMANormalizer streaming stats vs a float64 naive oracle.

Port of the reference's EMA verification strategy (reference:
tests/test_ema.py:31-92), upgraded from printed comparisons to asserted
tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_learn_tpu.ops.ema import EMAEstimate, EMANormalizer


DECAY = 0.99
NUM_ITERS = 200
NUM_SUBCHUNKS = 8
CHUNK = 64
DIM = 3


def naive_oracle(all_data, decay):
    """Float64 EMA of mean and E[(x - mu)^2] with explicit bias correction."""
    mu_b = np.zeros(DIM)
    var_b = np.zeros(DIM)
    n = 0
    for batch in all_data:  # batch: [NUM_SUBCHUNKS * CHUNK, DIM]
        b = batch.astype(np.float64)
        n += 1
        bm = b.mean(axis=0)
        bv = b.var(axis=0)
        delta = bm - (mu_b / (1 - decay**(n - 1)) if n > 1 else np.zeros(DIM))
        mu_unb_prev = mu_b / (1 - decay ** (n - 1)) if n > 1 else np.zeros(DIM)
        mu_b = decay * mu_b + (1 - decay) * bm
        mu_unb = mu_b / (1 - decay**n)
        # Law of total variance across the EMA weighting: track E[x^2] instead.
        var_b = decay * var_b + (1 - decay) * (bv + bm**2)
        var_unb = var_b / (1 - decay**n) - mu_unb**2
        del delta, mu_unb_prev
    return mu_unb, np.maximum(var_unb, 0)


def test_ema_normalizer_matches_float64_oracle():
    norm = EMANormalizer(decay=DECAY, norm_dtype=jnp.float32,
                         inv_dtype=jnp.float32)
    rng = np.random.default_rng(7)

    est = jax.jit(norm.init_estimates)(jnp.zeros((1, DIM)))

    @jax.jit
    def update(est, chunks):
        stats = norm.init_input_stats(est)
        for i in range(NUM_SUBCHUNKS):
            stats = norm.update_input_stats(stats, i, chunks[i])
        return norm.update_estimates(est, stats)

    all_batches = []
    for it in range(NUM_ITERS):
        # Drift the distribution over time so the EMA actually matters.
        loc = 5.0 * np.sin(it / 20.0) + np.arange(DIM)
        scale = 1.0 + 0.5 * np.cos(it / 15.0)
        chunks = rng.normal(loc, scale, size=(NUM_SUBCHUNKS, CHUNK, DIM))
        all_batches.append(chunks.reshape(-1, DIM))
        est = update(est, jnp.asarray(chunks, dtype=jnp.float32))

    mu_ref, var_ref = naive_oracle(all_batches, DECAY)

    np.testing.assert_allclose(np.asarray(est["mu"]), mu_ref, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(est["sigma"]), np.sqrt(var_ref), rtol=2e-3, atol=2e-3)

    # normalize/invert round trip
    x = jnp.asarray(rng.normal(size=(32, DIM)), jnp.float32)
    x_norm = norm.normalize(est, x)
    x_back = norm.invert(est, x_norm)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-4,
                               atol=1e-4)


def test_ema_estimate_bias_correction():
    est_cfg = EMAEstimate(decay=0.9)
    est = est_cfg.init_estimates(jnp.zeros((1,)))
    # Constant input should give exactly that constant back (bias corrected).
    for _ in range(5):
        est = est_cfg.update_estimates(est, jnp.full((16,), 3.5))
    np.testing.assert_allclose(np.asarray(est["mu"]), 3.5, rtol=1e-6)


def test_disabled_normalizer_is_identity():
    norm = EMANormalizer(decay=DECAY, norm_dtype=jnp.float32,
                         inv_dtype=jnp.float32, disable=True)
    x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    assert norm.init_estimates(x) == {}
    np.testing.assert_array_equal(np.asarray(norm.normalize({}, x)),
                                  np.asarray(x))
