"""Semantic Elo test: in the bidding duel, policies that bid higher must end
the all-pairs tournament with higher Elo, and cull must copy winners over
losers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import madrona_learn_tpu as mlt
from madrona_learn_tpu.pbt import pbt_cull_update

from test_pbt_e2e import NUM_PAST, NUM_TRAIN, build_training_mgr


def bias_policies_by_strength(mgr):
    """Make policy i deterministically prefer bid action i+1 (0..4 scale):
    higher index -> higher bids -> should win duels."""
    params = mgr.state.policy_states.params

    def tweak(path, leaf):
        # Find the actor head's bias: shape [..., 5] on the policy axis.
        if path[-1].key == "bias" and leaf.ndim == 2 and leaf.shape[-1] == 5:
            P = leaf.shape[0]
            new = np.full((P, 5), -10.0, np.float32)
            for i in range(P):
                new[i, min(i + 1, 4)] = 10.0
            return jnp.asarray(new)
        return leaf

    new_params = jax.tree_util.tree_map_with_path(tweak, params)
    return mgr.replace(state=mgr.state.replace(
        policy_states=mgr.state.policy_states.update(params=new_params)))


@pytest.mark.slow
def test_elo_orders_by_strength_and_cull_copies_winner():
    mgr = build_training_mgr(seed=23)
    mgr = bias_policies_by_strength(mgr)

    episode_len = 8
    mgr, _ = jax.jit(lambda m: mlt.eval_elo(
        m, num_eval_steps=4 * episode_len,
        eval_sim_ctrl=jnp.zeros((1,), jnp.int32),
        train_sim_ctrl=jnp.zeros((1,), jnp.int32)))(mgr)

    elos = np.asarray(mgr.state.policy_states.mmr.elo)
    train_elos = elos[:NUM_TRAIN]
    # Strictly increasing strength by construction -> Elo must follow for
    # the train policies (0 bids lowest, NUM_TRAIN-1 highest).
    assert train_elos[-1] > train_elos[0], train_elos
    assert np.argmax(train_elos) == NUM_TRAIN - 1, train_elos
    assert np.argmin(train_elos) == np.argmin(train_elos[:NUM_TRAIN])

    # Cull: the weakest train policy must receive the strongest's params.
    weakest = int(np.argmin(train_elos))
    strongest = int(np.argmax(train_elos))

    params_before = jax.device_get(mgr.state.policy_states.params)

    new_state = jax.jit(
        lambda s: pbt_cull_update(mgr.cfg, s, 1))(mgr.state)
    params_after = jax.device_get(new_state.policy_states.params)

    def actor_bias(params, idx):
        leaves = [
            l for p, l in jax.tree_util.tree_flatten_with_path(params)[0]
            if p[-1].key == "bias" and l.ndim == 2 and l.shape[-1] == 5]
        return np.asarray(leaves[0][idx])

    np.testing.assert_array_equal(
        actor_bias(params_after, weakest),
        actor_bias(params_before, strongest))


@pytest.mark.slow
def test_eval_elo_compile_cached_across_calls():
    """Eager eval_elo calls must reuse the compiled tournament: the second
    call may not pay trace+compile time again."""
    import time

    mgr = build_training_mgr(seed=29)
    kwargs = dict(
        num_eval_steps=8,
        eval_sim_ctrl=jnp.zeros((1,), jnp.int32),
        train_sim_ctrl=jnp.zeros((1,), jnp.int32))

    t0 = time.perf_counter()
    mgr2, deltas = mlt.eval_elo(mgr, **kwargs)
    jax.block_until_ready(deltas)
    first = time.perf_counter() - t0

    t0 = time.perf_counter()
    mgr3, deltas = mlt.eval_elo(mgr2, **kwargs)
    jax.block_until_ready(deltas)
    second = time.perf_counter() - t0

    # Compile dominates the first call by orders of magnitude on this tiny
    # config; 4x is a loose bound robust to CI noise.
    assert second < first / 4, (first, second)
    assert np.isfinite(np.asarray(mgr3.state.policy_states.mmr.elo)).all()
