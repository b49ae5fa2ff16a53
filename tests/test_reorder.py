"""Round-trip tests for the sim<->policy chunk reorder index math.

Ports the strategy of the reference's reorder unit tests (reference:
tests/test_rollouts.py:36-127): scatter-then-gather must reconstruct the
assignment array exactly, including zero-count policies and permuted inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_learn_tpu.ops.reorder import (
    PolicyBatchReorderState,
    compute_reorder_chunks,
)


def roundtrip(assignments, P, C, B):
    assignments = jnp.asarray(assignments, jnp.int32)
    N = assignments.shape[0]
    to_policy, to_sim = jax.jit(
        compute_reorder_chunks, static_argnums=(1, 2, 3))(assignments, P, C, B)

    state = PolicyBatchReorderState(
        to_policy_idxs=to_policy,
        to_sim_idxs=to_sim,
        policy_dims=(P, C),
        sim_dims=(N,),
    )
    # Gather assignments into chunk layout, then back to sim layout.
    chunked = state.to_policy(assignments)
    recon = state.to_sim(chunked)
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(assignments))
    return np.asarray(to_policy), np.asarray(chunked)


def chunks_are_policy_pure(to_policy, chunked, assignments, N):
    """Every chunk must contain only one policy's agents (or sentinel)."""
    for row_idx in range(to_policy.shape[0]):
        row = to_policy[row_idx]
        valid = row < N
        if not valid.any():
            continue
        vals = np.asarray(chunked[row_idx])
        assert len(np.unique(vals)) == 1, f"chunk {row_idx} mixes policies"


def test_even_assignment():
    P, C = 4, 4
    N = 16
    B = -(N // -C) + P - 1
    assignments = np.repeat(np.arange(P), N // P)
    to_policy, chunked = roundtrip(assignments, P, C, B)
    chunks_are_policy_pure(to_policy, chunked, assignments, N)


def test_uneven_with_empty_policy():
    P, C = 4, 4
    assignments = np.array([0, 0, 0, 0, 0, 2, 2, 3, 3, 3, 3, 3, 3, 3, 2, 0])
    N = len(assignments)
    B = -(N // -C) + P - 1
    to_policy, chunked = roundtrip(assignments, P, C, B)
    chunks_are_policy_pure(to_policy, chunked, assignments, N)


def test_permuted_assignments():
    rng = np.random.default_rng(5)
    P, C = 7, 8
    N = 64
    B = -(N // -C) + P - 1
    for _ in range(10):
        assignments = rng.integers(0, P, size=N)
        to_policy, chunked = roundtrip(assignments, P, C, B)
        chunks_are_policy_pure(to_policy, chunked, assignments, N)


def test_all_one_policy():
    P, C = 5, 4
    N = 20
    B = -(N // -C) + P - 1
    assignments = np.full(N, 3)
    to_policy, chunked = roundtrip(assignments, P, C, B)
    chunks_are_policy_pure(to_policy, chunked, assignments, N)


def test_single_agent_per_policy():
    P, C = 8, 4
    N = 8
    B = -(N // -C) + P - 1
    assignments = np.arange(P)
    roundtrip(assignments, P, C, B)


def test_payload_roundtrip_multidim():
    """Reordering must round-trip arbitrary per-agent payloads, not just ids."""
    rng = np.random.default_rng(11)
    P, C = 3, 8
    N = 32
    B = -(N // -C) + P - 1
    assignments = jnp.asarray(rng.integers(0, P, size=N), jnp.int32)
    payload = jnp.asarray(rng.normal(size=(N, 5)), jnp.float32)

    to_policy, to_sim = compute_reorder_chunks(assignments, P, C, B)
    state = PolicyBatchReorderState(
        to_policy_idxs=to_policy, to_sim_idxs=to_sim,
        policy_dims=(P, C), sim_dims=(N,))

    recon = state.to_sim(state.to_policy(payload))
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(payload))


def test_simple_path_reshapes():
    """With trivial matchmaking both directions are pure reshapes."""
    P, C = 2, 8
    N = 16
    x = jnp.arange(N, dtype=jnp.float32)[:, None]
    state = PolicyBatchReorderState(
        to_policy_idxs=None, to_sim_idxs=None,
        policy_dims=(P, C), sim_dims=(N,))
    chunked = state.to_policy(x)
    assert chunked.shape == (P, C, 1)
    recon = state.to_sim(chunked)
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(x))


# -- property-based fuzzing -------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    data=st.data(),
    P=st.integers(min_value=1, max_value=12),
    C=st.sampled_from([2, 4, 8, 16]),
)
def test_reorder_roundtrip_fuzz(data, P, C):
    N = data.draw(st.integers(min_value=1, max_value=96))
    assignments = np.asarray(
        data.draw(st.lists(
            st.integers(min_value=0, max_value=P - 1),
            min_size=N, max_size=N)))
    B = -(N // -C) + P - 1
    to_policy, chunked = roundtrip(assignments, P, C, B)
    chunks_are_policy_pure(to_policy, chunked, assignments, N)


# -- shard-local variant ------------------------------------------------------

from madrona_learn_tpu.ops.reorder import compute_reorder_chunks_sharded


def roundtrip_sharded(assignments, P, C, D):
    assignments = jnp.asarray(assignments, jnp.int32)
    N = assignments.shape[0]
    B_local = -((N // D) // -C) + P - 1
    to_policy, to_sim = jax.jit(
        compute_reorder_chunks_sharded,
        static_argnums=(1, 2, 3, 4))(assignments, P, C, B_local, D)
    assert to_policy.shape == (D, B_local, C)
    assert to_sim.shape == (D, N // D)

    state = PolicyBatchReorderState(
        to_policy_idxs=to_policy,
        to_sim_idxs=to_sim,
        policy_dims=(P, C),
        sim_dims=(N,),
        data_shards=D,
    )
    chunked = state.to_policy(assignments)
    recon = state.to_sim(chunked)
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(assignments))

    # Globalized view of the indices for the purity checker.
    n_local = N // D
    tp = np.asarray(to_policy)
    tp_global = np.where(
        tp == n_local, N,
        tp + (np.arange(D, dtype=np.int32) * n_local)[:, None, None]
    ).reshape(D * B_local, C)
    return tp_global, np.asarray(chunked)


@pytest.mark.parametrize("D", [2, 4])
def test_sharded_roundtrip_and_purity(D):
    rng = np.random.default_rng(5)
    P, C, N = 5, 4, 64
    assignments = rng.integers(0, P, size=N)
    to_policy, chunked = roundtrip_sharded(assignments, P, C, D)
    chunks_are_policy_pure(to_policy, chunked, assignments, N)


def test_sharded_indices_are_local():
    """All index arrays are shard-local by construction — the property that
    lets the transforms run as batched gathers with zero communication."""
    rng = np.random.default_rng(6)
    P, C, D, N = 4, 4, 4, 96
    n_local = N // D
    assignments = rng.integers(0, P, size=N)
    B_local = -(n_local // -C) + P - 1
    to_policy, to_sim = compute_reorder_chunks_sharded(
        jnp.asarray(assignments, jnp.int32), P, C, B_local, D)
    # Local gather indices never exceed the block (sentinel == n_local).
    assert (np.asarray(to_policy) <= n_local).all()
    assert (np.asarray(to_sim) < B_local * C).all()


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    P=st.integers(min_value=1, max_value=8),
    C=st.sampled_from([2, 4, 8]),
    D=st.sampled_from([2, 4]),
)
def test_sharded_roundtrip_fuzz(data, P, C, D):
    n_local = data.draw(st.integers(min_value=1, max_value=24))
    N = n_local * D
    assignments = np.asarray(
        data.draw(st.lists(
            st.integers(min_value=0, max_value=P - 1),
            min_size=N, max_size=N)))
    to_policy, chunked = roundtrip_sharded(assignments, P, C, D)
    chunks_are_policy_pure(to_policy, chunked, assignments, N)


def test_sharded_requires_multiple_shards():
    """D=1 is fenced: the degenerate case belongs to the global
    construction (production routes data_shards=1 there), and the local
    sentinel layout is only meaningful with real shard blocks."""
    assignments = jnp.zeros((16,), jnp.int32)
    with pytest.raises(ValueError, match="requires D > 1"):
        compute_reorder_chunks_sharded(assignments, 2, 4, 5, 1)
