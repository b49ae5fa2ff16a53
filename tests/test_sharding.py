"""Mesh sharding: the full training step must compile + run sharded over a
virtual 8-device CPU mesh, and produce the same results as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import madrona_learn_tpu as mlt
from madrona_learn_tpu.parallel import (
    DATA_AXIS,
    POLICY_AXIS,
    make_mesh,
    shard_training_manager,
    training_manager_shardings,
)

from test_pbt_e2e import build_training_mgr


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_dryrun_multichip(eight_devices):
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_matches_single_device(eight_devices):
    # Single-device result.
    mgr_single = build_training_mgr(seed=17)
    update = jax.jit(lambda m: m.update_iter())
    out_single = update(mgr_single)
    loss_single = np.asarray(out_single.metrics.metrics["Loss"].mean)

    # Same config sharded over (data=4, policy=2).
    mesh = make_mesh(mlt.MeshConfig(data=4, policy=2), eight_devices)
    mgr_sharded = shard_training_manager(build_training_mgr(seed=17), mesh)
    out_sharded = update(mgr_sharded)
    loss_sharded = np.asarray(out_sharded.metrics.metrics["Loss"].mean)

    np.testing.assert_allclose(loss_single, loss_sharded, rtol=1e-5,
                               atol=1e-6)


def test_sharding_rules(eight_devices):
    mesh = make_mesh(mlt.MeshConfig(data=4, policy=2), eight_devices)
    mgr = build_training_mgr(seed=1)
    shardings = training_manager_shardings(mgr, mesh)

    # Sim-batch-sized rollout leaves shard over data.
    env_ret_spec = shardings.rollout.env_returns.spec
    assert env_ret_spec == jax.sharding.PartitionSpec(DATA_AXIS)

    # Population-sized train-state leaves shard over policy.
    lr_spec = shardings.state.train_states.hyper_params.lr.spec
    assert lr_spec == jax.sharding.PartitionSpec(POLICY_AXIS)

    # Placement actually applies.
    sharded = shard_training_manager(mgr, mesh)
    assert len(sharded.rollout.env_returns.sharding.device_set) == 8
