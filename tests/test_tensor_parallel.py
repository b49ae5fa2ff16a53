"""Tensor parallelism: model-axis-sharded params produce identical outputs
to replicated execution, with the matmuls actually partitioned by GSPMD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import madrona_learn_tpu as mlt
from madrona_learn_tpu.models import MLP
from madrona_learn_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    shard_params_for_tp,
)


@pytest.fixture(scope="module")
def model_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(mlt.MeshConfig(data=2, policy=1, model=4))


def test_tp_sharded_forward_matches_replicated(model_mesh):
    mesh = model_mesh
    dtype = jnp.float32
    net = MLP(num_channels=512, num_layers=2, dtype=dtype)

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 128)), dtype)
    params = net.init(jax.random.PRNGKey(0), x, False)

    ref = jax.jit(lambda p, x: net.apply(p, x, False))(params, x)

    shardings = shard_params_for_tp(
        params, mesh, min_dim=256, stacked_policy_axis=False)
    sharded_params = jax.tree.map(jax.device_put, params, shardings)

    # Kernels got the model-axis partition.
    kernel_shard = jax.tree_util.tree_flatten_with_path(shardings)[0]
    kernel_specs = [
        s.spec for p, s in kernel_shard if p[-1].key == "kernel"]
    assert any(MODEL_AXIS in str(spec) for spec in kernel_specs)

    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda p, x: net.apply(p, x, False))(sharded_params,
                                                       x_sharded)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_tp_grad_matches_replicated(model_mesh):
    mesh = model_mesh
    net = MLP(num_channels=512, num_layers=1, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(32, 128)), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x, False)

    loss = lambda p, x: jnp.sum(jnp.square(net.apply(p, x, False)))

    g_ref = jax.jit(jax.grad(loss))(params, x)

    shardings = shard_params_for_tp(
        params, mesh, min_dim=256, stacked_policy_axis=False)
    sharded_params = jax.tree.map(jax.device_put, params, shardings)
    g_tp = jax.jit(jax.grad(loss))(sharded_params, x)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        g_ref, g_tp)
