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


def test_tp_fold_param_layout():
    """The learn region's TP fold: with mesh.model > 1 params enter the
    manual shard_map region gathered over ``model`` (each device holds the
    FULL parameter copy of its policy shard — docs/scaling.md "The TP fold
    and its memory ceiling"), while minibatch rows split over data x model.
    Asserted at trace time via an optimize_metrics hook running inside the
    region: every param leaf shape must equal the single-device trace's
    shape, and the minibatch row count must be 1/(data*model) of it."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from madrona_learn_tpu.envs import ToyEnvConfig, make_toy_env
    from madrona_learn_tpu.models import (
        ActorCritic, BackboneShared, DenseLayerCritic,
        DenseLayerDiscreteActor, DictActor, LSTM,
        RecurrentBackboneEncoder)
    from madrona_learn_tpu.parallel import shard_training_manager

    num_worlds = 32
    dtype = jnp.float32
    captures = {}

    class CaptureHooks(mlt.TrainHooks):
        def __init__(self, key):
            self._key = key

        def optimize_metrics(self, metrics, epoch_idx, minibatch,
                             policy_state, train_state):
            if self._key not in captures:
                captures[self._key] = {
                    "params": [x.shape for x in
                               jax.tree.leaves(policy_state.params)],
                    "mb": [x.shape for x in jax.tree.leaves(minibatch)],
                }
            return metrics

    def run(mesh_cfg, key):
        actions = {"move": mlt.DiscreteActionsConfig(
            actions_num_buckets=[5])}
        sim_fns = make_toy_env(ToyEnvConfig(
            num_worlds=num_worlds, episode_len=20, grid_size=5, seed=31))
        ac = ActorCritic(
            backbone=BackboneShared(
                prefix=lambda obs, train: jnp.concatenate(
                    [obs["delta"], obs["time"]], axis=-1),
                encoder=RecurrentBackboneEncoder(
                    net=MLP(num_channels=512, num_layers=1, dtype=dtype),
                    rnn=LSTM(num_hidden_channels=256, num_layers=1,
                             dtype=dtype))),
            actor=DictActor(heads={"move": DenseLayerDiscreteActor(
                cfg=actions["move"], dtype=dtype)}),
            critic=DenseLayerCritic(dtype=dtype))
        policy = mlt.Policy(
            actor_critic=ac,
            obs_preprocess=mlt.ObservationsCaster.create(dtype=dtype))
        cfg = mlt.TrainConfig(
            num_worlds=num_worlds, num_agents_per_world=1, num_updates=1,
            actions=actions, steps_per_update=8, num_bptt_chunks=2,
            lr=1e-3, gamma=0.99, gae_lambda=0.95, seed=31,
            metrics_buffer_size=1,
            algo=mlt.PPOConfig(
                num_epochs=1, minibatch_size=32,
                clip_coef=0.2, value_loss_coef=0.5, entropy_coef=0.01,
                max_grad_norm=0.5),
            dreamer_v3_critic=False,
            mesh=mesh_cfg)
        import warnings as _warnings
        with _warnings.catch_warnings():
            # The overridden optimize_metrics heads-up is expected here.
            _warnings.simplefilter("ignore", UserWarning)
            mgr = mlt.init_training(
                None, cfg, sim_fns, policy,
                init_sim_ctrl=jnp.zeros((1,), jnp.int32),
                user_hooks=CaptureHooks(key))
        if mesh_cfg is not None and mesh_cfg.num_devices > 1:
            mesh = make_mesh(mesh_cfg, jax.devices()[:mesh_cfg.num_devices])
            mgr = shard_training_manager(mgr, mesh)
        # Tracing is enough to run the hook; avoid the full execution.
        jax.jit(lambda m: m.update_iter()).lower(mgr)

    run(None, "single")
    run(mlt.MeshConfig(data=2, policy=1, model=2, manual_learn=True),
        "folded")

    single, folded = captures["single"], captures["folded"]
    # Params inside the region are FULL copies: no leaf narrowed by the
    # model axis (the fold gathers over model at region entry).
    assert folded["params"] == single["params"], (
        "TP fold must not shard params inside the learn region")
    # Minibatch rows split over data x model = 4. The minibatch layout is
    # time-major [T, MB, ...] (rnn start states [MB, ...]); the row dim is
    # the one equal to minibatch_size=32, unique at this shape.
    def fold_rows(shape):
        assert shape.count(32) == 1, shape
        return tuple(d // 4 if d == 32 else d for d in shape)
    assert folded["mb"] == [fold_rows(s) for s in single["mb"]], (
        folded["mb"], single["mb"])


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
