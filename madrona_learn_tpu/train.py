"""Training orchestration: the resident update step + PBT outer loop.

Capability parity with the reference orchestrator (reference:
train.py:35-1062): ``init_training`` wires rollout state, the stacked policy
population, metrics and the update function into a ``TrainingManager`` whose
``update_iter`` — collect rollouts -> update obs stats -> vmapped per-policy
PPO -> write back train slice — is one jit-compiled, buffer-donated program.
``eval_elo`` runs an in-loop all-pairs Elo tournament by temporarily switching
matchmaking to static assignments; ``update_population`` applies cull/past
evolution.

TPU-native: ``init_training`` takes a ``MeshConfig`` (via ``cfg.mesh``) and
builds a ``jax.sharding.Mesh``; the update step's arguments carry
NamedShardings that shard the sim batch over the ``data`` axis and the
population over the ``policy`` axis (see ``parallel/``). On one chip the
degenerate mesh reproduces reference semantics exactly.
"""

from __future__ import annotations

import os
import warnings
from collections import OrderedDict
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Union

import flax
import jax
import jax.numpy as jnp
import numpy as np
from flax.core import FrozenDict
from jax import random

from .algo import AlgoBase
from .config import TrainConfig
from .ops.metrics import TrainingMetrics
from .pbt import (
    pbt_cull_update,
    pbt_explore_hyperparams,
    pbt_past_update,
    pbt_update_elo,
)
from .policy import Policy
from .rollouts import (
    RolloutConfig,
    RolloutManager,
    RolloutState,
    rollout_loop,
    rollouts_reset,
)
from .parallel.mesh import DATA_AXIS, MODEL_AXIS, POLICY_AXIS, make_mesh
from .train_state import TrainStateManager, map_adam_moments
from .utils.profile import profile


class TrainingManager(flax.struct.PyTreeNode):
    state: TrainStateManager
    rollout: RolloutState
    metrics: TrainingMetrics
    update_idx: jax.Array
    cfg: TrainConfig = flax.struct.field(pytree_node=False)
    update_fn: Callable = flax.struct.field(pytree_node=False)
    profile_port: Optional[int] = flax.struct.field(pytree_node=False)

    def save_ckpt(self, path, block=True):
        """Write ``path/<update_idx>``. ``block=False`` overlaps
        serialization with continued training (see
        ``TrainStateManager.save``); call ``wait_for_checkpoints()`` before
        relying on the files."""
        update_idx = int(self.update_idx)
        self.state.save(update_idx, os.path.join(path, str(update_idx)),
                        block=block)

    def load_ckpt(self, path):
        state, next_update = self.state.load(path)
        return self.replace(
            state=state, update_idx=jnp.asarray(next_update, jnp.int32))

    def update_iter(self):
        new_state, new_rollout, new_metrics = self.update_fn(
            self.state, self.rollout, self.metrics, self.update_idx)
        return self.replace(
            state=new_state,
            rollout=new_rollout,
            metrics=new_metrics,
            update_idx=self.update_idx + 1,
        )

    def log_metrics_tensorboard(self, tb_writer):
        cpu_metrics = jax.tree.map(np.asarray, self.metrics)
        cpu_metrics.tensorboard_log(int(self.update_idx) - 1, tb_writer)


@dataclass(frozen=True)
class TrainHooks:
    """User extension points. Must be stateless; custom state goes in the
    pytree returned by ``init_user_state`` (checkpointed alongside params)."""

    def init_user_state(self):
        return None

    def start_rollouts(self, rollout_state: RolloutState, user_state: Any):
        return rollout_state, user_state

    def finish_rollouts(self, rollouts, bootstrap_values,
                        unnormalized_values, unnormalized_bootstrap_values,
                        user_state):
        return rollouts, user_state

    def add_metrics(self, metrics: FrozenDict):
        return metrics

    def rollout_metrics(self, metrics, rollouts, user_state):
        return metrics

    def optimize_metrics(self, metrics, epoch_idx, minibatch, policy_state,
                         train_state):
        """Called once per minibatch inside the learn phase. Inside the
        manual shard_map learn region (multi-device mesh with
        ``manual_learn``), ``minibatch`` holds this data shard's equal
        slice of the global minibatch; record cross-shard-consistent
        metrics with ``metrics.record(..., axis_name="data")``."""
        return metrics


def init_training(
    dev: Optional[jax.Device],
    cfg: TrainConfig,
    sim_fns: Dict[str, Callable],
    policy: Policy,
    init_sim_ctrl: jax.Array,
    user_hooks: TrainHooks = TrainHooks(),
    restore_ckpt: Optional[str] = None,
    profile_port: Optional[int] = None,
    init_on_cpu: bool = False,
) -> TrainingManager:
    """Build the TrainingManager.

    ``init_on_cpu=True`` runs every one-time initialization program (sim
    init, population init, metric buffers) on the host CPU backend and
    transfers the resulting state pytree to ``dev`` afterwards. On TPU
    deployments where device compilation is expensive this cuts startup to a
    single compile (the update step itself); results are identical since init
    is pure array construction.
    """
    print(cfg)
    print()

    if init_on_cpu:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            mgr = _init_training(cfg, sim_fns, policy,
                                 jax.device_put(init_sim_ctrl, cpu),
                                 user_hooks, restore_ckpt, profile_port)
        target = dev if dev is not None else jax.devices()[0]
        arrays, treedef = jax.tree.flatten(mgr)
        arrays = jax.device_put(arrays, target)
        return jax.tree.unflatten(treedef, arrays)

    if dev is not None:
        with jax.default_device(dev):
            return _init_training(cfg, sim_fns, policy, init_sim_ctrl,
                                  user_hooks, restore_ckpt, profile_port)
    return _init_training(cfg, sim_fns, policy, init_sim_ctrl, user_hooks,
                          restore_ckpt, profile_port)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Path of the newest update-indexed checkpoint under ``ckpt_dir``,
    or None. Supports crash-resume loops::

        mgr = init_training(..., restore_ckpt=latest_checkpoint(ckpt_dir))
    """
    if not os.path.isdir(ckpt_dir):
        return None
    indexed = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    if not indexed:
        return None
    return os.path.join(ckpt_dir, max(indexed, key=int))


# Live eval_elo_warmup threads, keyed by the manager's update_fn identity
# (stable across TrainingManager.replace for a training run, same key the
# compiled-program cache uses). stop_training joins these so no daemon
# thread — possibly mid-XLA-compile — outlives a clean shutdown and races
# interpreter teardown.
_WARMUP_THREADS: Dict[int, list] = {}


def _register_warmup_thread(training_mgr: TrainingManager, thread):
    threads = _WARMUP_THREADS.setdefault(id(training_mgr.update_fn), [])
    threads[:] = [t for t in threads if t.is_alive()]
    threads.append(thread)


def join_warmup_threads(training_mgr: TrainingManager):
    """Block until every eval_elo_warmup thread started for this manager has
    finished compiling. Called by ``stop_training``; call directly to
    barrier on warmup completion earlier."""
    for t in _WARMUP_THREADS.pop(id(training_mgr.update_fn), []):
        t.join()


def stop_training(training_mgr: TrainingManager):
    join_warmup_threads(training_mgr)
    if training_mgr.profile_port is not None:
        training_mgr.state.train_states.update_prng_key.block_until_ready()
        jax.profiler.stop_server()


def _learn_row_axes(cfg: TrainConfig):
    """Mesh axes the learn region splits minibatch rows over.

    ``model > 1`` folds the model axis into the row split: the learn
    phase treats it as extra batch parallelism (recurrent-sequence TP
    would place a collective inside every time step, which is
    latency-poison on TPU; see MeshConfig's docstring and
    docs/scaling.md "The TP fold"). Returns a plain axis name on
    model==1 meshes so single-axis traces stay identical."""
    if cfg.mesh is not None and cfg.mesh.model > 1:
        return (DATA_AXIS, MODEL_AXIS)
    return DATA_AXIS


def _manual_learn_enabled(cfg: TrainConfig) -> bool:
    """Whether the learn phase runs as a manual shard_map region.

    The manual region keeps the Mosaic kernels routed on multi-chip meshes
    (GSPMD cannot partition a Mosaic custom call — ops/pallas/runtime.py);
    it reproduces global minibatch semantics with pmeans/psums over
    ``data``. Every configuration is served (model-axis TP folds into the
    row split; non-dividing sizes pad with weight-0 rows); the only
    GSPMD fallback is the explicit ``manual_learn=False`` escape hatch.
    """
    mesh_cfg = cfg.mesh
    return not (mesh_cfg is None or mesh_cfg.num_devices <= 1
                or not mesh_cfg.manual_learn)


def _warn_manual_learn_hooks(cfg: TrainConfig, user_hooks: TrainHooks):
    """One-time heads-up for user hooks that predate the manual regions."""
    mesh_cfg = cfg.mesh
    multi = mesh_cfg is not None and mesh_cfg.num_devices > 1
    if _manual_learn_enabled(cfg):
        overridden = (type(user_hooks).optimize_metrics
                      is not TrainHooks.optimize_metrics)
        if overridden:
            warnings.warn(
                "manual_learn is active (multi-device mesh): your "
                "overridden TrainHooks.optimize_metrics now runs inside a "
                "shard_map region and receives only this data shard's "
                "slice of each minibatch. Record cross-shard-consistent "
                "metrics with metrics.record(..., axis_name=\"data\"), or "
                "disable the manual region with "
                "MeshConfig(manual_learn=False).",
                stacklevel=3)
    # The collect-region analog: its gate additionally depends on the sim
    # (data_parallel) and layout divisibility, unknown at init — warn on
    # the config-level preconditions so a hook author hears about the
    # semantics change before a silent wrong-stitch (the region's
    # out_specs claim replicated outputs; a hook computing batch-global
    # state from its shard slice would return divergent values).
    if (multi and getattr(mesh_cfg, "manual_collect", True)
            and mesh_cfg.model == 1):
        overridden_collect = [
            name for name in
            ("start_rollouts", "finish_rollouts", "rollout_metrics")
            if getattr(type(user_hooks), name)
            is not getattr(TrainHooks, name)]
        if overridden_collect:
            warnings.warn(
                "manual_collect is enabled (the MeshConfig default) and "
                f"this mesh can run the collect phase as a shard_map "
                f"region over 'data': your overridden TrainHooks "
                f"{overridden_collect} would then run per data shard on "
                f"1/{mesh_cfg.data} batch slices, and their "
                f"user_state/metrics outputs must be shard-invariant "
                f"(reduce with metrics.record(..., axis_name=\"data\") / "
                f"jax.lax collectives). Disable the region with "
                f"MeshConfig(manual_collect=False) to keep whole-batch "
                f"hook semantics.",
                stacklevel=3)


def _update_impl(
    algo: AlgoBase,
    cfg: TrainConfig,
    user_hooks: TrainHooks,
    rollout_state: RolloutState,
    rollout_mgr: RolloutManager,
    train_state_mgr: TrainStateManager,
    metrics: TrainingMetrics,
    update_idx,
):
    from .ppo import resolve_stratify

    num_train_policies = cfg.pbt.num_train_policies if cfg.pbt else 1
    manual_learn = _manual_learn_enabled(cfg)
    # Uniform-mode stratified minibatch composition (pure function of
    # config + PRNG — identical on every execution path; see
    # ppo.resolve_stratify). When the blocks divide over the data axis the
    # manual region takes rollout data SHARDED over ``data`` and each
    # shard selects its minibatch rows locally — no full-store all-gather
    # at the region boundary (VERDICT r3 item 2).
    stratify = resolve_stratify(
        cfg, rollout_mgr._num_train_seqs_per_policy,
        store_bytes_estimate=rollout_mgr.approx_train_store_bytes)
    row_axes = _learn_row_axes(cfg)
    num_row_shards = (cfg.mesh.data * cfg.mesh.model
                      if cfg.mesh is not None else 1)
    rows_sharded = (manual_learn and stratify > 1
                    and stratify % num_row_shards == 0)

    @jax.vmap
    def algo_wrapper(policy_state, train_state, rollout_data, metrics):
        return algo.update(
            cfg, policy_state, train_state, rollout_data,
            user_hooks.optimize_metrics, metrics,
            stratify=stratify)

    def learn_manual(policy_states, train_states, rollout_data, metrics):
        """The GSPMD-free learn phase: manual over every mesh axis.

        Everything enters sharded over ``policy`` on its (stacked) leading
        axis; the trajectory store additionally enters sharded over
        ``data`` on its row axis in the stratified uniform mode
        (``rows_sharded`` — zero-collective local minibatch selection) and
        replicated over ``data`` otherwise. Inside, each device vmaps over
        its local policies and optimizes the ``data``-sliced minibatches
        (see ppo._ppo). Because the region is manual over every axis,
        ``pallas_backend_ok`` holds and the fused Mosaic kernels serve the
        forward/backward (BASELINE.json north star: kernels at pod scale).
        """
        mesh = make_mesh(cfg.mesh)

        @jax.vmap
        def one_policy(policy_state, train_state, rollout_data, metrics):
            return algo.update(
                cfg, policy_state, train_state, rollout_data,
                user_hooks.optimize_metrics, metrics,
                data_axis=row_axes, stratify=stratify,
                rows_sharded=rows_sharded)

        # A population that does not divide over mesh.policy is padded
        # with copies of policy 0 whose updates are computed and then
        # discarded (cost: one wasted policy slot on the padded shards).
        # The heuristic pads every array leaf whose leading dim is the
        # train-policy count — all stacked trees entering the region are
        # policy-major. (A non-per-policy metric whose buffer length
        # collides with the policy count was never representable under
        # the P(policy) specs below in the first place.)
        pad_p = (-num_train_policies) % cfg.mesh.policy

        def pad_policy_leaf(x):
            if (isinstance(x, jax.Array) and x.ndim >= 1
                    and x.shape[0] == num_train_policies):
                return jnp.concatenate([x] + [x[:1]] * pad_p, axis=0)
            return x

        def slice_policy_leaf(x):
            if (isinstance(x, jax.Array) and x.ndim >= 1
                    and x.shape[0] == num_train_policies + pad_p):
                return x[:num_train_policies]
            return x

        if pad_p:
            (policy_states, train_states, rollout_data, metrics) = (
                jax.tree.map(
                    pad_policy_leaf,
                    (policy_states, train_states, rollout_data, metrics)))

        spec = jax.sharding.PartitionSpec(POLICY_AXIS)
        data_spec = (jax.sharding.PartitionSpec(POLICY_AXIS, row_axes)
                     if rows_sharded else spec)
        # ZeRO optimizer-state sharding: the Adam moment leaves enter and
        # leave the region sharded over the replica axes (their chunked
        # [P, R, chunk] layout's axis 1; train_state.chunk_adam_moments),
        # everything else stays policy-sharded. The spec tree is built by
        # tree-mapping over the live train_states (tree.map preserves the
        # optax namedtuple containers, so map_adam_moments can retarget
        # the mu/nu subtrees of the SPEC tree directly).
        ts_spec = spec
        if (cfg.mesh.zero_rows if cfg.mesh is not None else 1) > 1:
            zero_spec = jax.sharding.PartitionSpec(POLICY_AXIS, row_axes)
            ts_spec = jax.tree.map(lambda _: spec, train_states)
            ts_spec = ts_spec.replace(opt_state=map_adam_moments(
                ts_spec.opt_state,
                lambda sub: jax.tree.map(lambda _: zero_spec, sub)))
        # check_vma=False: pallas_call inside shard_map has no vma
        # metadata on its out_shapes; data-axis invariance of every output
        # is established by the pmeans/psums in ppo._ppo_update and
        # asserted by the sharded == single-device tests
        # (tests/test_sharding.py).
        mapped = jax.shard_map(
            one_policy, mesh=mesh,
            in_specs=(spec, ts_spec, data_spec, spec),
            out_specs=(spec, ts_spec, spec),
            check_vma=False)
        out = mapped(policy_states, train_states, rollout_data, metrics)
        if pad_p:
            out = jax.tree.map(slice_policy_leaf, out)
        return out

    with profile("Update Iter"):
        with profile("Collect Rollouts"):
            (train_state_mgr, rollout_state, rollout_data,
             obs_stats, metrics) = rollout_mgr.collect(
                train_state_mgr, rollout_state, metrics,
                user_hooks.start_rollouts, user_hooks.finish_rollouts,
                user_hooks.rollout_metrics)

        train_policy_states = jax.tree.map(
            lambda x: x[0:num_train_policies],
            train_state_mgr.policy_states)

        with profile("Update Observations Stats"):
            # Optimization only consumes preprocessed observations collected
            # with the *old* state, so folding the streamed stats into the
            # normalizer now only affects the next rollout phase.
            train_policy_states = train_policy_states.update(
                obs_preprocess_state=(
                    train_policy_states.obs_preprocess.update_state(
                        train_policy_states.obs_preprocess_state,
                        obs_stats,
                        True,
                    )))

        with profile("Learn"):
            learn_fn = learn_manual if manual_learn else algo_wrapper
            (train_policy_states, updated_train_states, metrics) = (
                learn_fn(
                    train_policy_states, train_state_mgr.train_states,
                    rollout_data, metrics))

        with profile("Set New Policy States"):
            policy_states = jax.tree.map(
                lambda full, new: full.at[0:num_train_policies].set(new),
                train_state_mgr.policy_states, train_policy_states)
            if cfg.mesh is not None and cfg.mesh.num_devices > 1:
                # Pin the written-back population to the same policy-
                # sharded layout it entered with, so the chained
                # update(update(...)) loop keeps a sharding fixed point
                # (an unconstrained output goes replicated, forcing a
                # reshard or recompile on the next call). The train-slice
                # write itself still materializes gathered inputs (its
                # slice boundaries cross shards; ~38 MB/update at the
                # config-#5 target mesh, scripts/comm_budget.py —
                # acceptable; separating train/past storage would remove
                # it at the cost of re-plumbing every population gather).
                mesh = make_mesh(cfg.mesh)
                pspec = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(POLICY_AXIS))
                n_pol = cfg.mesh.policy
                policy_states = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, pspec)
                    if (isinstance(x, jax.Array) and x.ndim >= 1
                        and x.shape[0] % n_pol == 0) else x,
                    policy_states)

        train_state_mgr = train_state_mgr.replace(
            policy_states=policy_states,
            train_states=updated_train_states,
        )

    metrics = metrics.advance()
    return train_state_mgr, rollout_state, metrics


def _setup_rollout_cfg(cfg: TrainConfig) -> RolloutConfig:
    sim_batch_size = cfg.num_agents_per_world * cfg.num_worlds

    if cfg.pbt is not None:
        assert (cfg.pbt.num_teams * cfg.pbt.team_size ==
                cfg.num_agents_per_world)
        return RolloutConfig.setup(
            num_current_policies=cfg.pbt.num_train_policies,
            num_past_policies=cfg.pbt.num_past_policies,
            num_teams=cfg.pbt.num_teams,
            team_size=cfg.pbt.team_size,
            sim_batch_size=sim_batch_size,
            actions_cfg=cfg.actions,
            self_play_portion=cfg.pbt.self_play_portion,
            cross_play_portion=cfg.pbt.cross_play_portion,
            past_play_portion=cfg.pbt.past_play_portion,
            static_play_portion=0.0,
            reward_gamma=cfg.gamma,
            custom_policy_ids=cfg.custom_policy_ids,
            policy_dtype=cfg.compute_dtype,
            policy_chunk_size_override=(
                cfg.pbt.rollout_policy_chunk_size_override),
            # Shard-local reorder when the sim batch is sharded: per-step
            # chunk construction and gathers stay inside each data shard.
            data_shards=(cfg.mesh.data if cfg.mesh is not None else 1),
            mesh_cfg=cfg.mesh,
        )

    return RolloutConfig.setup(
        num_current_policies=1,
        num_past_policies=0,
        num_teams=1,
        team_size=cfg.num_agents_per_world,
        sim_batch_size=sim_batch_size,
        actions_cfg=cfg.actions,
        self_play_portion=1.0,
        cross_play_portion=0.0,
        past_play_portion=0.0,
        static_play_portion=0.0,
        reward_gamma=cfg.gamma,
        custom_policy_ids=cfg.custom_policy_ids,
        policy_dtype=cfg.compute_dtype,
        mesh_cfg=cfg.mesh,
    )


def _init_training(cfg, sim_fns, policy, sim_ctrl, user_hooks, restore_ckpt,
                   profile_port):
    if profile_port is not None:
        jax.profiler.start_server(profile_port)

    _warn_manual_learn_hooks(cfg, user_hooks)

    algo = cfg.algo.setup()

    seed = random.key(cfg.seed) if isinstance(cfg.seed, int) else cfg.seed
    rollout_rng, init_rng = random.split(seed)

    rollout_cfg = _setup_rollout_cfg(cfg)

    @partial(jax.jit, donate_argnums=[0])
    def init_rollout_state(sim_ctrl):
        rnn_states = policy.actor_critic.init_recurrent_state(
            rollout_cfg.sim_batch_size)
        return RolloutState.create(
            rollout_cfg=rollout_cfg,
            sim_fns=sim_fns,
            prng_key=rollout_rng,
            rnn_states=rnn_states,
            init_sim_ctrl=sim_ctrl,
            static_play_assignments=None,
        )

    rollout_state = init_rollout_state(sim_ctrl)

    train_state_mgr = TrainStateManager.create(
        policy=policy,
        cfg=cfg,
        algo=algo,
        init_user_state_cb=user_hooks.init_user_state,
        base_rng=init_rng,
        example_obs=rollout_state.cur_obs,
        use_competitive_mmr=rollout_cfg.pbt.complex_matchmaking,
    )

    @partial(jax.jit, donate_argnums=0)
    def sample_hyperparams(train_state_mgr):
        policy_states = train_state_mgr.policy_states
        train_states = train_state_mgr.train_states
        pbt_rng = train_state_mgr.pbt_rng

        explore = jax.vmap(
            pbt_explore_hyperparams, in_axes=(None, 0, 0, 0, None))

        rngs = random.split(pbt_rng, cfg.pbt.num_train_policies + 1)
        pbt_rng, explore_rngs = rngs[0], rngs[1:]

        train_policy_states = jax.tree.map(
            lambda x: x[0:cfg.pbt.num_train_policies], policy_states)
        train_policy_states, train_states = explore(
            cfg, explore_rngs, train_policy_states, train_states, 1.0)

        policy_states = jax.tree.map(
            lambda x, y: x.at[0:cfg.pbt.num_train_policies].set(y),
            policy_states, train_policy_states)

        return train_state_mgr.replace(
            policy_states=policy_states,
            train_states=train_states,
            pbt_rng=pbt_rng,
        )

    if cfg.pbt:
        train_state_mgr = sample_hyperparams(train_state_mgr)

    if restore_ckpt is not None:
        train_state_mgr, start_update_idx = train_state_mgr.load(restore_ckpt)
    else:
        start_update_idx = 0

    rollout_mgr = RolloutManager(
        train_cfg=cfg,
        init_rollout_state=rollout_state,
        example_policy_states=train_state_mgr.policy_states,
    )

    metrics = algo.add_metrics(cfg, FrozenDict())
    metrics = rollout_mgr.add_metrics(cfg, metrics)
    metrics = user_hooks.add_metrics(metrics)
    num_metric_policies = (
        train_state_mgr.train_states.update_prng_key.shape[0])
    metrics = TrainingMetrics.create(
        metrics, cfg.metrics_buffer_size, start_update_idx,
        num_metric_policies)

    def update_wrapper(train_state_mgr, rollout_state, metrics, update_idx):
        return _update_impl(
            algo=algo,
            cfg=cfg,
            user_hooks=user_hooks,
            rollout_state=rollout_state,
            rollout_mgr=rollout_mgr,
            train_state_mgr=train_state_mgr,
            metrics=metrics,
            update_idx=update_idx,
        )

    return TrainingManager(
        state=train_state_mgr,
        rollout=rollout_state,
        metrics=metrics,
        update_idx=jnp.asarray(start_update_idx, jnp.int32),
        cfg=cfg,
        update_fn=update_wrapper,
        profile_port=profile_port,
    )


# ---------------------------------------------------------------------------
# PBT outer loop: Elo tournament + population evolution
# ---------------------------------------------------------------------------

class MatchmakeEvalState(flax.struct.PyTreeNode):
    policy_elos: jax.Array


def _build_all_pairs_assignments(num_eval_policies, custom_policy_ids,
                                 sim_batch_size, num_teams, team_size,
                                 pair_offset=0):
    """Static all-pairs (plus custom-policy) team assignments, repeated to
    fill the sim batch (reference: train.py:914-963).

    ``pair_offset`` (may be a traced scalar) rotates which pairings claim
    the match slots. When the batch underfills the pairing list, callers
    that advance the offset each eval cycle sweep coverage across the
    dropped pairings instead of always starving the same tail."""
    pairs = []
    for a in range(num_eval_policies):
        for b in range(num_eval_policies):
            pairs.extend([a, b])
        for custom_id in custom_policy_ids:
            pairs.extend([a, custom_id])
    for custom_id in custom_policy_ids:
        for b in range(num_eval_policies):
            pairs.extend([custom_id, b])
        for other in custom_policy_ids:
            pairs.extend([custom_id, other])

    # Cycle the pair list to fill every match slot. (The reference instead
    # zero-pads when the batch is smaller than the pair list —
    # train.py:937-956 — which silently turns all matches into
    # policy-0-vs-policy-0; cycling covers a maximal prefix of distinct
    # pairs in that regime and all pairs, repeated, otherwise.)
    num_match_slots = sim_batch_size // (team_size * num_teams)
    pairs_arr = np.asarray(pairs, np.int32).reshape(-1, num_teams)
    if num_match_slots < pairs_arr.shape[0]:
        # Which pairings are dropped depends on pair_offset (often a traced
        # scalar that rotates per eval cycle), so no static list is
        # truthful here — report the count and the rotation mechanism.
        warnings.warn(
            f"all-pairs eval underfilled: sim batch provides "
            f"{num_match_slots} match slots but the tournament has "
            f"{pairs_arr.shape[0]} pairings — each cycle drops "
            f"{pairs_arr.shape[0] - num_match_slots} pairings (a "
            f"pair_offset-dependent contiguous run of the pair list; "
            f"advance eval_elo's pair_offset per cycle to rotate which). "
            f"Elo updates are partial — each dropped pair "
            f"contributes no head-to-head evidence, which biases rankings "
            f"only between policies whose remaining opponents differ in "
            f"strength (transitivity still orders them through shared "
            f"opponents; see tests/test_elo_semantics.py underfill "
            f"invariant). Increase num_worlds or reduce the population "
            f"for full coverage.",
            stacklevel=2)
    slot_idx = (jnp.arange(num_match_slots)
                + pair_offset) % pairs_arr.shape[0]
    assignments = jnp.asarray(pairs_arr)[slot_idx]  # [slots, num_teams]
    assignments = jnp.repeat(assignments.reshape(-1), team_size)
    assert assignments.shape[0] == sim_batch_size
    return assignments


# Compiled PBT-outer-loop cache, bounded: each entry pins a compiled
# program (host + device memory), and long-lived processes may build many
# managers (sweeps, tests), so evict oldest beyond a small working set.
# Holds both the Elo-tournament and the population-update jits (the two
# host-driven PBT outer-loop programs; everything else lives inside the
# resident update step).
_PBT_OUTER_CACHE: "OrderedDict[Any, Callable]" = OrderedDict()
_PBT_OUTER_CACHE_MAX = 16


def _pbt_outer_fn(key, make):
    fn = _PBT_OUTER_CACHE.get(key)
    if fn is None:
        fn = make()
        _PBT_OUTER_CACHE[key] = fn
        while len(_PBT_OUTER_CACHE) > _PBT_OUTER_CACHE_MAX:
            _PBT_OUTER_CACHE.popitem(last=False)
    else:
        _PBT_OUTER_CACHE.move_to_end(key)
    return fn


def _tournament_fn(training_mgr, num_eval_steps):
    return _pbt_outer_fn(
        ("elo", id(training_mgr.update_fn), num_eval_steps),
        lambda: jax.jit(
            partial(_eval_elo_impl, num_eval_steps=num_eval_steps)))


def _population_update_fn(training_mgr):
    return _pbt_outer_fn(
        ("evolve", id(training_mgr.update_fn)),
        lambda: jax.jit(_update_population_impl))


def eval_elo_warmup(
    training_mgr: TrainingManager,
    num_eval_steps: int,
    eval_sim_ctrl: jax.Array,
    train_sim_ctrl: jax.Array,
    block: bool = False,
):
    """Compile the Elo tournament and the population update ahead of their
    first use, without running them.

    The tournament program is large (a full static-matchmaking rollout
    loop) and its first in-loop compile historically dominated the first
    eval cycle (103.5s at BASELINE config #4 scale, round 2). Call this
    right after ``init_training``: with ``block=False`` (default) the
    trace+XLA compile runs on a daemon thread and overlaps the first
    training updates (XLA compilation releases the GIL), so by the time
    ``eval_elo`` first fires the jit cache is warm and the cycle costs
    only its run time.

    Returns the warmup thread (or None when ``block=True``); joining it is
    optional — ``eval_elo`` works correctly either way, at worst compiling
    synchronously as before. ``stop_training`` joins any still-running
    warmup threads for this manager (via ``join_warmup_threads``), so a
    clean shutdown never races a mid-compile daemon thread against
    interpreter teardown.
    """
    fn = _tournament_fn(training_mgr, num_eval_steps)
    evolve_fn = _population_update_fn(training_mgr)

    def compile_now():
        # AOT trace+compile through the SAME jit wrappers the in-loop calls
        # use: the lowering lands in pjit's executable cache, so the later
        # eval_elo / update_population calls retrace (cheap) but skip the
        # XLA compile (pair_offset must match eval_elo's traced-int32
        # signature). The population update is warmed too — round-3
        # campaign measurement showed an un-warmed eager update_population
        # costing ~110s of per-op first-call compiles at BASELINE config #4
        # scale while the warmed tournament itself was fast.
        fn.lower(training_mgr, eval_sim_ctrl, train_sim_ctrl,
                 jnp.asarray(0, jnp.int32)).compile()
        evolve_fn.lower(training_mgr).compile()

    if block:
        compile_now()
        return None

    import threading

    thread = threading.Thread(
        target=compile_now, name="eval-elo-warmup", daemon=True)
    _register_warmup_thread(training_mgr, thread)
    thread.start()
    return thread


def eval_elo(
    training_mgr: TrainingManager,
    num_eval_steps: int,
    eval_sim_ctrl: jax.Array,
    train_sim_ctrl: jax.Array,
    pair_offset: Union[int, jax.Array] = 0,
):
    """All-pairs static-matchmaking tournament; returns updated Elos
    (re-baselined to 1500 against the baseline policy) + deltas.

    ``pair_offset`` rotates which pairings occupy the match slots; advance
    it per eval cycle (e.g. by the update index) so an underfilled batch
    sweeps coverage across all pairings over successive tournaments. It is
    a traced argument — changing it does not recompile.

    The tournament is jitted and cached per (manager, num_eval_steps), so
    in-loop tournaments pay compile time once — repeated eager calls reuse
    the compiled program (the reference re-traces its host-driven loop every
    call, reference: train.py:397-549).

    The key is the manager's ``update_fn`` identity (stable across
    ``replace()`` for a training run): the jitted tournament specializes on
    that closure as a static pytree field anyway, so keying on the config
    repr (as before) could only ever pretend to share compilations between
    managers — a fresh manager with an equal config re-traced regardless —
    while configs holding callables/arrays repr object identities and
    thrashed the LRU. A recycled id after GC at worst triggers a retrace
    inside the cached jit wrapper, never a wrong program.

    ``eval_elo_warmup`` pre-compiles this program in the background so the
    first in-loop tournament doesn't stall on XLA."""
    fn = _tournament_fn(training_mgr, num_eval_steps)
    return fn(training_mgr, eval_sim_ctrl, train_sim_ctrl,
              jnp.asarray(pair_offset, jnp.int32))


def _eval_elo_impl(
    training_mgr: TrainingManager,
    eval_sim_ctrl: jax.Array,
    train_sim_ctrl: jax.Array,
    pair_offset: jax.Array = 0,
    *,
    num_eval_steps: int,
):
    train_cfg = training_mgr.cfg
    policy_states = training_mgr.state.policy_states
    rollout_state = training_mgr.rollout

    num_eval_policies = policy_states.mmr.elo.shape[0]
    num_custom = len(train_cfg.custom_policy_ids)
    sim_batch_size = train_cfg.num_worlds * train_cfg.num_agents_per_world

    rollout_state = rollouts_reset(rollout_state, policy_states)

    saved_portions = (
        rollout_state.cfg.pbt.self_play_portion,
        rollout_state.cfg.pbt.cross_play_portion,
        rollout_state.cfg.pbt.past_play_portion,
        rollout_state.cfg.pbt.static_play_portion,
    )
    saved_assignments = rollout_state.policy_assignments

    static_assignments = _build_all_pairs_assignments(
        num_eval_policies, train_cfg.custom_policy_ids, sim_batch_size,
        rollout_state.cfg.pbt.num_teams, rollout_state.cfg.pbt.team_size,
        pair_offset=pair_offset)

    rollout_state = rollout_state.update_matchmaking(
        0.0, 0.0, 0.0, 1.0, static_assignments)

    def post_inference_cb(step_idx, obs, preprocessed_obs, policy_out,
                          reorder_state, eval_state):
        return eval_state, None

    def post_step_cb(step_idx, rollout_state, dones, rewards,
                     episode_results, eval_state):
        elos = pbt_update_elo(
            policy_states.get_episode_scores_fn,
            rollout_state.policy_assignments,
            dones, episode_results, eval_state.policy_elos,
            rollout_state.cfg.pbt)
        return rollout_state, eval_state.replace(policy_elos=elos), None

    eval_state = MatchmakeEvalState(
        policy_elos=jnp.full(
            (num_eval_policies + num_custom,), 1500, jnp.float32))

    rollout_state = rollout_state.update(sim_ctrl=eval_sim_ctrl)
    rollout_state = rollouts_reset(rollout_state, policy_states)

    rollout_state, eval_state, _ = rollout_loop(
        rollout_state, policy_states,
        num_steps=num_eval_steps,
        post_inference_cb=post_inference_cb,
        post_step_cb=post_step_cb,
        cb_state=eval_state,
        sample_actions=True,
    )

    rollout_state = rollout_state.update(sim_ctrl=train_sim_ctrl)
    rollout_state = rollouts_reset(rollout_state, policy_states)
    rollout_state = rollout_state.update_matchmaking(
        *saved_portions, saved_assignments)

    new_elos = eval_state.policy_elos

    if 0 <= train_cfg.baseline_policy_id < num_eval_policies:
        baseline_idx = train_cfg.baseline_policy_id
    else:
        baseline_idx = -1
        for i, custom_id in enumerate(train_cfg.custom_policy_ids):
            if custom_id == train_cfg.baseline_policy_id:
                baseline_idx = num_eval_policies + i
                break
        assert baseline_idx != -1

    new_elos = new_elos - new_elos[baseline_idx] + 1500
    new_elos = new_elos[0:num_eval_policies]

    elo_deltas = new_elos - policy_states.mmr.elo

    policy_states = policy_states.update(
        mmr=policy_states.mmr.replace(elo=new_elos))

    return training_mgr.replace(
        rollout=rollout_state,
        state=training_mgr.state.replace(policy_states=policy_states),
    ), elo_deltas


def _update_population_impl(training_mgr: TrainingManager):
    state = training_mgr.state
    state = pbt_cull_update(training_mgr.cfg, state, 1)
    state = pbt_past_update(training_mgr.cfg, state)
    return training_mgr.replace(state=state)


def update_population(training_mgr: TrainingManager, elo_deltas=None):
    """Cull/past population evolution (reference: train.py:568-574).

    Jitted and cached per manager like ``eval_elo`` — an eager call would
    otherwise pay one first-call XLA compile per op of the cull/past
    programs (~110s measured at BASELINE config #4 scale on TPU), and
    repeated in-loop calls reuse the compiled program. ``eval_elo_warmup``
    pre-compiles this too. Wrapping the call in an outer ``jax.jit`` stays
    supported (the inner jit inlines)."""
    return _population_update_fn(training_mgr)(training_mgr)
