"""Offline policy evaluation from checkpoints.

Capability parity with the reference eval layer (reference: eval.py:22-267):
``eval_load_ckpt`` loads policies out of an orbax checkpoint (single policy /
train-only / full population); ``eval_policies`` builds a non-competitive
self-play or competitive all-pairs static-matchmaking rollout config, runs an
AOT-compiled, checkified rollout loop, and streams per-step data to a user
callback. ``MADRONA_LEARN_TPU_FULL_CHECKIFY=1`` enables full NaN/div/index
checks; ``MADRONA_LEARN_TPU_PRINT_LOWERED=1`` dumps the lowered module.
"""

from __future__ import annotations

from os import environ as env_vars
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import random
from jax.experimental import checkify

from .config import EvalConfig
from .policy import Policy
from .rollouts import RolloutConfig, RolloutState, rollout_loop
from .train import _build_all_pairs_assignments
from .train_state import PolicyState, TrainStateManager


def eval_load_ckpt(
    policy: Policy,
    ckpt_path: str,
    train_only: bool = True,
    single_policy: Optional[int] = None,
):
    policy_states, num_train_policies, total_num_policies = (
        TrainStateManager.load_policies(policy, ckpt_path))

    if single_policy is not None:
        policy_states = jax.tree.map(
            lambda x: x[jnp.asarray((single_policy,))], policy_states)
        return policy_states, 1

    if train_only:
        policy_states = jax.tree.map(
            lambda x: x[jnp.arange(num_train_policies)], policy_states)
        return policy_states, num_train_policies

    return policy_states, total_num_policies


def eval_policies(
    dev: Optional[jax.Device],
    eval_cfg: EvalConfig,
    sim_fns: Dict[str, Callable],
    policy: Policy,
    init_sim_ctrl: jax.Array,
    policy_states: PolicyState,
    step_cb: Callable,
):
    if dev is not None:
        with jax.default_device(dev):
            return _eval_policies_impl(
                eval_cfg, sim_fns, policy, init_sim_ctrl, policy_states,
                step_cb)
    return _eval_policies_impl(
        eval_cfg, sim_fns, policy, init_sim_ctrl, policy_states, step_cb)


def _eval_policies_impl(eval_cfg, sim_fns, policy, init_sim_ctrl,
                        policy_states, step_cb):
    checkify_errors = checkify.user_checks
    if env_vars.get("MADRONA_LEARN_TPU_FULL_CHECKIFY") == "1":
        checkify_errors |= (
            checkify.float_checks
            | checkify.nan_checks
            | checkify.div_checks
            | checkify.index_checks
        )

    num_agents_per_world = eval_cfg.team_size * eval_cfg.num_teams
    sim_batch_size = eval_cfg.num_worlds * num_agents_per_world

    if getattr(policy_states, "mmr", None) is not None:
        num_eval_policies = policy_states.mmr.elo.shape[0]
    elif getattr(policy_states, "episode_score", None) is not None:
        num_eval_policies = policy_states.episode_score.mean.shape[0]
    else:
        num_eval_policies = 1

    if eval_cfg.clear_fitness:
        mmr = policy_states.mmr
        if mmr is not None:
            mmr = mmr.replace(elo=mmr.elo.at[:].set(1500))
        episode_score = policy_states.episode_score
        if episode_score is not None:
            episode_score = jax.tree.map(
                lambda x: x.at[:].set(0), episode_score)
        policy_states = policy_states.update(
            mmr=mmr, episode_score=episode_score)

    if num_eval_policies == 1 or not eval_cfg.eval_competitive:
        rollout_cfg = RolloutConfig.setup(
            num_current_policies=num_eval_policies,
            num_past_policies=0,
            num_teams=1,
            team_size=num_agents_per_world,
            sim_batch_size=sim_batch_size,
            actions_cfg=eval_cfg.actions,
            self_play_portion=1.0,
            cross_play_portion=0.0,
            past_play_portion=0.0,
            static_play_portion=0.0,
            reward_gamma=eval_cfg.reward_gamma,
            custom_policy_ids=eval_cfg.custom_policy_ids,
            policy_dtype=eval_cfg.policy_dtype,
        )
        static_play_assignments = None
    else:
        rollout_cfg = RolloutConfig.setup(
            num_current_policies=num_eval_policies,
            num_past_policies=0,
            num_teams=eval_cfg.num_teams,
            team_size=eval_cfg.team_size,
            sim_batch_size=sim_batch_size,
            actions_cfg=eval_cfg.actions,
            self_play_portion=0.0,
            cross_play_portion=0.0,
            past_play_portion=0.0,
            static_play_portion=1.0,
            reward_gamma=eval_cfg.reward_gamma,
            custom_policy_ids=eval_cfg.custom_policy_ids,
            policy_dtype=eval_cfg.policy_dtype,
        )
        static_play_assignments = _build_all_pairs_assignments(
            num_eval_policies, eval_cfg.custom_policy_ids, sim_batch_size,
            eval_cfg.num_teams, eval_cfg.team_size)

    @jax.jit
    def init_rollout_state(sim_ctrl, static_assignments):
        rnn_states = policy.actor_critic.init_recurrent_state(
            rollout_cfg.sim_batch_size)
        return RolloutState.create(
            rollout_cfg=rollout_cfg,
            sim_fns=sim_fns,
            prng_key=random.PRNGKey(0),
            rnn_states=rnn_states,
            init_sim_ctrl=sim_ctrl,
            static_play_assignments=static_assignments,
        )

    rollout_state = init_rollout_state(
        init_sim_ctrl, static_play_assignments)

    def post_inference_cb(step_idx, obs, preprocessed_obs, policy_out,
                          reorder_state, cb_state):
        # Stash per-step policy outputs (in sim order) for the step callback.
        return reorder_state.to_sim(policy_out.copy({"obs": obs})), None

    def post_step_cb(step_idx, rollout_state, dones, rewards,
                     episode_results, cb_state):
        step_data = cb_state.copy({
            "sim_state": rollout_state.sim_state,
            "dones": dones,
            "rewards": rewards,
            "returns": rollout_state.env_returns,
            "episode_results": episode_results,
            "rnn_states": rollout_state.rnn_states,
        })
        sim_state = step_cb(step_data)
        rollout_state = rollout_state.update(sim_state=sim_state)
        return rollout_state, cb_state, None

    def run_loop(rollout_state, policy_states):
        # cb_state starts as an empty FrozenDict; post_inference fills it.
        rollout_state, cb_state, _ = rollout_loop(
            rollout_state, policy_states,
            num_steps=eval_cfg.num_eval_steps,
            post_inference_cb=post_inference_cb,
            post_step_cb=post_step_cb,
            cb_state=_example_cb_state(rollout_state, policy_states),
            sample_actions=not eval_cfg.use_deterministic_policy,
            return_debug=True,
        )
        return rollout_state, policy_states

    def _example_cb_state(rollout_state, policy_states):
        # The carry must have a fixed structure; evaluate the first step's
        # inference output shape to build a zero-filled placeholder.
        def one_inference():
            reorder_state = rollout_state.reorder_state
            chunk_rnn, policy_obs = reorder_state.to_policy(
                (rollout_state.rnn_states, rollout_state.cur_obs))

            if rollout_cfg.pbt.complex_matchmaking:
                state_idxs = reorder_state.to_policy(
                    rollout_state.policy_assignments)[:, 0]
                chunk_states = jax.tree.map(
                    lambda x: x[state_idxs], policy_states)
            else:
                chunk_states = policy_states

            preprocessed = chunk_states.obs_preprocess.preprocess(
                chunk_states.obs_preprocess_state, policy_obs, True)

            @jax.vmap
            def apply(state, key, rnn, obs):
                return state.apply_fn(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    key, rnn, obs, train=False,
                    sample_actions=not eval_cfg.use_deterministic_policy,
                    return_debug=True,
                    method="rollout")

            out, _ = apply(
                chunk_states,
                random.split(random.PRNGKey(0),
                             rollout_cfg.num_policy_chunks),
                chunk_rnn, preprocessed)
            return reorder_state.to_sim(out.copy({"obs": policy_obs}))

        shapes = jax.eval_shape(one_inference)
        return jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    run = jax.jit(
        checkify.checkify(run_loop, errors=checkify_errors),
        donate_argnums=[0, 1])

    lowered = run.lower(rollout_state, policy_states)
    if env_vars.get("MADRONA_LEARN_TPU_PRINT_LOWERED") == "1":
        print(lowered.as_text())
    compiled = lowered.compile()

    err, (rollout_state, policy_states) = compiled(
        rollout_state, policy_states)
    err.throw()

    if eval_cfg.eval_competitive and policy_states.mmr is not None:
        return policy_states.mmr
    if policy_states.episode_score is not None:
        return policy_states.episode_score
    return jnp.zeros((1,))
