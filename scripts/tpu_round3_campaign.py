"""Round-3 TPU measurement campaign, all in ONE process.

The axon tunnel tolerates one process at a time and first contact is
expensive, so every hardware measurement for the round runs sequentially
here: kernel hardware validation (incl. the new fused weight-grad
backward epilogues), LSTM/GRU module benches, the PBT update bench +
vectorized Elo-step micro-bench, and the first-tournament-cycle timing
with and without eval_elo_warmup.

Usage: python scripts/tpu_round3_campaign.py [--skip validate,lstm,...]
Each section prints a '=== <name> ===' header; failures in one section
don't stop the rest.
"""

import argparse
import os
import runpy
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def section(name, fn, skip):
    if name in skip:
        print(f"=== {name} === SKIPPED", flush=True)
        return
    print(f"=== {name} ===", flush=True)
    t0 = time.perf_counter()
    try:
        fn()
        print(f"=== {name} OK ({time.perf_counter() - t0:.0f}s) ===",
              flush=True)
    except SystemExit as e:
        # runpy'd scripts call sys.exit(); rc 0/None is success, anything
        # else a section failure — either way the campaign continues.
        status = "OK" if not e.code else f"FAILED (exit {e.code})"
        print(f"=== {name} {status} ({time.perf_counter() - t0:.0f}s) ===",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"=== {name} FAILED ({time.perf_counter() - t0:.0f}s) ===",
              flush=True)


def run_script(path, argv=()):
    old = sys.argv
    sys.argv = [path, *argv]
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


def tournament_timing():
    """First eval_elo cycle at the pbt_bench scale, warmup vs cold
    (VERDICT r2 item 6: was 103.5s compile-dominated; target < 30s)."""
    import jax.numpy as jnp
    import numpy as np
    import madrona_learn_tpu as mlt
    from madrona_learn_tpu.envs import ToyEnvConfig, make_duel_env
    from madrona_learn_tpu.models import (
        ActorCritic, BackboneShared, DenseLayerCritic,
        DenseLayerDiscreteActor, DictActor, LSTM, MLP,
        RecurrentBackboneEncoder)

    NUM_TRAIN, NUM_PAST = 8, 4
    NUM_WORLDS = 16384
    CH = 256
    dtype = jnp.bfloat16
    actions = {"move": mlt.DiscreteActionsConfig(actions_num_buckets=[5])}
    sim_fns = make_duel_env(ToyEnvConfig(
        num_worlds=NUM_WORLDS, episode_len=32, num_teams=2, team_size=1,
        seed=0, reward_dtype=jnp.float32))
    ac = ActorCritic(
        backbone=BackboneShared(
            prefix=lambda obs, train: jnp.concatenate(
                [obs["time"], obs["acc"]], -1),
            encoder=RecurrentBackboneEncoder(
                net=MLP(num_channels=CH, num_layers=2, dtype=dtype),
                rnn=LSTM(num_hidden_channels=CH, num_layers=1, dtype=dtype,
                         use_pallas=True))),
        actor=DictActor(heads={"move": DenseLayerDiscreteActor(
            cfg=actions["move"], dtype=dtype)}),
        critic=DenseLayerCritic(dtype=dtype))
    policy = mlt.Policy(
        actor_critic=ac,
        obs_preprocess=mlt.ObservationsCaster.create(dtype=dtype),
        get_episode_scores=lambda er: (
            jnp.where(er[0] == 0, 1.0, jnp.where(er[0] == 1, 0.0, 0.5)),
            jnp.where(er[0] == 0, 0.0, jnp.where(er[0] == 1, 1.0, 0.5))))
    cfg = mlt.TrainConfig(
        num_worlds=NUM_WORLDS, num_agents_per_world=2, num_updates=10,
        actions=actions, steps_per_update=32, num_bptt_chunks=2,
        lr=1e-3, gamma=0.99, gae_lambda=0.95, seed=0, metrics_buffer_size=1,
        algo=mlt.PPOConfig(
            num_epochs=1, minibatch_size=2560, clip_coef=0.2,
            value_loss_coef=0.5, entropy_coef=0.01, max_grad_norm=0.5),
        pbt=mlt.PBTConfig(
            num_teams=2, team_size=1, num_train_policies=NUM_TRAIN,
            num_past_policies=NUM_PAST, self_play_portion=0.25,
            cross_play_portion=0.5, past_play_portion=0.25),
        dreamer_v3_critic=False, compute_dtype=dtype,
        use_pallas_gae=True)
    mgr = mlt.init_training(
        None, cfg, sim_fns, policy, init_sim_ctrl=jnp.zeros((1,), jnp.int32),
        init_on_cpu=True)

    eval_kwargs = dict(
        num_eval_steps=32,
        eval_sim_ctrl=jnp.zeros((1,), jnp.int32),
        train_sim_ctrl=jnp.zeros((1,), jnp.int32))

    # Background warmup overlapping the update-step compile + updates.
    t_warm0 = time.perf_counter()
    thread = mlt.eval_elo_warmup(mgr, **eval_kwargs)

    update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)
    t0 = time.perf_counter()
    mgr = update(mgr)
    jax.device_get(mgr.metrics.metrics["Loss"].mean)
    print(f"update-step compile+first-run {time.perf_counter() - t0:.1f}s",
          flush=True)
    for _ in range(3):
        mgr = update(mgr)
    jax.device_get(mgr.metrics.metrics["Loss"].mean)

    thread.join()
    warm_wall = time.perf_counter() - t_warm0
    print(f"tournament warmup thread joined {warm_wall:.1f}s after start",
          flush=True)

    t0 = time.perf_counter()
    mgr, deltas = mlt.eval_elo(mgr, **eval_kwargs)
    mgr = mlt.update_population(mgr)
    jax.device_get(mgr.state.policy_states.mmr.elo)
    first_cycle = time.perf_counter() - t0
    print(f"first Elo tournament + evolve cycle (warmed): "
          f"{first_cycle:.1f}s", flush=True)

    t0 = time.perf_counter()
    mgr, deltas = mlt.eval_elo(mgr, **eval_kwargs)
    mgr = mlt.update_population(mgr)
    jax.device_get(mgr.state.policy_states.mmr.elo)
    print(f"second cycle: {time.perf_counter() - t0:.1f}s", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip", default="",
                        help="comma list: validate,lstm,gru,pbt,tournament,"
                             "profile,bench")
    args = parser.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    root = os.path.join(os.path.dirname(__file__), "..")
    section("validate", lambda: run_script(
        os.path.join(root, "scripts/validate_tpu.py")), skip)
    section("lstm", lambda: run_script(
        os.path.join(root, "benchmarks/lstm_bench.py")), skip)
    section("gru", lambda: run_script(
        os.path.join(root, "benchmarks/gru_bench.py")), skip)
    section("pbt", lambda: run_script(
        os.path.join(root, "benchmarks/pbt_bench.py")), skip)
    section("tournament", tournament_timing, skip)
    section("profile", lambda: run_script(
        os.path.join(root, "benchmarks/profile_update.py")), skip)
    section("bench", lambda: run_script(
        os.path.join(root, "bench.py")), skip)


if __name__ == "__main__":
    main()
