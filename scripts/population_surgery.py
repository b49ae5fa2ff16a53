"""Population-surgery CLI over training checkpoints.

Subcommands (all operate on orbax checkpoints written by
``TrainingManager.save_ckpt`` — reference flow: train_state.py:145-225):

- ``inspect <ckpt>``: population sizes, fitness (Elo / episode-score)
  summary, parameter tree shape summary, next update index.
- ``slice <src> <dst> --train i,j,... --past k,...``: re-slice a population
  into a new train/past split (wraps ``TrainStateManager.slice_checkpoint``).
- ``best <src> <dst> [--metric elo|score]``: single-policy checkpoint of the
  fittest train policy (a convenience slice for deployment/eval).

Usage:
    python scripts/population_surgery.py inspect ckpts/100
    python scripts/population_surgery.py slice ckpts/100 out --train 0,3 --past 1
    python scripts/population_surgery.py best ckpts/100 out
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _load(path):
    from madrona_learn_tpu.train_state import TrainStateManager

    # Host-side numpy restore: surgery must work on machines without the
    # saving run's device topology.
    return TrainStateManager.restore_host(path)


def cmd_inspect(args):
    import jax

    ckpt = _load(args.ckpt)
    ps = ckpt["policy_states"]
    ts = ckpt["train_states"]

    num_train = np.asarray(
        jax.tree.leaves(ts["update_prng_key"])[0]).shape[0]
    leaves = jax.tree.leaves(ps["params"])
    total = leaves[0].shape[0] if leaves else 0
    n_params = sum(int(np.prod(l.shape[1:])) for l in leaves)

    print(f"checkpoint: {args.ckpt}")
    print(f"next_update: {int(np.asarray(ckpt['next_update']))}")
    print(f"policies: {total} total = {num_train} train"
          f" + {total - num_train} past")
    print(f"params/policy: {n_params:,} across {len(leaves)} tensors")

    mmr = ps.get("mmr")
    if mmr is not None and mmr.get("elo") is not None:
        elo = np.asarray(mmr["elo"], np.float64)
        order = np.argsort(-elo)
        print("elo (desc): " + ", ".join(
            f"p{i}={elo[i]:.1f}" for i in order))
    score = ps.get("episode_score")
    if score is not None and score.get("mean") is not None:
        mean = np.asarray(score["mean"], np.float64)
        n = np.asarray(score["N"])
        print("episode score: " + ", ".join(
            f"p{i}={mean[i]:.3f}(n={int(n[i])})" for i in range(len(mean))))

    hp = ts.get("hyper_params")
    if isinstance(hp, dict):
        for k, v in hp.items():
            if v is not None:
                arr = np.asarray(v, np.float64).reshape(num_train, -1)
                print(f"hyperparam {k}: "
                      + ", ".join(f"{x:.3e}" for x in arr[:, 0]))


def _parse_ids(spec):
    return np.asarray([int(x) for x in spec.split(",") if x != ""], np.int64)


def cmd_slice(args):
    from madrona_learn_tpu.train_state import TrainStateManager

    train_sel = _parse_ids(args.train)
    past_sel = _parse_ids(args.past) if args.past else np.asarray([], np.int64)
    TrainStateManager.slice_checkpoint(
        args.src, args.dst, train_select=train_sel, past_select=past_sel)
    print(f"sliced {args.src} -> {args.dst}: train={train_sel.tolist()} "
          f"past={past_sel.tolist()}")


def cmd_best(args):
    import jax

    from madrona_learn_tpu.train_state import TrainStateManager

    ckpt = _load(args.src)
    ps = ckpt["policy_states"]
    num_train = np.asarray(jax.tree.leaves(
        ckpt["train_states"]["update_prng_key"])[0]).shape[0]

    mmr = ps.get("mmr")
    score = ps.get("episode_score")
    has_elo = mmr is not None and mmr.get("elo") is not None
    has_score = score is not None and score.get("mean") is not None
    if args.metric == "elo" and not has_elo:
        raise SystemExit("checkpoint has no Elo fitness (--metric elo)")
    if args.metric == "score" and not has_score:
        raise SystemExit(
            "checkpoint has no episode-score fitness (--metric score)")
    if (args.metric == "elo") or (args.metric == "auto" and has_elo):
        fitness = np.asarray(mmr["elo"], np.float64)[:num_train]
    elif (args.metric == "score") or (args.metric == "auto" and has_score):
        fitness = np.asarray(score["mean"], np.float64)[:num_train]
    else:
        raise SystemExit("checkpoint has no Elo or episode-score fitness")

    best = int(np.argmax(fitness))
    TrainStateManager.slice_checkpoint(
        args.src, args.dst,
        train_select=np.asarray([best]), past_select=np.asarray([], np.int64))
    print(f"best train policy: p{best} (fitness {fitness[best]:.3f}) "
          f"-> {args.dst}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("inspect")
    p.add_argument("ckpt")
    p.set_defaults(fn=cmd_inspect)

    p = sub.add_parser("slice")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--train", required=True,
                   help="comma-separated train policy ids to keep")
    p.add_argument("--past", default="",
                   help="comma-separated policy ids for the new past set")
    p.set_defaults(fn=cmd_slice)

    p = sub.add_parser("best")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--metric", choices=["auto", "elo", "score"],
                   default="auto")
    p.set_defaults(fn=cmd_best)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
