"""Communication budget of the sharded update step (VERDICT r3 item 1).

Compiles the FULL sharded PPO/PBT update step at a BASELINE config-#5-like
shape on a virtual CPU mesh, walks the optimized (post-SPMD-partitioning)
HLO, and reports every cross-device collective: kind, tensor shape, bytes,
mesh axis, program phase (from named-scope op metadata), and per-update
execution count (loop multiplicity). It then combines the per-device byte
totals with a measured single-chip update time and the v5e ICI bandwidth
into a predicted 1-chip -> 2-host (v5e-16) weak-scaling efficiency
(the ">=85%" target in BASELINE.json:5, which no real pod is available
here to measure directly).

Methodology
-----------
- The compiled mesh defaults to (data=4, policy=2) on 8 virtual CPU
  devices with PER-DEVICE shard sizes equal to the weak-scaled v5e-16
  deployment of config #5 (64k envs x 2 agents, 32-policy PBT ->
  16k agents + 16 policies per chip at data=8 x policy=2). Collective
  traffic is then EXTRAPOLATED to the target mesh with standard ring
  formulas: per-device shard bytes stay constant along the weak-scaled
  ``data`` axis, global bytes stay constant along ``policy``.
- Ring-algorithm per-device traffic per execution:
    all-gather:        (G-1)/G * global_bytes
    all-reduce (psum): 2(G-1)/G * global_bytes
    reduce-scatter:    (G-1)/G * global_bytes
    all-to-all:        (G-1)/G * global_bytes
    collective-permute: shard_bytes (each device sends its block once)
- Loop multiplicity comes from the static loop structure (the HLO text
  does not expose trip counts): a collective whose scope path crosses two
  nested while bodies inside "Collect Rollouts" runs steps_per_update
  times (bptt-chunk scan x step scan), one -> num_bptt_chunks; inside
  "Learn", two -> num_epochs * num_minibatches, one -> num_epochs.
- Efficiency model (deliberately conservative -- ZERO compute/comm
  overlap): eff = t_compute / (t_compute + t_ici) where t_compute is the
  measured single-chip update time at the same per-device batch and
  t_ici = per-device ICI bytes / ICI bandwidth. v5e ICI: 1600 Gbit/s
  per chip aggregate (Google Cloud v5e spec); a one-axis bidirectional
  ring sustains ~half of it, so the default assumes 100 GB/s with the
  bytes reported so any other assumption is one division away.
  A v5e-16 (4x4) slice spans 2 hosts INSIDE one ICI domain -- DCN is not
  on the path, which is why the target is reachable at all.

Run:  python scripts/comm_budget.py [--worlds N] [--out artifacts/...]
Smoke: python scripts/comm_budget.py --worlds 256 (fast CI-size compile)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
}

COLLECTIVE_KINDS = (
    "all-gather", "all-reduce", "reduce-scatter", "all-to-all",
    "collective-permute",
)

_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")


def shape_bytes(shape_text: str) -> int:
    """Total bytes of an HLO result type (handles tuples)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def parse_replica_groups(line: str, num_devices: int):
    """Groups of device ids from either HLO replica_groups syntax."""
    m = re.search(r"replica_groups=\{\{([^}]*(?:\},\{[^}]*)*)\}\}", line)
    if m:
        return [frozenset(int(x) for x in grp.split(",") if x)
                for grp in m.group(1).split("},{")]
    # Iota form: [G,N]<=[d0,d1,...]T(p0,p1,...)
    m = re.search(
        r"replica_groups=\[(\d+),(\d+)\]<=\[([0-9,]+)\](?:T\(([0-9,]+)\))?",
        line)
    if m:
        g, n = int(m.group(1)), int(m.group(2))
        dims = [int(x) for x in m.group(3).split(",")]
        ids = np.arange(int(np.prod(dims))).reshape(dims)
        if m.group(4):
            perm = [int(x) for x in m.group(4).split(",")]
            ids = ids.transpose(perm)
        ids = ids.reshape(g, n)
        return [frozenset(int(x) for x in row) for row in ids]
    return None


def parse_permute_pairs(line: str):
    m = re.search(r"source_target_pairs=\{([^a-z]*?)\}, ", line)
    if not m:
        return None
    pairs = re.findall(r"\{(\d+),(\d+)\}", m.group(1))
    return [(int(a), int(b)) for a, b in pairs]


def mesh_axis_groups(data: int, policy: int, model: int = 1):
    """Device-id groups per mesh axis (mirrors parallel.mesh.make_mesh's
    row-major grid: id = (d * policy + p) * model + m)."""
    grid = np.arange(data * policy * model).reshape(data, policy, model)
    groups = {}
    groups["data"] = [frozenset(grid[:, p, m].tolist())
                      for p in range(policy) for m in range(model)]
    groups["policy"] = [frozenset(grid[d, :, m].tolist())
                        for d in range(data) for m in range(model)]
    groups["model"] = [frozenset(grid[d, p, :].tolist())
                       for d in range(data) for p in range(policy)]
    groups["full-mesh"] = [frozenset(grid.reshape(-1).tolist())]
    return groups


def classify_axis(groups, axis_groups):
    """Name the mesh axis whose groups match; 'mixed' otherwise."""
    gset = set(groups)
    for name, ref in axis_groups.items():
        # Singleton groups (size-1 mesh axes) are no-op collectives.
        if all(len(g) == 1 for g in ref):
            continue
        if gset <= set(ref):
            return name
    return "mixed"


def classify_permute_axis(pairs, axis_groups):
    for name, ref in axis_groups.items():
        if all(len(g) == 1 for g in ref):
            continue
        lookup = {}
        for g in ref:
            for dev in g:
                lookup[dev] = g
        if all(lookup.get(a) is lookup.get(b) for a, b in pairs):
            return name
    return "mixed"


def phase_of(op_name: str) -> str:
    for phase in ("Collect Rollouts", "Update Observations Stats",
                  "Learn", "Set New Policy States"):
        if phase in op_name:
            return phase
    return "other"


def loop_multiplicity(op_name: str, phase: str, cfg_static) -> int:
    whiles = op_name.count("while/body")
    c = cfg_static
    if phase == "Collect Rollouts":
        if whiles >= 2:
            return c["steps_per_update"]
        if whiles == 1:
            return c["num_bptt_chunks"]
        return 1
    if phase == "Learn":
        if whiles >= 2:
            return c["num_epochs"] * c["num_minibatches"]
        if whiles == 1:
            return c["num_epochs"]
        return 1
    return 1


def ring_traffic_per_device(kind: str, global_bytes: int, group_size: int,
                            shard_bytes: int) -> float:
    g = group_size
    if g <= 1:
        return 0.0
    if kind == "all-gather":
        return global_bytes * (g - 1) / g
    if kind == "all-reduce":
        return 2 * global_bytes * (g - 1) / g
    if kind in ("reduce-scatter", "all-to-all"):
        return global_bytes * (g - 1) / g
    if kind == "collective-permute":
        return shard_bytes
    return global_bytes


def parse_collectives(hlo: str, data: int, policy: int, static_loops):
    """Every collective in the optimized HLO text as an analysis row.

    ``static_loops`` supplies the loop trip counts the HLO text does not
    expose (see ``loop_multiplicity``): a dict with steps_per_update,
    num_bptt_chunks, num_epochs, num_minibatches.
    """
    num_devices = data * policy
    axis_groups = mesh_axis_groups(data, policy)

    rows = []
    for line in hlo.splitlines():
        m = re.match(
            r"\s*%?[\w.-]+ = ((?:\([^)]*\)|\S+)) (" +
            "|".join(COLLECTIVE_KINDS) + r")\(", line)
        if not m:
            continue
        shape_text, kind = m.group(1), m.group(2)
        # all-*-start/done variants are matched by prefix; skip the *-done
        # halves (the start row carries the shape).
        gbytes_shard_or_global = shape_bytes(shape_text)
        op_name_m = re.search(r'op_name="([^"]*)"', line)
        op_name = op_name_m.group(1) if op_name_m else ""
        phase = phase_of(op_name)
        mult = loop_multiplicity(op_name, phase, static_loops)

        if kind == "collective-permute":
            pairs = parse_permute_pairs(line) or []
            axis = classify_permute_axis(pairs, axis_groups)
            group_size = num_devices  # unused for permute traffic
            shard_bytes = gbytes_shard_or_global  # result = one shard
            global_bytes = shard_bytes * max(len(pairs), 1)
        else:
            groups = parse_replica_groups(line, num_devices)
            if not groups:
                axis, group_size = "unknown", num_devices
            else:
                axis = classify_axis(groups, axis_groups)
                group_size = len(next(iter(groups)))
            if kind == "all-gather":
                # result type is the GLOBAL (gathered) shape
                global_bytes = gbytes_shard_or_global
                shard_bytes = global_bytes // max(group_size, 1)
            elif kind == "reduce-scatter":
                # result is the per-shard shape
                shard_bytes = gbytes_shard_or_global
                global_bytes = shard_bytes * group_size
            else:  # all-reduce / all-to-all: result = input = global
                global_bytes = gbytes_shard_or_global
                shard_bytes = global_bytes // max(group_size, 1)

        traffic = ring_traffic_per_device(
            kind, global_bytes, group_size, shard_bytes)
        rows.append({
            "kind": kind, "shape": shape_text, "axis": axis,
            "phase": phase, "group_size": group_size,
            "global_bytes": global_bytes, "shard_bytes": shard_bytes,
            "mult": mult,
            "traffic_per_device_bytes": traffic * mult,
            "op_name": op_name[:160],
        })
    return rows


def build_manager(args):
    import madrona_learn_tpu as mlt
    from madrona_learn_tpu.envs import ToyEnvConfig, make_duel_env
    from madrona_learn_tpu.models import (
        ActorCritic, BackboneShared, DenseLayerCritic,
        DenseLayerDiscreteActor, DictActor, LSTM, MLP,
        RecurrentBackboneEncoder)
    from madrona_learn_tpu.parallel import make_mesh, shard_training_manager

    dtype = jnp.float32
    actions = {"move": mlt.DiscreteActionsConfig(actions_num_buckets=[5])}
    sim_fns = make_duel_env(ToyEnvConfig(
        num_worlds=args.worlds, episode_len=32, num_teams=2, team_size=1,
        seed=0, reward_dtype=jnp.float32))
    ac = ActorCritic(
        backbone=BackboneShared(
            prefix=lambda obs, train: jnp.concatenate(
                [obs["time"], obs["acc"]], axis=-1),
            encoder=RecurrentBackboneEncoder(
                net=MLP(num_channels=args.channels, num_layers=2,
                        dtype=dtype),
                rnn=LSTM(num_hidden_channels=args.channels, num_layers=1,
                         dtype=dtype, use_pallas=True))),
        actor=DictActor(heads={"move": DenseLayerDiscreteActor(
            cfg=actions["move"], dtype=dtype)}),
        critic=DenseLayerCritic(dtype=dtype))
    policy = mlt.Policy(
        actor_critic=ac,
        obs_preprocess=mlt.ObservationsCaster.create(dtype=dtype),
        get_episode_scores=lambda er: (
            jnp.where(er[0] == 0, 1.0, jnp.where(er[0] == 1, 0.0, 0.5)),
            jnp.where(er[0] == 0, 0.0, jnp.where(er[0] == 1, 1.0, 0.5))))

    mesh_cfg = mlt.MeshConfig(data=args.data, policy=args.policy,
                              zero_opt_state=args.zero_opt_state)
    sim_batch = args.worlds * 2
    train_agents = int(sim_batch * 0.625) // args.train_policies
    num_minibatches = max(args.num_minibatches, 1)
    seqs_per_policy = train_agents * 2  # num_bptt_chunks = 2
    minibatch_size = seqs_per_policy // num_minibatches
    cfg = mlt.TrainConfig(
        num_worlds=args.worlds, num_agents_per_world=2, num_updates=1,
        actions=actions, steps_per_update=args.steps, num_bptt_chunks=2,
        lr=1e-3, gamma=0.99, gae_lambda=0.95, seed=0, metrics_buffer_size=1,
        algo=mlt.PPOConfig(
            num_epochs=args.epochs, minibatch_size=minibatch_size,
            clip_coef=0.2, value_loss_coef=0.5, entropy_coef=0.01,
            max_grad_norm=0.5),
        pbt=mlt.PBTConfig(
            num_teams=2, team_size=1,
            num_train_policies=args.train_policies,
            num_past_policies=args.past_policies,
            self_play_portion=0.25, cross_play_portion=0.5,
            past_play_portion=0.25),
        dreamer_v3_critic=False, compute_dtype=dtype, mesh=mesh_cfg,
        use_pallas_gae=True)
    mgr = mlt.init_training(None, cfg, sim_fns, policy,
                            jnp.zeros((1,), jnp.int32))
    mesh = make_mesh(mesh_cfg)
    mgr = shard_training_manager(mgr, mesh)
    static = {
        "steps_per_update": cfg.steps_per_update,
        "num_bptt_chunks": cfg.num_bptt_chunks,
        "num_epochs": cfg.algo.num_epochs,
        "num_minibatches": seqs_per_policy // minibatch_size,
    }
    return mgr, static


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worlds", type=int, default=32768,
                   help="global sim worlds (x2 agents); default gives the "
                        "weak-scaled config-#5 per-device batch (16k "
                        "agents/chip) on the compiled data=4 mesh")
    p.add_argument("--channels", type=int, default=256)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--num-minibatches", type=int, default=4)
    p.add_argument("--train-policies", type=int, default=32)
    p.add_argument("--past-policies", type=int, default=8)
    p.add_argument("--data", type=int, default=4)
    p.add_argument("--policy", type=int, default=2)
    p.add_argument("--target-data", type=int, default=8,
                   help="data axis of the predicted v5e-16 deployment")
    p.add_argument("--target-policy", type=int, default=2)
    p.add_argument("--ici-gbps", type=float, default=100.0,
                   help="assumed per-chip ICI bandwidth, GB/s (v5e spec: "
                        "1600 Gbit/s aggregate; one-axis ring ~ half)")
    p.add_argument("--single-chip-ms", type=float, default=124.0,
                   help="measured per-chip update time at the same "
                        "per-device batch (default: round-3 config-#4 PBT "
                        "measurement 248 ms at 32k agents -> ~124 ms at "
                        "the 16k-agent per-chip share)")
    p.add_argument("--alt-single-chip-ms", type=float, default=None,
                   help="second measured compute time for the sensitivity "
                        "table (e.g. a fresh config-#4 measurement)")
    p.add_argument("--zero-opt-state", action="store_true",
                   help="enable ZeRO optimizer-state sharding "
                        "(MeshConfig.zero_opt_state) to measure its "
                        "communication delta: the gradient pmean becomes "
                        "reduce_scatter + update all_gather — same bytes "
                        "by construction (docs/scaling.md)")
    p.add_argument("--out", type=str, default="artifacts/COMM_BUDGET.json")
    p.add_argument("--hlo-out", type=str, default=None,
                   help="also dump the optimized HLO text here")
    args = p.parse_args()

    mgr, static = build_manager(args)
    update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)
    print("lowering + compiling the sharded update step ...",
          file=sys.stderr)
    compiled = update.lower(mgr).compile()
    hlo = compiled.as_text()
    if args.hlo_out:
        with open(args.hlo_out, "w") as f:
            f.write(hlo)

    rows = parse_collectives(hlo, args.data, args.policy, static)

    # ---- aggregate --------------------------------------------------------
    agg = defaultdict(lambda: {"count": 0, "execs": 0, "bytes": 0.0,
                               "global_bytes_max": 0})
    for r in rows:
        key = (r["phase"], r["kind"], r["axis"])
        a = agg[key]
        a["count"] += 1
        a["execs"] += r["mult"]
        a["bytes"] += r["traffic_per_device_bytes"]
        a["global_bytes_max"] = max(a["global_bytes_max"], r["global_bytes"])

    # ---- extrapolate to the target mesh ------------------------------------
    # data axis is weak-scaled (per-device shard constant); policy axis
    # holds the global population constant.
    tD, tP = args.target_data, args.target_policy

    def extrapolate(r):
        kind, axis, phase = r["kind"], r["axis"], r["phase"]
        if axis == "data":
            g = tD
            param_sized = kind == "all-reduce" or (
                args.zero_opt_state
                and kind in ("all-gather", "reduce-scatter"))
            if param_sized and phase == "Learn":
                # Learn-phase psums reduce param-sized tensors (gradients,
                # normalizer stats): global size is FIXED, independent of
                # the data axis. With --zero-opt-state the gradient pmean
                # lowers to reduce-scatter + update all-gather instead —
                # the same fixed param-sized payloads (the stratified
                # store entry is collective-free, so no Learn-phase
                # data-axis gather carries batch in that mode).
                glob = r["global_bytes"]
                shard = glob // max(g, 1)
            else:
                # Everything else over data carries (pieces of) the
                # batch, which weak-scales with the axis: per-device
                # share constant.
                shard = r["shard_bytes"]
                glob = shard * g
        elif axis == "policy":
            g = tP
            glob = r["global_bytes"]            # fixed population
            shard = glob // max(g, 1)
        elif axis == "full-mesh":
            g = tD * tP
            # data-sharded dimension weak-scales, policy part fixed
            shard = r["shard_bytes"]
            glob = shard * g
        else:
            g = r["group_size"]
            shard, glob = r["shard_bytes"], r["global_bytes"]
        return ring_traffic_per_device(kind, glob, g, shard) * r["mult"]

    target_bytes_by_phase = defaultdict(float)
    compiled_bytes_by_phase = defaultdict(float)
    for r in rows:
        compiled_bytes_by_phase[r["phase"]] += r["traffic_per_device_bytes"]
        target_bytes_by_phase[r["phase"]] += extrapolate(r)

    total_target = sum(target_bytes_by_phase.values())
    t_ici_ms = total_target / (args.ici_gbps * 1e9) * 1e3
    t_compute = args.single_chip_ms
    efficiency = t_compute / (t_compute + t_ici_ms)

    # ---- sensitivity of the prediction (VERDICT r4 item 3) -----------------
    # One derived number defends the >=85% target; show how far each
    # assumption can degrade before the conclusion flips. Exposed comm
    # time under overlap fraction o: t_ici * (1 - o); efficiency =
    # t_c / (t_c + exposed). Break-even bandwidth for 85%:
    # (1 - o) * bytes / (t_c * (1/0.85 - 1)).
    compute_times = [t_compute]
    if args.alt_single_chip_ms:
        compute_times.append(args.alt_single_chip_ms)
    sensitivity = []
    for tc in compute_times:
        for bw in (50.0, 100.0, 200.0):
            for overlap in (0.0, 0.5):
                exposed_ms = total_target / (bw * 1e9) * 1e3 * (1 - overlap)
                eff = tc / (tc + exposed_ms)
                sensitivity.append({
                    "single_chip_ms": tc, "ici_gbps": bw,
                    "overlap": overlap,
                    "exposed_comm_ms": round(exposed_ms, 4),
                    "efficiency": round(eff, 4),
                    "meets_85pct": bool(eff >= 0.85),
                })
    headroom = 1.0 / 0.85 - 1.0  # comm budget as a fraction of compute
    break_even = [
        {
            "single_chip_ms": tc, "overlap": overlap,
            # Minimum ICI bandwidth (GB/s) at which efficiency == 0.85.
            "break_even_ici_gbps": round(
                (1 - overlap) * total_target / (tc * 1e-3 * headroom) / 1e9,
                3),
        }
        for tc in compute_times for overlap in (0.0, 0.5)
    ]

    result = {
        "compiled_mesh": {"data": args.data, "policy": args.policy},
        "target_mesh": {"data": tD, "policy": tP,
                        "hardware": "v5e-16 (4x4 slice, 2 hosts, one ICI "
                                    "domain)"},
        "config": {
            "worlds": args.worlds, "agents": args.worlds * 2,
            "channels": args.channels, "steps_per_update": args.steps,
            "train_policies": args.train_policies,
            "past_policies": args.past_policies,
            **static,
        },
        "per_device_traffic_bytes_per_update": {
            "compiled_mesh": dict(compiled_bytes_by_phase),
            "target_mesh": dict(target_bytes_by_phase),
            "target_total": total_target,
        },
        "table": [
            {
                "phase": k[0], "kind": k[1], "axis": k[2],
                "sites": v["count"], "execs_per_update": v["execs"],
                "per_device_bytes_per_update": v["bytes"],
                "largest_global_tensor_bytes": v["global_bytes_max"],
            }
            for k, v in sorted(agg.items(),
                               key=lambda kv: -kv[1]["bytes"])
        ],
        "prediction": {
            "assumptions": {
                "ici_gbps": args.ici_gbps,
                "single_chip_update_ms": t_compute,
                "overlap": "none (conservative)",
            },
            "t_ici_ms": round(t_ici_ms, 4),
            "predicted_scaling_efficiency": round(efficiency, 4),
            "meets_85pct_target": bool(efficiency >= 0.85),
        },
        "sensitivity": sensitivity,
        "break_even_bandwidth_for_85pct": break_even,
        "top_sites": sorted(
            rows, key=lambda r: -r["traffic_per_device_bytes"])[:20],
    }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)

    print(json.dumps({
        "per_device_MB_per_update_target_mesh": round(total_target / 1e6, 3),
        "by_phase_MB": {k: round(v / 1e6, 3)
                        for k, v in target_bytes_by_phase.items()},
        "t_ici_ms": round(t_ici_ms, 4),
        "predicted_scaling_efficiency": round(efficiency, 4),
        "out": args.out,
    }))
    print("\nsensitivity (efficiency @ ici_gbps x overlap, "
          "per compute time):", file=sys.stderr)
    for tc in compute_times:
        rows_tc = [s for s in sensitivity if s["single_chip_ms"] == tc]
        cells = "  ".join(
            f"{s['ici_gbps']:.0f}GB/s,ov={s['overlap']:.0%}:"
            f"{s['efficiency']:.4f}{'' if s['meets_85pct'] else ' (<85%!)'}"
            for s in rows_tc)
        print(f"  t_c={tc:.1f}ms  {cells}", file=sys.stderr)
    for b in break_even:
        print(f"  break-even BW for 85% @ t_c={b['single_chip_ms']:.1f}ms, "
              f"overlap={b['overlap']:.0%}: "
              f"{b['break_even_ici_gbps']} GB/s", file=sys.stderr)


if __name__ == "__main__":
    main()
