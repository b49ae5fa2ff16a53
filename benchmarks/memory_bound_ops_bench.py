"""Bandwidth check: advantage z-score and the sim<->policy reorder gathers.

The north star names Pallas kernels for "advantage normalization and
per-agent gather/scatter of trajectory slots" (BASELINE.json). Both ops are
single-pass memory-bound; a custom kernel can only help if XLA leaves HBM
bandwidth on the table. This harness measures achieved GB/s for each
against the chip's peak (v5e: ~819 GB/s) so the no-kernel decision is a
recorded measurement, not an assumption (same standard as the
grouped-matmul and flash-attention verdicts in docs/kernels.md).

- ``zscore``: z-score of a [num_seqs, T] advantage tensor
  (ops/gae.py:zscore_data) — 1 read + 1 write + two reductions.
- ``reorder_roundtrip``: the rollout loop's per-step sim-order ->
  policy-chunk gather of the rnn state ([N, H] x2) and its inverse, at
  the PBT bench shape — the pair every rollout step pays.

Timing is in-program (fori_loop chaining): per-dispatch tunnel latency
(~2 ms) dwarfs single memory-bound ops, so host-loop timing measures the
dispatch path instead of the op.

Run: python benchmarks/memory_bound_ops_bench.py [--iters 20]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

PEAK_GBPS = {"tpu": 819.0}  # v5e HBM


def timed_inner(fn, x, n):
    """Per-iteration time of ``fn`` chained n times INSIDE one jit.

    Per-dispatch tunnel latency (~2 ms on this box) dwarfs single
    memory-bound ops, so host-side loops measure the dispatch path, not
    the op; a fori_loop with a data dependency measures the op itself.
    """
    from jax import lax

    run = jax.jit(lambda v: lax.fori_loop(0, n, lambda i, w: fn(w), v))
    out = run(x)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = run(x)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    from madrona_learn_tpu.ops.gae import zscore_data
    from madrona_learn_tpu.ops.reorder import compute_reorder_chunks
    from madrona_learn_tpu.rollouts import PolicyBatchReorderState

    backend = jax.default_backend()
    peak = PEAK_GBPS.get(backend)
    results = {"backend": backend, "peak_gbps": peak}
    key = jax.random.PRNGKey(0)

    # -- zscore ---------------------------------------------------------------
    num_seqs, T = 32768, 16
    adv = jax.random.normal(key, (num_seqs, T), jnp.float32)
    dt = timed_inner(zscore_data, adv, args.iters)
    travel = 2 * adv.size * 4  # read + write, fp32
    results["zscore_ms"] = round(dt * 1e3, 4)
    results["zscore_gbps"] = round(travel / dt / 1e9, 1)

    # -- reorder gathers at the PBT bench shape -------------------------------
    N, H, P, C = 32768, 256, 12, 256
    B = -(-N // C) + P - 1
    assignments = jax.random.randint(key, (N, 1), 0, P, jnp.int32)
    to_policy_idxs, to_sim_idxs = jax.jit(
        lambda a: compute_reorder_chunks(a[:, 0], P, C, B))(assignments)
    state = PolicyBatchReorderState(
        to_policy_idxs=to_policy_idxs, to_sim_idxs=to_sim_idxs,
        policy_dims=(B, C),
        sim_dims=(N,),
    )
    rnn = (jax.random.normal(key, (N, H), jnp.bfloat16),
           jax.random.normal(key, (N, H), jnp.bfloat16))

    # Round trip to_policy∘to_sim keeps the chained value's shape stable
    # (the two gathers are what the rollout loop pays every step).
    chunked = state.to_policy(rnn)
    out_elems = sum(x.size for x in jax.tree.leaves(chunked))

    def roundtrip(d):
        return state.to_sim(state.to_policy(d))

    dt = timed_inner(roundtrip, rnn, args.iters)
    travel = (2 * (2 * N * H) + 2 * out_elems) * 2  # both gathers, bf16
    results["reorder_roundtrip_ms"] = round(dt * 1e3, 4)
    results["reorder_roundtrip_gbps"] = round(travel / dt / 1e9, 1)

    if peak:
        for k in ("zscore", "reorder_roundtrip"):
            results[k + "_pct_peak"] = round(
                100 * results[k + "_gbps"] / peak, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
