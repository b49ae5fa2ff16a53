"""One-process TPU bench batch: infer bench (new chunk default), PBT bench,
and the LSTM scan-unroll sweep. Single process so the tunnel lease is
acquired once; each section prints as it completes.

Run: python scripts/tpu_round2_benches.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def section(name):
    print(f"=== {name} ===", flush=True)


def run_infer_bench():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "infer_bench", "benchmarks/infer_bench.py")
    ib = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ib)

    old_argv = sys.argv
    sys.argv = ["infer_bench.py", "--steps", "200"]
    try:
        ib.main()
    finally:
        sys.argv = old_argv


def run_pbt_bench():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pbt_bench", "benchmarks/pbt_bench.py")
    pb = importlib.util.module_from_spec(spec)
    old_argv = sys.argv
    sys.argv = ["pbt_bench.py"]
    try:
        spec.loader.exec_module(pb)  # flat script: import runs the bench
    finally:
        sys.argv = old_argv


def run_unroll_sweep():
    import bench

    for unroll in (1, 2, 4):
        bench.LSTM_UNROLL = unroll
        dtype = jnp.bfloat16
        mgr = bench.build_manager(dtype)
        update = jax.jit(lambda m: m.update_iter()).lower(mgr).compile()
        m = update(mgr)
        jax.device_get(m.metrics.metrics["Loss"].mean)
        t0 = time.perf_counter()
        for _ in range(5):
            m = update(m)
        jax.device_get(m.metrics.metrics["Loss"].mean)
        dt = (time.perf_counter() - t0) / 5
        rate = bench.NUM_WORLDS * bench.STEPS_PER_UPDATE / dt
        print(json.dumps({"lstm_unroll": unroll,
                          "update_ms": round(dt * 1e3, 2),
                          "env_steps_per_s": round(rate, 1)}), flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    section("infer_bench (heuristic default chunk)")
    run_infer_bench()
    section("pbt_bench")
    run_pbt_bench()
    section("lstm unroll sweep (full update)")
    run_unroll_sweep()
    print("TPU BENCHES DONE", flush=True)


if __name__ == "__main__":
    main()
