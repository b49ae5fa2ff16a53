"""Backward-specific LSTM batch-tile sweep (VERDICT r4 item 5 / TODO #2).

The fused LSTM sequence kernel's BN=512 was picked by an e2e A/B that
couples forward and backward; the backward (3 MXU matmuls per step vs the
forward's 1) may prefer its own tile. This sweeps
``ops.pallas.lstm._BLOCK_N_BWD_OVERRIDE`` over {256, 384, 512} at the
headline bench shape, same process, timing the FULL update (bench.py
methodology, donated chained steady state).

Run on TPU: python scripts/lstm_bwd_tile_sweep.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    import bench
    import madrona_learn_tpu.ops.pallas.lstm as plstm

    backend = bench.acquire_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32

    sync = lambda m: jax.device_get(m.metrics.metrics["Loss"].mean)
    results = []
    for bn in (256, 384, 512):
        plstm._BLOCK_N_BWD_OVERRIDE = bn
        try:
            mgr = bench.build_manager(dtype)
            update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)
            mgr = update(mgr)
            sync(mgr)
            rates = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(bench.TIMED_UPDATES):
                    mgr = update(mgr)
                sync(mgr)
                dt = time.perf_counter() - t0
                rates.append(
                    bench.NUM_WORLDS * bench.STEPS_PER_UPDATE
                    * bench.TIMED_UPDATES / dt)
            res = {"bn_bwd": bn,
                   "env_steps_per_s": round(max(rates), 1),
                   "trials": [round(r, 1) for r in rates]}
        finally:
            plstm._BLOCK_N_BWD_OVERRIDE = None
        results.append(res)
        print(json.dumps(res), flush=True)

    best = max(results, key=lambda r: r["env_steps_per_s"])
    print(json.dumps({"best_bn_bwd": best["bn_bwd"],
                      "best": best["env_steps_per_s"]}))


if __name__ == "__main__":
    main()
