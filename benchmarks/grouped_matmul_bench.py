"""Grouped-matmul kernel vs XLA gather+batched-matmul, large-regime sweep.

Round-1 measurement (TODO.md) showed a tie at 63 chunks x 512x512->2048.
This sweeps into the large-population / wide-model regime where the XLA
path's per-chunk weight materialization ([num_chunks, in, out]) should
start to dominate HBM traffic.

Run: python benchmarks/grouped_matmul_bench.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from madrona_learn_tpu.ops.pallas.grouped_matmul import (
    grouped_matmul,
    grouped_matmul_reference,
)


def bench(B, C, IN, P, OUT, dtype, steps=30):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, C, IN)), dtype)
    w = jnp.asarray(rng.normal(size=(P, IN, OUT)), dtype)
    idx = jnp.asarray(rng.integers(0, P, size=(B,)), jnp.int32)

    flops = 2 * B * C * IN * OUT * steps

    def loop(fn):
        def body(acc, _):
            y = fn(x, w, idx)
            return acc + jnp.sum(y.astype(jnp.float32)), None
        def run(x_, w_, idx_):
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=steps)
            return acc
        return jax.jit(run).lower(x, w, idx).compile()

    out = {}
    for name, fn in (("xla", grouped_matmul_reference),
                     ("pallas", grouped_matmul)):
        compiled = loop(fn)
        jax.device_get(compiled(x, w, idx))
        t0 = time.perf_counter()
        jax.device_get(compiled(x, w, idx))
        dt = time.perf_counter() - t0
        out[name] = flops / dt / 1e12
        print(f"  [{B}x{C} chunks, {IN}->{OUT}, P={P}] {name}: "
              f"{out[name]:.1f} TFLOP/s", flush=True)
    print(f"  ratio pallas/xla = {out['pallas'] / out['xla']:.3f}x",
          flush=True)


def main():
    dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
             else jnp.float32)
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}")
    # Round-1 tie shape.
    bench(63, 512, 512, 39, 2048, dtype)
    # Large population, wide model: weight gather materializes
    # [B, IN, OUT] = 95 * 1024 * 2048 * 2B = 400 MB per layer-step on XLA.
    bench(95, 256, 1024, 64, 2048, dtype)
    bench(127, 256, 1024, 128, 1024, dtype)


if __name__ == "__main__":
    main()
