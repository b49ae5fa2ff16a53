"""Fused Pallas GRU sequence kernel vs the XLA scan path, on TPU.

Times the full BPTT sequence pass (fwd + bwd) at the headline bench shape,
after checking the kernel against its jnp twin on hardware.
Run: python benchmarks/gru_bench.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--T", type=int, default=16)
    p.add_argument("--N", type=int, default=16384)
    p.add_argument("--H", type=int, default=256)
    p.add_argument("--F", type=int, default=256)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    from madrona_learn_tpu.models import GRU
    from madrona_learn_tpu.ops.pallas.gru import (
        gru_sequence, gru_sequence_reference)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    T, N, H, F = args.T, args.N, args.H, args.F

    # --- correctness on hardware (small shape, fwd + bwd) ---
    rng = np.random.default_rng(0)
    sT, sN, sH = 5, 70, 128
    xp = jnp.asarray(rng.normal(size=(sT, sN, 3 * sH)), jnp.float32)
    keep = jnp.asarray(rng.random((sT, sN)) > 0.2, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(sH, 3 * sH)) / np.sqrt(sH),
                     jnp.float32)
    bh = jnp.asarray(rng.normal(size=(sH,)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(sN, sH)), jnp.float32)
    probe = jnp.asarray(rng.normal(size=(sT, sN, sH)), jnp.float32)

    def loss_k(xp, wh, bh, h0):
        return jnp.sum(gru_sequence(xp, keep, wh, bh, h0) * probe)

    def loss_r(xp, wh, bh, h0):
        return jnp.sum(
            gru_sequence_reference(xp, keep, wh, bh, h0) * probe)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))(xp, wh, bh, h0)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3)))(xp, wh, bh, h0)
    yk = jax.jit(lambda: gru_sequence(xp, keep, wh, bh, h0))()
    yr = jax.jit(lambda: gru_sequence_reference(xp, keep, wh, bh, h0))()
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    # Same grad-tolerance rationale as benchmarks/lstm_bench.py: both paths
    # run fp32 matmuls as bf16-pass decompositions with different rounding
    # orders on TPU; exact math is checked in tests (interpret mode, CPU).
    for g, r, name in zip(gk, gr, ("dxp", "dwh", "dbh", "dh0")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), err_msg=name,
            rtol=1e-2, atol=2e-2)
    print("hardware correctness (fwd+bwd): OK")

    # --- throughput: module sequence pass fwd+bwd, fused vs scan ---
    def bench_variant(use_pallas):
        gru = GRU(num_hidden_channels=H, num_layers=1, dtype=dtype,
                  use_pallas=use_pallas)
        xs = jnp.asarray(rng.normal(size=(T, N, F)), dtype)
        dones = jnp.asarray(rng.random((T, N, 1)) < 0.05)
        state = gru.init_recurrent_state(N)
        params = gru.init(jax.random.PRNGKey(0), state, xs[0], False)

        def loss(params, xs):
            out = gru.apply(params, state, dones, xs, False,
                            method="sequence")
            return jnp.sum(out.astype(jnp.float32) ** 2)

        step = jax.jit(jax.grad(loss, argnums=(0, 1)))
        g = step(params, xs)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            g = step(params, xs)
        _ = jax.device_get(jax.tree.leaves(g)[0])
        dt = (time.perf_counter() - t0) / args.iters
        return dt

    t_scan = bench_variant(False)
    t_fused = bench_variant(True)
    toks = T * N
    print(f"shape T={T} N={N} H={H} F={F} dtype={args.dtype}")
    print(f"scan  fwd+bwd: {t_scan*1e3:8.3f} ms  "
          f"({toks/t_scan/1e6:7.2f}M tok/s)")
    print(f"fused fwd+bwd: {t_fused*1e3:8.3f} ms  "
          f"({toks/t_fused/1e6:7.2f}M tok/s)")
    print(f"speedup: {t_scan/t_fused:.3f}x")


if __name__ == "__main__":
    main()
