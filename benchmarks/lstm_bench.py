"""Fused Pallas LSTM sequence kernel vs the XLA scan path, on TPU.

Times the full BPTT sequence pass (fwd + bwd, the PPO learn phase's
dominant cost) at the headline bench shape, and first checks the kernel
against its jnp twin on hardware. Run: python benchmarks/lstm_bench.py
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
    p.add_argument("--sweep-block", action="store_true",
                   help="sweep the kernel's batch-block size")
    args = p.parse_args()

    from madrona_learn_tpu.models import LSTM
    from madrona_learn_tpu.ops.pallas.lstm import (
        lstm_sequence, lstm_sequence_reference)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    T, N, H, F = args.T, args.N, args.H, args.F

    # --- correctness on hardware (small shape, fwd + bwd) ---
    rng = np.random.default_rng(0)
    sT, sN, sH = 5, 70, 128
    xp = jnp.asarray(rng.normal(size=(sT, sN, 4 * sH)), jnp.float32)
    keep = jnp.asarray(rng.random((sT, sN)) > 0.2, jnp.float32)
    wr = jnp.asarray(rng.normal(size=(sH, 4 * sH)) / np.sqrt(sH), jnp.float32)
    b = jnp.asarray(rng.normal(size=(4 * sH,)), jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(sN, sH)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(sN, sH)), jnp.float32)
    probe = jnp.asarray(rng.normal(size=(sT, sN, sH)), jnp.float32)

    def loss_k(xp, wr, b, c0, h0):
        return jnp.sum(lstm_sequence(xp, keep, wr, b, c0, h0) * probe)

    def loss_r(xp, wr, b, c0, h0):
        return jnp.sum(
            lstm_sequence_reference(xp, keep, wr, b, c0, h0) * probe)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3, 4)))(xp, wr, b, c0, h0)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3, 4)))(xp, wr, b, c0, h0)
    yk = jax.jit(lambda: lstm_sequence(xp, keep, wr, b, c0, h0))()
    yr = jax.jit(lambda: lstm_sequence_reference(xp, keep, wr, b, c0, h0))()
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    # Grad tolerance: on TPU both paths run fp32 matmuls as bf16-pass
    # decompositions, but with different rounding orders (the kernel
    # reduces dwr as ONE [T*N] contraction and chains dh through T
    # in-kernel matmuls; XLA's scan autodiff accumulates per-step partials
    # in fp32) — same precision class, ~1e-3..1e-2 abs divergence on O(1)
    # grads. The exact-math check lives in tests/test_pallas_kernels.py
    # (interpret mode, CPU fp32); this on-hardware check catches lowering
    # bugs, which show up as O(1) errors.
    for g, r, name in zip(gk, gr, ("dxp", "dwr", "db", "dc0", "dh0")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), err_msg=name,
            rtol=1e-2, atol=2e-2)
    print("hardware correctness (fwd+bwd): OK")

    # --- throughput: module sequence pass fwd+bwd, fused vs scan ---
    def bench_variant(use_pallas):
        lstm = LSTM(num_hidden_channels=H, num_layers=1, dtype=dtype,
                    use_pallas=use_pallas)
        xs = jnp.asarray(rng.normal(size=(T, N, F)), dtype)
        dones = jnp.asarray(rng.random((T, N, 1)) < 0.05)
        state = lstm.init_recurrent_state(N)
        params = lstm.init(jax.random.PRNGKey(0), state, xs[0], False)

        def loss(params, xs):
            out = lstm.apply(params, state, dones, xs, False,
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

    toks = T * N
    print(f"shape T={T} N={N} H={H} F={F} dtype={args.dtype}")

    if args.sweep_block:
        import madrona_learn_tpu.ops.pallas.lstm as plstm
        for bn in (256, 512, 1024, 2048):
            if bn > N:
                continue
            plstm._BLOCK_N_OVERRIDE = bn
            try:
                t = bench_variant(True)
            except Exception as e:  # e.g. scoped-VMEM OOM at large BN
                print(f"fused BN={bn:5d}: FAILED "
                      f"({type(e).__name__}: {str(e).splitlines()[0][:100]})")
                continue
            print(f"fused BN={bn:5d}: {t*1e3:8.3f} ms  "
                  f"({toks/t/1e6:7.2f}M tok/s)")
        plstm._BLOCK_N_OVERRIDE = None
        return

    t_scan = bench_variant(False)
    t_fused = bench_variant(True)
    print(f"scan  fwd+bwd: {t_scan*1e3:8.3f} ms  "
          f"({toks/t_scan/1e6:7.2f}M tok/s)")
    print(f"fused fwd+bwd: {t_fused*1e3:8.3f} ms  "
          f"({toks/t_fused/1e6:7.2f}M tok/s)")
    print(f"speedup: {t_scan/t_fused:.3f}x")


if __name__ == "__main__":
    main()
