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

    # --- proj-fused kernel correctness on hardware ---
    from madrona_learn_tpu.ops.pallas.lstm import (
        lstm_sequence_proj, lstm_sequence_proj_reference)
    sF = 128
    x_in = jnp.asarray(rng.normal(size=(sT, sN, sF)), jnp.float32)
    wi = jnp.asarray(rng.normal(size=(sF, 4 * sH)) / np.sqrt(sF),
                     jnp.float32)

    def loss_pk(x, wi, wr, b, c0, h0):
        return jnp.sum(
            lstm_sequence_proj(x, keep, wi, wr, b, c0, h0) * probe)

    def loss_pr(x, wi, wr, b, c0, h0):
        return jnp.sum(
            lstm_sequence_proj_reference(x, keep, wi, wr, b, c0, h0) * probe)

    gpk = jax.jit(jax.grad(loss_pk, argnums=(0, 1, 2, 3, 4, 5)))(
        x_in, wi, wr, b, c0, h0)
    gpr = jax.jit(jax.grad(loss_pr, argnums=(0, 1, 2, 3, 4, 5)))(
        x_in, wi, wr, b, c0, h0)
    ypk = jax.jit(lambda: lstm_sequence_proj(x_in, keep, wi, wr, b, c0, h0))()
    ypr = jax.jit(
        lambda: lstm_sequence_proj_reference(x_in, keep, wi, wr, b, c0, h0))()
    # Unlike lstm_sequence (whose x_proj is computed OUTSIDE both paths and
    # cancels), the proj variant computes x @ Wi in Mosaic while the twin
    # uses an XLA dot — different bf16-pass decompositions of the fp32
    # matmul (see the grad-tolerance note above), so the forward check is
    # in the same ~1e-3 precision class here. Exact-math equality lives in
    # tests/test_pallas_kernels.py (interpret mode).
    np.testing.assert_allclose(np.asarray(ypk), np.asarray(ypr),
                               rtol=1e-2, atol=2e-2)
    for g, r, name in zip(gpk, gpr, ("dx", "dwi", "dwr", "db", "dc0", "dh0")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), err_msg=name,
            rtol=1e-2, atol=2e-2)
    print("proj-fused hardware correctness (fwd+bwd): OK")

    # --- throughput: module sequence pass fwd+bwd, fused vs scan ---
    def bench_variant(use_pallas, fuse_proj=False):
        lstm = LSTM(num_hidden_channels=H, num_layers=1, dtype=dtype,
                    use_pallas=use_pallas, fuse_input_proj=fuse_proj)
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

    from madrona_learn_tpu.ops.pallas.lstm import lstm_proj_supported

    t_scan = bench_variant(False)
    # Hoisted projection + sequence kernel (the default routing).
    t_fused = bench_variant(True)
    print(f"scan       fwd+bwd: {t_scan*1e3:8.3f} ms  "
          f"({toks/t_scan/1e6:7.2f}M tok/s)")
    print(f"fused      fwd+bwd: {t_fused*1e3:8.3f} ms  "
          f"({toks/t_fused/1e6:7.2f}M tok/s)  "
          f"[{t_scan/t_fused:.3f}x scan]")
    if lstm_proj_supported(F, H, dtype):
        t_proj = bench_variant(True, fuse_proj=True)
        print(f"proj-fused fwd+bwd: {t_proj*1e3:8.3f} ms  "
              f"({toks/t_proj/1e6:7.2f}M tok/s)  "
              f"[{t_scan/t_proj:.3f}x scan, {t_fused/t_proj:.3f}x fused]")
    else:
        print(f"proj-fused: unsupported at F={F} H={H} dtype={args.dtype}")


if __name__ == "__main__":
    main()
