"""Entity-attention: Pallas fused kernel vs XLA path, honest comparison.

Measures the full EntitySelfAttentionNet forward (the rollout hot path) and
forward+backward (the PPO update path) with ``use_pallas`` on/off, at the
flagship entity count (12 -> padded 16) and at large entity counts where a
fused kernel could plausibly win. Decides whether the kernel earns its place
(the same standard applied to grouped_matmul — see TODO.md).

Run: python benchmarks/attention_bench.py [--batch 16384] [--steps 50]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax.core import FrozenDict


def bench_case(name, batch, entity_counts, feat, steps, dtype):
    from madrona_learn_tpu.models import EntitySelfAttentionNet

    rng = np.random.default_rng(0)
    obs = {"self": jnp.asarray(rng.normal(size=(batch, 16)), dtype)}
    for i, n in enumerate(entity_counts):
        obs[f"set{i}"] = jnp.asarray(
            rng.normal(size=(batch, n, feat)), dtype)
    obs = FrozenDict(obs)

    results = {}
    for use_pallas in (False, True):
        net = EntitySelfAttentionNet(
            num_embed_channels=128, num_out_channels=256, num_heads=4,
            dtype=dtype, use_pallas=use_pallas)
        params = jax.jit(lambda o: net.init(
            jax.random.PRNGKey(0), o, train=False))(obs)

        def fwd(params, obs):
            out = net.apply(params, obs, train=False)
            return jnp.sum(out.astype(jnp.float32))

        def run_fwd(params, obs):
            def step(acc, _):
                return acc + fwd(params, obs), None
            acc, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), None, length=steps)
            return acc

        def run_bwd(params, obs):
            def step(acc, _):
                g = jax.grad(fwd)(params, obs)
                leaves = [jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree.leaves(g)]
                return acc + sum(leaves), None
            acc, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), None, length=steps)
            return acc

        for tag, run in (("fwd", run_fwd), ("fwd+bwd", run_bwd)):
            compiled = jax.jit(run).lower(params, obs).compile()
            jax.device_get(compiled(params, obs))  # warm
            t0 = time.perf_counter()
            jax.device_get(compiled(params, obs))
            dt = time.perf_counter() - t0
            rate = batch * steps / dt
            results[(use_pallas, tag)] = rate
            print(f"  {name} {tag:7s} use_pallas={use_pallas}: "
                  f"{rate:,.0f} agent-steps/s", flush=True)

    for tag in ("fwd", "fwd+bwd"):
        ratio = results[(True, tag)] / results[(False, tag)]
        print(f"  {name} {tag}: pallas/xla = {ratio:.3f}x", flush=True)
    return results


def bench_kernels(batch, seq, heads, head_dim, steps, dtype):
    """Raw kernel-level comparison: single-pass mha vs flash vs XLA twin."""
    from madrona_learn_tpu.ops.pallas.attention import (
        mha, mha_flash, mha_reference)

    rng = np.random.default_rng(1)
    shape = (batch, seq, heads, head_dim)
    q = jnp.asarray(rng.normal(size=shape), dtype)
    k = jnp.asarray(rng.normal(size=shape), dtype)
    v = jnp.asarray(rng.normal(size=shape), dtype)
    valid = seq - 1  # exercise the mask path like the model does

    def timed(name, fn):
        def run(q, k, v):
            def step(acc, _):
                o = fn(q, k, v)
                return acc + jnp.sum(o.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32), None, length=steps)
            return acc
        try:
            compiled = jax.jit(run).lower(q, k, v).compile()
            jax.device_get(compiled(q, k, v))
            t0 = time.perf_counter()
            jax.device_get(compiled(q, k, v))
            dt = time.perf_counter() - t0
        except Exception as e:  # e.g. scoped-VMEM OOM on the [S,S] tile
            print(f"  S={seq:4d} {name:10s}: FAILED "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:90]})",
                  flush=True)
            return None
        per = dt / steps * 1e3
        print(f"  S={seq:4d} {name:10s}: {per:8.3f} ms/call", flush=True)
        return per

    timed("xla", lambda q, k, v: mha_reference(q, k, v, valid_len=valid))
    timed("fused", lambda q, k, v: mha(q, k, v, valid_len=valid))
    timed("flash", lambda q, k, v: mha_flash(q, k, v, valid_len=valid))

    # fwd+bwd: flash now has a flash-structured backward (two Mosaic
    # kernels, no [B, H, S, S] materialization) — compare the full
    # training-path cost against autodiff through the XLA twin.
    def grad_of(fn):
        g = jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32)),
            argnums=(0, 1, 2))

        def both(q, k, v):
            dq, dk, dv = g(q, k, v)
            return (jnp.sum(dq.astype(jnp.float32))
                    + jnp.sum(dk.astype(jnp.float32))
                    + jnp.sum(dv.astype(jnp.float32)))
        return both

    timed("xla+bwd",
          grad_of(lambda q, k, v: mha_reference(q, k, v, valid_len=valid)))
    timed("flash+bwd",
          grad_of(lambda q, k, v: mha_flash(q, k, v, valid_len=valid)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16384)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--kernels", action="store_true",
                        help="raw kernel comparison across entity counts")
    args = parser.parse_args()

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    print(f"backend={backend} dtype={dtype.__name__}")

    if backend != "tpu":
        # Compiled pallas needs a real TPU; interpret mode would make the
        # comparison meaningless, so only sanity-run the kernel path there.
        # Both the kernel (interpret) and the backend guard must be forced,
        # otherwise SelfAttention silently falls back to XLA and the
        # "comparison" compares XLA against itself.
        import madrona_learn_tpu.models.attention as mattn
        import madrona_learn_tpu.ops.pallas.attention as pattn
        orig = pattn.mha
        pattn.mha = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
        mattn._pallas_backend_ok = lambda: True
        print("(non-TPU backend: pallas in interpret mode, "
              "numbers not comparable)")

    if args.kernels:
        # S=1024 included so the routing flip's quoted crossover evidence
        # (flash fwd+bwd 3.523 vs XLA 4.029 ms — BASELINE.md round 4) is
        # reproducible from this committed harness.
        for seq in (64, 128, 256, 512, 1024):
            bench_kernels(max(args.batch // (seq // 16), 64), seq, 4, 32,
                          args.steps, dtype)
        return

    # Flagship shape: 5+6 entities + self = 12, padded to 16.
    bench_case("entities=12(pad16)", args.batch, (5, 6), 12, args.steps,
               dtype)
    # Large entity sets: 127+self = 128 and 255+self = 256.
    bench_case("entities=128", args.batch // 8, (127,), 12, args.steps,
               dtype)
    bench_case("entities=256", args.batch // 16, (255,), 12, args.steps,
               dtype)


if __name__ == "__main__":
    main()
