"""Pallas-TPU fused rollout policy step: MLP trunk + LSTM cell in one kernel.

Why: the rollout loop's per-step policy forward dominates the collect phase
(benchmarks/collect_ablation.py: ~85% of the loop at the headline shape) and
is bandwidth/boundary-bound, not compute-bound — benchmarks/
inference_ablation.py shows removing sampling, obs normalization, or either
head barely moves the per-step time, because the cost is the HBM round
trips of [N, H] activations between the ~10 XLA kernels of the MLP+LSTM
chain (~0.40 ms/step measured vs a ~0.1 ms compute floor at N=16384,
H=256). This kernel keeps the whole trunk's activations resident in VMEM
per batch tile: one read of (obs features, c, h) and one write of (c', h')
per step.

Scope: the single-step INFERENCE forward only (no VJP — PPO never
backpropagates through rollout-time forwards; the update pass recomputes
through the XLA/fused-sequence path). Supported architecture: the flagship
``RecurrentBackboneEncoder(net=MLP(...), rnn=LSTM(num_layers=1))`` tower —
Dense(no-bias) + LayerNorm + ReLU stacks feeding a packed-gate LSTM cell.

Math convention (mirrored exactly by ``fused_policy_step_reference``, the
jnp twin used in tests and as the CPU fallback):

- Dense: bf16 operands, fp32 MXU accumulation, output rounded to the
  storage dtype — the same rounding point as ``flax.linen.Dense(dtype=...)``.
- LayerNorm: mean/var in fp32 (fast-variance form, flax's default), both
  rounded to the storage dtype before normalizing (flax's
  ``promote_dtype(..., dtype=self.dtype)``), affine applied with
  storage-dtype-rounded scale/bias; the normalize+affine chain itself runs
  in fp32 and rounds once at the output, where flax's bf16 chain rounds
  every intermediate — a <=1-ulp(bf16) divergence, covered by test
  tolerances (same argument as ops/pallas/attention.py).
- LSTM: exactly the ``precise_gates`` convention of models/lstm.py (fp32
  gate math from storage-dtype operands, carry rounded at the step
  boundary), which is also the fused sequence kernel's convention — so
  rollout-time and update-time forwards stay consistent and PPO's
  importance ratio starts at ~1.

Reference counterpart: none — the reference runs its rollout forwards
through plain flax modules (reference: actor_critic.py:74-96, rnn.py:87-90);
this kernel is the TPU-native upgrade of that path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _block_n(hidden, n):
    # Same working-set heuristic as the LSTM sequence kernel: fp32
    # intermediates scale with BN * 4H, so cap BN * H.
    cap = min(512, max(128, (128 * 1024) // max(hidden, 1)))
    return min(cap, 256) if n <= 256 else cap


def policy_step_supported(hidden, feat_in, dtype):
    """Whether the fused step kernel can serve this tower shape."""
    return (hidden % 128 == 0
            and feat_in <= 128
            and dtype in (jnp.float32, jnp.bfloat16))


def _mlp_layer(a, w_ref, s_ref, b_ref, dt):
    f32 = jnp.float32
    a = jnp.dot(a, w_ref[...], preferred_element_type=f32).astype(dt)
    af = a.astype(f32)
    mean = jnp.mean(af, axis=-1, keepdims=True)
    var = jnp.mean(af * af, axis=-1, keepdims=True) - mean * mean
    # flax promotes (x, mean, var, scale, bias) to the compute dtype before
    # normalizing; mirror those rounding points.
    mean = mean.astype(dt).astype(f32)
    var = var.astype(dt).astype(f32)
    scale = s_ref[...].astype(dt).astype(f32)
    bias = b_ref[...].astype(dt).astype(f32)
    y = (af - mean) * lax.rsqrt(var + _LN_EPS) * scale + bias
    return jnp.maximum(y.astype(dt), jnp.zeros((), dt))


def _step_kernel(num_layers, *refs):
    x_ref = refs[0]
    layer_refs = refs[1:1 + 3 * num_layers]
    wi_ref, wr_ref, b_ref, c_ref, h_ref = refs[1 + 3 * num_layers:
                                               6 + 3 * num_layers]
    feats_ref, c_out_ref, h_out_ref = refs[6 + 3 * num_layers:]

    f32 = jnp.float32
    dt = feats_ref.dtype

    a = x_ref[...]
    for i in range(num_layers):
        w_r, s_r, bi_r = layer_refs[3 * i:3 * i + 3]
        a = _mlp_layer(a, w_r, s_r, bi_r, dt)

    # LSTM cell, precise-gates convention (models/lstm.py).
    x_proj = jnp.dot(
        a, wi_ref[...], preferred_element_type=f32).astype(dt).astype(f32)
    gates = (
        x_proj
        + jnp.dot(h_ref[...].astype(dt), wr_ref[...],
                  preferred_element_type=f32)
        + b_ref[...].astype(dt).astype(f32)
    )
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    new_c = (jax.nn.sigmoid(gf) * c_ref[...].astype(f32)
             + jax.nn.sigmoid(gi) * jnp.tanh(gg))
    new_h = jax.nn.sigmoid(go) * jnp.tanh(new_c)

    feats_ref[...] = new_h.astype(dt)
    c_out_ref[...] = new_c.astype(c_out_ref.dtype)
    h_out_ref[...] = new_h.astype(dt)


def fused_policy_step(x, mlp_params, wi, wr, bias, c, h, interpret=False):
    """One policy trunk step: MLP stack + LSTM cell, fused.

    x:          [N, F] input features (post-prefix/preprocess), F <= 128
    mlp_params: list of (W [Fin, H], ln_scale [H] f32, ln_bias [H] f32)
    wi:         [H, 4H] LSTM input projection (gate order i, f, g, o)
    wr:         [H, 4H] recurrent kernel;  bias: [4H]
    c, h:       [N, H] carry
    returns (features [N, H], (c' [N, H], h' [N, H]))
    """
    N, F = x.shape
    H = h.shape[-1]
    dt = h.dtype
    BN = _block_n(H, N)

    # Pad the feature axis to the 128-lane tile and the batch to BN.
    Fp = 128
    if F < Fp:
        x = jnp.pad(x, ((0, 0), (0, Fp - F)))
        w0, s0, b0 = mlp_params[0]
        mlp_params = [(jnp.pad(w0, ((0, Fp - F), (0, 0))), s0, b0)
                      ] + list(mlp_params[1:])
    pad_n = (-N) % BN
    if pad_n:
        x, c, h = (jnp.pad(a, ((0, pad_n), (0, 0))) for a in (x, c, h))
    n_padded = N + pad_n

    num_layers = len(mlp_params)
    operands = [x.astype(dt)]
    in_specs = [pl.BlockSpec((BN, Fp), lambda b: (b, 0))]
    const = lambda b: (0, 0)
    fin = Fp
    for (w, s, lb) in mlp_params:
        operands += [w.astype(dt), s.reshape(1, H).astype(jnp.float32),
                     lb.reshape(1, H).astype(jnp.float32)]
        in_specs += [pl.BlockSpec((fin, H), const),
                     pl.BlockSpec((1, H), const),
                     pl.BlockSpec((1, H), const)]
        fin = H
    operands += [wi.astype(dt), wr.astype(dt),
                 bias.reshape(1, 4 * H), c, h]
    in_specs += [
        pl.BlockSpec((H, 4 * H), const),
        pl.BlockSpec((H, 4 * H), const),
        pl.BlockSpec((1, 4 * H), const),
        pl.BlockSpec((BN, H), lambda b: (b, 0)),
        pl.BlockSpec((BN, H), lambda b: (b, 0)),
    ]

    feats, c_out, h_out = pl.pallas_call(
        functools.partial(_step_kernel, num_layers),
        grid=(n_padded // BN,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((BN, H), lambda b: (b, 0)),
            pl.BlockSpec((BN, H), lambda b: (b, 0)),
            pl.BlockSpec((BN, H), lambda b: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_padded, H), dt),
            jax.ShapeDtypeStruct((n_padded, H), c.dtype),
            jax.ShapeDtypeStruct((n_padded, H), dt),
        ],
        interpret=interpret,
    )(*operands)
    return feats[:N], (c_out[:N], h_out[:N])


def fused_policy_step_reference(x, mlp_params, wi, wr, bias, c, h):
    """jnp twin: identical math and rounding points, unfused."""
    f32 = jnp.float32
    dt = h.dtype

    a = x.astype(dt)
    for (w, s, lb) in mlp_params:
        a = jnp.dot(a, w.astype(dt), preferred_element_type=f32).astype(dt)
        af = a.astype(f32)
        mean = jnp.mean(af, axis=-1, keepdims=True)
        var = jnp.mean(af * af, axis=-1, keepdims=True) - mean * mean
        mean = mean.astype(dt).astype(f32)
        var = var.astype(dt).astype(f32)
        scale = s.astype(dt).astype(f32)
        lbias = lb.astype(dt).astype(f32)
        y = (af - mean) * lax.rsqrt(var + _LN_EPS) * scale + lbias
        a = jnp.maximum(y.astype(dt), jnp.zeros((), dt))

    x_proj = jnp.dot(
        a, wi.astype(dt), preferred_element_type=f32).astype(dt).astype(f32)
    gates = (
        x_proj
        + jnp.dot(h.astype(dt), wr.astype(dt), preferred_element_type=f32)
        + bias.astype(dt).astype(f32)
    )
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    new_c = (jax.nn.sigmoid(gf) * c.astype(f32)
             + jax.nn.sigmoid(gi) * jnp.tanh(gg))
    new_h = jax.nn.sigmoid(go) * jnp.tanh(new_c)
    return new_h.astype(dt), (new_c.astype(c.dtype), new_h.astype(dt))
