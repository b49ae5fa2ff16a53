"""Pallas-TPU fused GRU sequence scan with custom VJP.

Same design as the fused LSTM (ops/pallas/lstm.py): the whole BPTT time
loop runs inside one ``pallas_call`` (grid = batch-tiles x time, time
innermost; the h carry lives in VMEM scratch), the input projections are
hoisted out by the caller, and only the h sequence is stashed. The
backward rematerializes the gates from the stored sequence with one extra
MXU matmul and emits the two packed cotangents (``dxp`` for the input
projection, ``dhp`` for the recurrent projection — unlike the LSTM these
differ because the candidate gate's recurrent half is gated by r). The
recurrent weight/bias gradients accumulate in a fused fp32 epilogue into
VMEM-resident blocks (same as the LSTM kernel), so no separate XLA pass
re-streams the h sequence and dhp.

Gate math follows flax's ``nn.GRUCell`` (the module twin used at
single-step rollout time), cuDNN's "linear-before-reset" variant:

    r  = sigmoid(x_r + h @ W_hr)
    z  = sigmoid(x_z + h @ W_hz)
    n  = tanh(x_n + r * (h @ W_hn + b_hn))
    h' = (1 - z) * n + z * h

with packed layout ``[r | z | n]`` along the last axis, fp32 gate math
from storage-dtype operands, and the carry rounded to the storage dtype at
every step boundary. Episode boundaries clear the carry AFTER the step
(step-then-reset, the rollout engine's ordering).

Capability note: the reference ships no GRU at all (reference: rnn.py);
this is the TPU-native fast path for this repo's beyond-reference GRU.
``gru_sequence_reference`` is the jnp twin used in tests and as the
CPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lstm import _block_n, _pad_batch


def gru_supported(hidden, dtype):
    """Whether the fused kernel can serve this layer shape."""
    return hidden % 128 == 0 and dtype in (jnp.float32, jnp.bfloat16)


def _gates_fp32(xp, h, wh, bh):
    """Packed [r|z|n] gate math in fp32; returns (r, z, n, hn_lin)."""
    f32 = jnp.float32
    H = h.shape[-1]
    hp = jnp.dot(h, wh, preferred_element_type=f32)  # [BN, 3H]
    xr, xz, xn = (xp[..., :H], xp[..., H:2 * H], xp[..., 2 * H:])
    hr, hz, hn = (hp[..., :H], hp[..., H:2 * H], hp[..., 2 * H:])
    hn_lin = hn + bh.astype(f32)
    r = jax.nn.sigmoid(xr.astype(f32) + hr)
    z = jax.nn.sigmoid(xz.astype(f32) + hz)
    n = jnp.tanh(xn.astype(f32) + r * hn_lin)
    return r, z, n, hn_lin


def _fwd_kernel(xp_ref, keep_ref, wh_ref, bh_ref, h0_ref, ys_ref, h_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = h0_ref[...]

    f32 = jnp.float32
    h = h_scr[...]
    r, z, n, _ = _gates_fp32(xp_ref[0], h, wh_ref[...], bh_ref[0])
    new_h = ((1.0 - z) * n + z * h.astype(f32)).astype(ys_ref.dtype)
    ys_ref[0] = new_h

    # Clear-on-done AFTER emitting (step-then-reset). fp32 compare: Mosaic
    # has no bf16 vector cmpf.
    keep = keep_ref[0].astype(f32) > 0.5
    h_scr[...] = jnp.where(keep, new_h, jnp.zeros((), ys_ref.dtype))


def _bwd_kernel(T, xp_ref, dys_ref, ysp_ref, keepp_ref, wh_ref, bh_ref,
                h0_ref, dxp_ref, dhp_ref, dh0_ref, dwh_ref, dbh_ref,
                dh_scr):
    it = pl.program_id(1)
    b = pl.program_id(0)
    t = T - 1 - it

    @pl.when(it == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)

    # Weight-grad accumulators live in VMEM for the whole kernel (their
    # block index is constant); zero on the very first grid step.
    @pl.when(jnp.logical_and(b == 0, it == 0))
    def _():
        dwh_ref[...] = jnp.zeros_like(dwh_ref)
        dbh_ref[...] = jnp.zeros_like(dbh_ref)

    f32 = jnp.float32
    dt = dxp_ref.dtype
    zero = jnp.zeros((), dt)

    keep_prev = keepp_ref[0].astype(f32) > 0.5
    h_in = jnp.where(t == 0, h0_ref[...],
                     jnp.where(keep_prev, ysp_ref[0], zero))

    r, z, n, hn_lin = _gates_fp32(
        xp_ref[0], h_in, wh_ref[...], bh_ref[0])

    dh_total = dys_ref[0].astype(f32) + dh_scr[...]  # d h'
    h32 = h_in.astype(f32)

    dn = dh_total * (1.0 - z)
    dz = dh_total * (h32 - n)
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn_lin
    dhn = dn_pre * r
    dz_pre = dz * z * (1.0 - z)
    dr_pre = dr * r * (1.0 - r)

    dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1).astype(dt)
    dhp = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1).astype(dt)
    dxp_ref[0] = dxp
    dhp_ref[0] = dhp

    # Fused weight-grad epilogue (same as the LSTM kernel): saves XLA's
    # separate pass re-streaming the h sequence and dhp from HBM.
    H = dh_scr.shape[-1]
    dwh_ref[...] += lax.dot_general(
        h_in, dhp,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    # bias_h feeds hn_lin only: its cotangent is dhp's n slice. The (8, H)
    # accumulator carries the same partial sum in every row; the caller
    # reads row 0.
    dbh_ref[...] += jnp.broadcast_to(
        jnp.sum(dhp[..., 2 * H:].astype(f32), axis=0, keepdims=True),
        dbh_ref.shape)

    # h_in contributes through h @ W_h (all three slices) and directly
    # through z * h.
    dh_prev = (
        lax.dot_general(
            dhp, wh_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        + dh_total * z)

    @pl.when(t == 0)
    def _():
        dh0_ref[...] = dh_prev.astype(dh0_ref.dtype)

    f32zero = jnp.zeros((), f32)
    dh_scr[...] = jnp.where(keep_prev, dh_prev, f32zero)


def _fwd_impl(x_proj, keep, wh, bias_h, h0, interpret):
    T, N, G3 = x_proj.shape
    H = G3 // 3
    BN = _block_n(H, N)
    keep3 = keep[..., None]
    (x_proj, _), (keep3, _), (h0, _) = _pad_batch(
        [(x_proj, 1), (keep3, 1), (h0, 0)], N, BN)[0]
    n_padded = x_proj.shape[1]
    bh2d = bias_h.reshape(1, H)
    dt = x_proj.dtype
    grid = (n_padded // BN, T)

    ys = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BN, G3), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, BN, 1), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, G3), lambda b, t: (0, 0)),
            pl.BlockSpec((1, H), lambda b, t: (0, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, BN, H), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, n_padded, H), dt),
        scratch_shapes=[pltpu.VMEM((BN, H), dt)],
        interpret=interpret,
    )(x_proj, keep3, wh, bh2d, h0)
    return ys[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_sequence(x_proj, keep, wh, bias_h, h0, interpret=False):
    """Fused GRU over time. All operands in the storage/compute dtype.

    x_proj: [T, N, 3H] pre-projected inputs incl. the input bias, packed
            (r, z, n) along the last axis
    keep:   [T, N] float mask; 0.0 clears the carry AFTER step t
    wh:     [H, 3H] recurrent kernel; bias_h: [H] (candidate-gate recurrent
            bias, flax GRUCell's 'hn' dense)
    h0:     [N, H] initial carry
    returns ys: [T, N, H] per-step hidden outputs (pre-clear)
    """
    return _fwd_impl(x_proj, keep, wh, bias_h, h0, interpret)


def _gru_seq_fwd(x_proj, keep, wh, bias_h, h0, interpret):
    ys = _fwd_impl(x_proj, keep, wh, bias_h, h0, interpret)
    return ys, (x_proj, keep, wh, bias_h, h0, ys)


def _gru_seq_bwd(interpret, residuals, dys):
    x_proj, keep, wh, bias_h, h0, ys = residuals
    T, N, G3 = x_proj.shape
    H = G3 // 3
    BN = _block_n(H, N)
    keep3 = keep[..., None]
    padded, n_padded = _pad_batch(
        [(x_proj, 1), (keep3, 1), (h0, 0), (ys, 1), (dys, 1)], N, BN)
    (x_proj, _), (keep3, _), (h0, _), (ys, _), (dys, _) = padded
    bh2d = bias_h.reshape(1, H)
    dt = x_proj.dtype
    grid = (n_padded // BN, T)

    tmap3 = lambda b, t: (T - 1 - t, b, 0)
    pmap3 = lambda b, t: (jnp.maximum(T - 2 - t, 0), b, 0)

    dxp, dhp, dh0, dwh, dbh8 = pl.pallas_call(
        functools.partial(_bwd_kernel, T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BN, G3), tmap3),
            pl.BlockSpec((1, BN, H), tmap3),
            pl.BlockSpec((1, BN, H), pmap3),
            pl.BlockSpec((1, BN, 1), pmap3),
            pl.BlockSpec((H, G3), lambda b, t: (0, 0)),
            pl.BlockSpec((1, H), lambda b, t: (0, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BN, G3), tmap3),
            pl.BlockSpec((1, BN, G3), tmap3),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
            pl.BlockSpec((H, G3), lambda b, t: (0, 0)),
            pl.BlockSpec((8, H), lambda b, t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, n_padded, G3), dt),
            jax.ShapeDtypeStruct((T, n_padded, G3), dt),
            jax.ShapeDtypeStruct((n_padded, H), h0.dtype),
            jax.ShapeDtypeStruct((H, G3), jnp.float32),
            jax.ShapeDtypeStruct((8, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BN, H), jnp.float32)],
        interpret=interpret,
    )(x_proj, dys, ys, keep3, wh, bh2d, h0)

    dxp = dxp[:, :N]
    dhp = dhp[:, :N]
    dh0 = dh0[:N]

    # Weight grads came out of the kernel's fused epilogue; padded batch
    # rows contribute zero (their cotangents are identically zero).
    dwh = dwh.astype(wh.dtype)
    dbh = dbh8[0].astype(bias_h.dtype)
    dkeep = jnp.zeros_like(keep3[:, :N, 0])
    return dxp, dkeep, dwh, dbh, dh0


gru_sequence.defvjp(_gru_seq_fwd, _gru_seq_bwd)


def gru_sequence_reference(x_proj, keep, wh, bias_h, h0, unroll=1):
    """jnp twin: identical math and rounding points, as a lax.scan."""
    f32 = jnp.float32
    dt = x_proj.dtype

    def step(h, inputs):
        xp, k = inputs
        r, z, n, _ = _gates_fp32(xp, h, wh, bias_h)
        new_h = ((1.0 - z) * n + z * h.astype(f32)).astype(dt)
        mask = k[:, None] > 0.5
        return jnp.where(mask, new_h, jnp.zeros((), dt)), new_h

    _, ys = lax.scan(step, h0, (x_proj, keep), unroll=unroll)
    return ys
