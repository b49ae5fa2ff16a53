"""Pallas-TPU fused LSTM sequence scan with custom VJP.

The BPTT sequence pass is the PPO update's dominant cost. XLA lowers the
per-layer ``nn.scan`` to a length-T while loop whose backward stashes the
full ``[T, N, 4H]`` gate tensor with per-step dynamic-update-slices — on the
profile (BASELINE.md round-2) those stash fusions, not matmuls, dominate the
learn phase. This kernel instead runs the whole time loop inside one
``pallas_call``:

- forward: grid ``(batch_tiles, T)`` with time innermost, so Mosaic
  pipelines the ``[1, BN, 4H]`` x_proj blocks from HBM while the recurrent
  ``[BN, H] x [H, 4H]`` matmul + gate math run from VMEM; the (c, h) carry
  lives in VMEM scratch across the whole time axis. Only ``ys`` and ``cs``
  (h and c sequences, ``[T, N, H]`` each) are written — half the HBM
  traffic of the gate stash.
- backward: same grid reversed in time; gates are rematerialized from the
  stored (rounded) sequences with one more MXU matmul, and the kernel emits
  ``dgates`` (= the x_proj cotangent) plus dh0/dc0. The weight gradients
  accumulate in a fused fp32 epilogue (``dWr += h_in^T @ dgates``,
  ``db += sum(dgates)``) into VMEM-resident blocks, so XLA's separate
  weight-grad pass — which re-streamed the h sequence and dgates from HBM
  and materialized the shifted ``h_in`` sequence — disappears.

Gate math runs in fp32 from the storage-dtype operands, with the carry
rounded back to the storage dtype at every step boundary — exactly the
rounding points of the XLA single-step path when the model runs its
"precise gates" mode (models/lstm.py), keeping rollout-pass and update-pass
forwards consistent (PPO's importance ratio must start at 1; same argument
as models/attention.py:54-58).

Capability parity: the reference trains its LSTMs through flax's
``nn.OptimizedLSTMCell`` + ``nn.scan`` with no custom kernel (reference:
rnn.py:91-111); this kernel is the TPU-native upgrade of that path.
``lstm_sequence_reference`` is the jnp twin used in tests and as the
CPU/GPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Experiment override for benchmarks/lstm_bench.py --sweep-block.
_BLOCK_N_OVERRIDE = None
_BLOCK_N_BWD_OVERRIDE = None


def _block_n(hidden, n):
    # Batch-tile size, swept on v5e at H=256. The backward's scoped-VMEM
    # working set scales with BN*H (double-buffered [1, BN, 4H] streams +
    # [BN, 4H] fp32 gate intermediates): BN*H >= 256k blows the 16MB limit
    # (~27MB at H=256/BN=1024; ~25MB at H=512/BN=512), so cap BN*H at
    # 128k. Between 256 and 512 at H=256 the ISOLATED module bench favors
    # 256 at N=8192 (6.2 vs 8.3 ms, benchmarks/lstm_bench.py
    # --sweep-block) but INSIDE the full PPO update BN=512 is consistently
    # ~2% faster end-to-end (3-trial A/B at the headline bench shape) —
    # trust the in-context number; 256 only for small batches where 512
    # would mostly be padding.
    if _BLOCK_N_OVERRIDE is not None:
        return _BLOCK_N_OVERRIDE
    cap = min(512, max(128, (128 * 1024) // max(hidden, 1)))
    return min(cap, 256) if n <= 256 else cap


def _block_n_bwd(hidden, n):
    """Backward-specific batch tile (VERDICT r4 item 5 / TODO r5 #2).

    The backward runs 3 MXU matmuls per step (gate remat, dgates @ Wr^T,
    the fused dWr epilogue) against the forward's 1, so its compute/
    stream balance could prefer its own tile. Defaults to the shared
    tile; sweep results in docs/kernels.md (round 5)."""
    if _BLOCK_N_BWD_OVERRIDE is not None:
        return _BLOCK_N_BWD_OVERRIDE
    return _block_n(hidden, n)


def lstm_supported(hidden, dtype):
    """Whether the fused kernel can serve this layer shape."""
    return hidden % 128 == 0 and dtype in (jnp.float32, jnp.bfloat16)


def _fwd_kernel(xp_ref, keep_ref, wr_ref, b_ref, c0_ref, h0_ref,
                ys_ref, cs_ref, c_scr, h_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        c_scr[...] = c0_ref[...]
        h_scr[...] = h0_ref[...]

    f32 = jnp.float32
    gates = (
        xp_ref[0].astype(f32)
        + jnp.dot(h_scr[...], wr_ref[...], preferred_element_type=f32)
        + b_ref[...].astype(f32)
    )
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    new_c = (jax.nn.sigmoid(gf) * c_scr[...].astype(f32)
             + jax.nn.sigmoid(gi) * jnp.tanh(gg))
    new_h = jax.nn.sigmoid(go) * jnp.tanh(new_c)

    new_c = new_c.astype(ys_ref.dtype)
    new_h = new_h.astype(ys_ref.dtype)
    ys_ref[0] = new_h
    cs_ref[0] = new_c

    # Clear-on-done AFTER emitting the step's output (step-then-reset, the
    # rollout engine's ordering). keep block is [1, BN, 1]; drop the time
    # axis for a [BN, 1] column that row-masks the carry. (Compare in fp32:
    # Mosaic has no bf16 vector cmpf.)
    keep = keep_ref[0].astype(f32) > 0.5
    zero = jnp.zeros((), ys_ref.dtype)
    c_scr[...] = jnp.where(keep, new_c, zero)
    h_scr[...] = jnp.where(keep, new_h, zero)


def _bwd_kernel(T, xp_ref, dys_ref, cs_ref, ysp_ref, csp_ref, keepp_ref,
                wr_ref, b_ref, c0_ref, h0_ref,
                dxp_ref, dh0_ref, dc0_ref, dwr_ref, db_ref, dh_scr, dc_scr):
    it = pl.program_id(1)
    b = pl.program_id(0)
    t = T - 1 - it  # actual time step

    @pl.when(it == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    # The weight-grad accumulators map every grid step to block (0, 0), so
    # Mosaic keeps them resident in VMEM for the whole kernel and writes
    # them back once; zero them on the very first step.
    @pl.when(jnp.logical_and(b == 0, it == 0))
    def _():
        dwr_ref[...] = jnp.zeros_like(dwr_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    f32 = jnp.float32
    dt = dxp_ref.dtype
    zero = jnp.zeros((), dt)

    # Rematerialize the step's inputs: the carry INTO step t is the cleared
    # state after step t-1 (or the unmasked initial state at t == 0).
    # (fp32 compare: Mosaic has no bf16 vector cmpf.)
    keep_prev = keepp_ref[0].astype(f32) > 0.5
    h_in = jnp.where(t == 0, h0_ref[...],
                     jnp.where(keep_prev, ysp_ref[0], zero))
    c_in = jnp.where(t == 0, c0_ref[...],
                     jnp.where(keep_prev, csp_ref[0], zero))

    gates = (
        xp_ref[0].astype(f32)
        + jnp.dot(h_in, wr_ref[...], preferred_element_type=f32)
        + b_ref[...].astype(f32)
    )
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    si = jax.nn.sigmoid(gi)
    sf = jax.nn.sigmoid(gf)
    tg = jnp.tanh(gg)
    so = jax.nn.sigmoid(go)
    tanh_c = jnp.tanh(cs_ref[0].astype(f32))

    dh_total = dys_ref[0].astype(f32) + dh_scr[...]
    dc_total = dc_scr[...] + dh_total * so * (1.0 - tanh_c * tanh_c)

    d_i = dc_total * tg * si * (1.0 - si)
    d_f = dc_total * c_in.astype(f32) * sf * (1.0 - sf)
    d_g = dc_total * si * (1.0 - tg * tg)
    d_o = dh_total * tanh_c * so * (1.0 - so)
    dgates = jnp.concatenate([d_i, d_f, d_g, d_o], axis=-1).astype(dt)
    dxp_ref[0] = dgates

    # Weight-grad epilogue fused into the step: dWr += h_in^T @ dgates and
    # db += sum(dgates) accumulate in fp32 VMEM, saving XLA's separate
    # pass that re-streamed the h sequence and dgates from HBM
    # (VERDICT r2 next-round item 4b). h_in and dgates are already live
    # here; the extra [H, BN] x [BN, 4H] contraction rides the MXU.
    dwr_ref[...] += lax.dot_general(
        h_in.astype(dt), dgates,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    # db accumulator is (8, 4H) for tiling; every row carries the same
    # partial sum and the caller reads row 0.
    db_ref[...] += jnp.broadcast_to(
        jnp.sum(dgates.astype(f32), axis=0, keepdims=True), db_ref.shape)

    # Grad through the recurrent matmul and the cell state chain.
    dh_prev = lax.dot_general(
        dgates, wr_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dc_prev = dc_total * sf

    @pl.when(t == 0)
    def _():
        dh0_ref[...] = dh_prev.astype(dh0_ref.dtype)
        dc0_ref[...] = dc_prev.astype(dc0_ref.dtype)

    # Cotangents flowing to the STORED step-(t-1) state pick up the clear
    # mask applied between the steps.
    f32zero = jnp.zeros((), f32)
    dh_scr[...] = jnp.where(keep_prev, dh_prev, f32zero)
    dc_scr[...] = jnp.where(keep_prev, dc_prev, f32zero)


def _pad_batch(arrs, n, block):
    pad = (-n) % block
    if not pad:
        return arrs, n
    out = []
    for a, axis in arrs:
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, pad)
        out.append((jnp.pad(a, widths), axis))
    return out, n + pad


def _fwd_impl(x_proj, keep, wr, bias, c0, h0, interpret):
    T, N, G4 = x_proj.shape
    H = G4 // 4
    BN = _block_n(H, N)
    keep3 = keep[..., None]  # [T, N, 1]: keeps Mosaic's (8,128) tiling legal
    (x_proj, _), (keep3, _), (c0, _), (h0, _) = _pad_batch(
        [(x_proj, 1), (keep3, 1), (c0, 0), (h0, 0)], N, BN)[0]
    n_padded = x_proj.shape[1]
    bias2d = bias.reshape(1, G4)
    dt = x_proj.dtype
    grid = (n_padded // BN, T)

    ys, cs = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BN, G4), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, BN, 1), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((1, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BN, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, BN, H), lambda b, t: (t, b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, n_padded, H), dt),
            jax.ShapeDtypeStruct((T, n_padded, H), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((BN, H), dt),
            pltpu.VMEM((BN, H), dt),
        ],
        interpret=interpret,
    )(x_proj, keep3, wr, bias2d, c0, h0)
    return ys[:, :N], cs[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def lstm_sequence(x_proj, keep, wr, bias, c0, h0, interpret=False):
    """Fused LSTM over time. All operands in the storage/compute dtype.

    x_proj: [T, N, 4H] pre-projected inputs (input matmul hoisted by the
            caller, gate order (i, f, g, o) along the last axis)
    keep:   [T, N] float mask; 0.0 clears the carry AFTER step t
    wr:     [H, 4H] recurrent kernel;  bias: [4H]
    c0/h0:  [N, H] initial carry
    returns ys: [T, N, H] per-step hidden outputs (pre-clear)
    """
    ys, _ = _fwd_impl(x_proj, keep, wr, bias, c0, h0, interpret)
    return ys


def _lstm_seq_fwd(x_proj, keep, wr, bias, c0, h0, interpret):
    ys, cs = _fwd_impl(x_proj, keep, wr, bias, c0, h0, interpret)
    return ys, (x_proj, keep, wr, bias, c0, h0, ys, cs)


def _lstm_seq_bwd(interpret, residuals, dys):
    x_proj, keep, wr, bias, c0, h0, ys, cs = residuals
    T, N, G4 = x_proj.shape
    H = G4 // 4
    BN = _block_n_bwd(H, N)
    keep3 = keep[..., None]  # [T, N, 1]
    padded, n_padded = _pad_batch(
        [(x_proj, 1), (keep3, 1), (c0, 0), (h0, 0), (ys, 1), (cs, 1),
         (dys, 1)], N, BN)
    (x_proj, _), (keep3, _), (c0, _), (h0, _), (ys, _), (cs, _), \
        (dys, _) = padded
    bias2d = bias.reshape(1, G4)
    dt = x_proj.dtype
    grid = (n_padded // BN, T)

    tmap3 = lambda b, t: (T - 1 - t, b, 0)
    pmap3 = lambda b, t: (jnp.maximum(T - 2 - t, 0), b, 0)

    dxp, dh0, dc0, dwr, db8 = pl.pallas_call(
        functools.partial(_bwd_kernel, T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BN, G4), tmap3),
            pl.BlockSpec((1, BN, H), tmap3),
            pl.BlockSpec((1, BN, H), tmap3),
            pl.BlockSpec((1, BN, H), pmap3),
            pl.BlockSpec((1, BN, H), pmap3),
            pl.BlockSpec((1, BN, 1),
                         lambda b, t: (jnp.maximum(T - 2 - t, 0), b, 0)),
            pl.BlockSpec((H, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((1, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BN, G4), tmap3),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
            pl.BlockSpec((H, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((8, G4), lambda b, t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, n_padded, G4), dt),
            jax.ShapeDtypeStruct((n_padded, H), c0.dtype),
            jax.ShapeDtypeStruct((n_padded, H), c0.dtype),
            jax.ShapeDtypeStruct((H, G4), jnp.float32),
            jax.ShapeDtypeStruct((8, G4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BN, H), jnp.float32),
            pltpu.VMEM((BN, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, dys, cs, ys, cs, keep3, wr, bias2d, c0, h0)

    dxp = dxp[:, :N]
    dh0 = dh0[:N]
    dc0 = dc0[:N]

    # Weight grads came out of the kernel's fused epilogue (fp32 VMEM
    # accumulators); padded batch rows contribute zero because their
    # dgates are identically zero (zero-padded dys and carries).
    dwr = dwr.astype(wr.dtype)
    db = db8[0].astype(bias.dtype)
    dkeep = jnp.zeros_like(keep)
    return dxp, dkeep, dwr, db, dc0, dh0


lstm_sequence.defvjp(_lstm_seq_fwd, _lstm_seq_bwd)


# ---------------------------------------------------------------------------
# Input-projection-fused variant: stream x [T, N, F] and do x @ Wi in-kernel
# ---------------------------------------------------------------------------
#
# The hoisted input projection materializes x_proj [T, N, 4H] in HBM (write
# + fwd read + bwd read) and its backward materializes the dxp cotangent
# (write + read) — ~5 x 268 MB of HBM traffic at the headline bench shape,
# attributed at 2.05 ms (fusion.667) + part of the dxp matmuls in the
# round-4 donated XProf trace. This variant streams the 4x-smaller x blocks
# instead, computes xp = round(x @ Wi) in-kernel (identical rounding to the
# hoisted bf16 Dense, so the math is bit-identical to lstm_sequence on the
# projected inputs), emits dx = dgates @ Wi^T directly, and accumulates
# dWi += x^T @ dgates in a fused fp32 VMEM epilogue next to dWr/db.


def lstm_proj_supported(in_features, hidden, dtype):
    """Whether the projection-fused kernel can serve this layer shape.

    F caps at 4H so the resident Wi block and the [BN, F] streams stay
    within the same VMEM budget the plain kernel was tuned for."""
    return (lstm_supported(hidden, dtype)
            and in_features % 128 == 0
            and in_features <= 4 * hidden)


def _fwd_proj_kernel(x_ref, keep_ref, wi_ref, wr_ref, b_ref, c0_ref, h0_ref,
                     ys_ref, cs_ref, c_scr, h_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        c_scr[...] = c0_ref[...]
        h_scr[...] = h0_ref[...]

    f32 = jnp.float32
    dt = ys_ref.dtype
    # Same rounding point as the hoisted bf16 Dense: fp32-accumulated
    # matmul rounded to the storage dtype BEFORE the fp32 gate math, so
    # this kernel is bit-identical to lstm_sequence(x @ Wi).
    xp = jnp.dot(x_ref[0], wi_ref[...],
                 preferred_element_type=f32).astype(dt)
    gates = (
        xp.astype(f32)
        + jnp.dot(h_scr[...], wr_ref[...], preferred_element_type=f32)
        + b_ref[...].astype(f32)
    )
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    new_c = (jax.nn.sigmoid(gf) * c_scr[...].astype(f32)
             + jax.nn.sigmoid(gi) * jnp.tanh(gg))
    new_h = jax.nn.sigmoid(go) * jnp.tanh(new_c)

    new_c = new_c.astype(dt)
    new_h = new_h.astype(dt)
    ys_ref[0] = new_h
    cs_ref[0] = new_c

    keep = keep_ref[0].astype(f32) > 0.5
    zero = jnp.zeros((), dt)
    c_scr[...] = jnp.where(keep, new_c, zero)
    h_scr[...] = jnp.where(keep, new_h, zero)


def _bwd_proj_kernel(T, x_ref, dys_ref, cs_ref, ysp_ref, csp_ref, keepp_ref,
                     wi_ref, wr_ref, b_ref, c0_ref, h0_ref,
                     dx_ref, dh0_ref, dc0_ref, dwi_ref, dwr_ref, db_ref,
                     dh_scr, dc_scr):
    it = pl.program_id(1)
    b = pl.program_id(0)
    t = T - 1 - it

    @pl.when(it == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    @pl.when(jnp.logical_and(b == 0, it == 0))
    def _():
        dwi_ref[...] = jnp.zeros_like(dwi_ref)
        dwr_ref[...] = jnp.zeros_like(dwr_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    f32 = jnp.float32
    dt = dx_ref.dtype
    zero = jnp.zeros((), dt)

    keep_prev = keepp_ref[0].astype(f32) > 0.5
    h_in = jnp.where(t == 0, h0_ref[...],
                     jnp.where(keep_prev, ysp_ref[0], zero))
    c_in = jnp.where(t == 0, c0_ref[...],
                     jnp.where(keep_prev, csp_ref[0], zero))

    x_t = x_ref[0]
    xp = jnp.dot(x_t, wi_ref[...], preferred_element_type=f32).astype(dt)
    gates = (
        xp.astype(f32)
        + jnp.dot(h_in, wr_ref[...], preferred_element_type=f32)
        + b_ref[...].astype(f32)
    )
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    si = jax.nn.sigmoid(gi)
    sf = jax.nn.sigmoid(gf)
    tg = jnp.tanh(gg)
    so = jax.nn.sigmoid(go)
    tanh_c = jnp.tanh(cs_ref[0].astype(f32))

    dh_total = dys_ref[0].astype(f32) + dh_scr[...]
    dc_total = dc_scr[...] + dh_total * so * (1.0 - tanh_c * tanh_c)

    d_i = dc_total * tg * si * (1.0 - si)
    d_f = dc_total * c_in.astype(f32) * sf * (1.0 - sf)
    d_g = dc_total * si * (1.0 - tg * tg)
    d_o = dh_total * tanh_c * so * (1.0 - so)
    dgates = jnp.concatenate([d_i, d_f, d_g, d_o], axis=-1).astype(dt)

    # dx = dgates @ Wi^T — the 4x-smaller cotangent leaves the kernel
    # already projected; XLA's separate [T*N,4H] @ [4H,F] pass disappears.
    dx_ref[0] = lax.dot_general(
        dgates, wi_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32).astype(dt)

    # Fused weight-grad epilogues (fp32 VMEM accumulators).
    dwi_ref[...] += lax.dot_general(
        x_t, dgates,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dwr_ref[...] += lax.dot_general(
        h_in.astype(dt), dgates,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    db_ref[...] += jnp.broadcast_to(
        jnp.sum(dgates.astype(f32), axis=0, keepdims=True), db_ref.shape)

    dh_prev = lax.dot_general(
        dgates, wr_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dc_prev = dc_total * sf

    @pl.when(t == 0)
    def _():
        dh0_ref[...] = dh_prev.astype(dh0_ref.dtype)
        dc0_ref[...] = dc_prev.astype(dc0_ref.dtype)

    f32zero = jnp.zeros((), f32)
    dh_scr[...] = jnp.where(keep_prev, dh_prev, f32zero)
    dc_scr[...] = jnp.where(keep_prev, dc_prev, f32zero)


def _fwd_proj_impl(x, keep, wi, wr, bias, c0, h0, interpret):
    T, N, F = x.shape
    H = wr.shape[0]
    G4 = 4 * H
    BN = _block_n(H, N)
    keep3 = keep[..., None]
    (x, _), (keep3, _), (c0, _), (h0, _) = _pad_batch(
        [(x, 1), (keep3, 1), (c0, 0), (h0, 0)], N, BN)[0]
    n_padded = x.shape[1]
    bias2d = bias.reshape(1, G4)
    dt = x.dtype
    grid = (n_padded // BN, T)

    ys, cs = pl.pallas_call(
        _fwd_proj_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BN, F), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, BN, 1), lambda b, t: (t, b, 0)),
            pl.BlockSpec((F, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((H, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((1, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BN, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, BN, H), lambda b, t: (t, b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, n_padded, H), dt),
            jax.ShapeDtypeStruct((T, n_padded, H), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((BN, H), dt),
            pltpu.VMEM((BN, H), dt),
        ],
        interpret=interpret,
    )(x, keep3, wi, wr, bias2d, c0, h0)
    return ys[:, :N], cs[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def lstm_sequence_proj(x, keep, wi, wr, bias, c0, h0, interpret=False):
    """Projection-fused LSTM over time: ``lstm_sequence(x @ Wi, ...)`` with
    the input projection computed inside the kernel (identical rounding).

    x:  [T, N, F] layer inputs;  wi: [F, 4H] packed input kernel
    (other operands/returns as ``lstm_sequence``)
    """
    ys, _ = _fwd_proj_impl(x, keep, wi, wr, bias, c0, h0, interpret)
    return ys


def _lstm_proj_fwd(x, keep, wi, wr, bias, c0, h0, interpret):
    ys, cs = _fwd_proj_impl(x, keep, wi, wr, bias, c0, h0, interpret)
    return ys, (x, keep, wi, wr, bias, c0, h0, ys, cs)


def _lstm_proj_bwd(interpret, residuals, dys):
    x, keep, wi, wr, bias, c0, h0, ys, cs = residuals
    T, N, F = x.shape
    H = wr.shape[0]
    G4 = 4 * H
    BN = _block_n_bwd(H, N)
    keep3 = keep[..., None]
    padded, n_padded = _pad_batch(
        [(x, 1), (keep3, 1), (c0, 0), (h0, 0), (ys, 1), (cs, 1),
         (dys, 1)], N, BN)
    (x, _), (keep3, _), (c0, _), (h0, _), (ys, _), (cs, _), \
        (dys, _) = padded
    bias2d = bias.reshape(1, G4)
    dt = x.dtype
    grid = (n_padded // BN, T)

    tmap3 = lambda b, t: (T - 1 - t, b, 0)
    pmap3 = lambda b, t: (jnp.maximum(T - 2 - t, 0), b, 0)

    dx, dh0, dc0, dwi, dwr, db8 = pl.pallas_call(
        functools.partial(_bwd_proj_kernel, T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BN, F), tmap3),
            pl.BlockSpec((1, BN, H), tmap3),
            pl.BlockSpec((1, BN, H), tmap3),
            pl.BlockSpec((1, BN, H), pmap3),
            pl.BlockSpec((1, BN, H), pmap3),
            pl.BlockSpec((1, BN, 1),
                         lambda b, t: (jnp.maximum(T - 2 - t, 0), b, 0)),
            pl.BlockSpec((F, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((H, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((1, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BN, F), tmap3),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
            pl.BlockSpec((BN, H), lambda b, t: (b, 0)),
            pl.BlockSpec((F, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((H, G4), lambda b, t: (0, 0)),
            pl.BlockSpec((8, G4), lambda b, t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, n_padded, F), dt),
            jax.ShapeDtypeStruct((n_padded, H), c0.dtype),
            jax.ShapeDtypeStruct((n_padded, H), c0.dtype),
            jax.ShapeDtypeStruct((F, G4), jnp.float32),
            jax.ShapeDtypeStruct((H, G4), jnp.float32),
            jax.ShapeDtypeStruct((8, G4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BN, H), jnp.float32),
            pltpu.VMEM((BN, H), jnp.float32),
        ],
        interpret=interpret,
    )(x, dys, cs, ys, cs, keep3, wi, wr, bias2d, c0, h0)

    dx = dx[:, :N]
    dh0 = dh0[:N]
    dc0 = dc0[:N]

    dwi = dwi.astype(wi.dtype)
    dwr = dwr.astype(wr.dtype)
    db = db8[0].astype(bias.dtype)
    dkeep = jnp.zeros_like(keep)
    return dx, dkeep, dwi, dwr, db, dc0, dh0


lstm_sequence_proj.defvjp(_lstm_proj_fwd, _lstm_proj_bwd)


def lstm_sequence_proj_reference(x, keep, wi, wr, bias, c0, h0, unroll=1):
    """jnp twin: hoisted projection (same rounding) + the sequence twin."""
    x_proj = jnp.dot(
        x, wi, preferred_element_type=jnp.float32).astype(x.dtype)
    return lstm_sequence_reference(x_proj, keep, wr, bias, c0, h0,
                                   unroll=unroll)


def lstm_sequence_reference(x_proj, keep, wr, bias, c0, h0, unroll=1):
    """jnp twin: identical math and rounding points, as a lax.scan."""
    f32 = jnp.float32
    dt = x_proj.dtype
    b32 = bias.astype(f32)

    def step(carry, inputs):
        c, h = carry  # storage dtype, already cleared
        xp, k = inputs
        gates = (xp.astype(f32)
                 + jnp.dot(h, wr, preferred_element_type=f32) + b32)
        gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
        new_c = (jax.nn.sigmoid(gf) * c.astype(f32)
                 + jax.nn.sigmoid(gi) * jnp.tanh(gg))
        new_h = jax.nn.sigmoid(go) * jnp.tanh(new_c)
        new_c = new_c.astype(dt)
        new_h = new_h.astype(dt)
        mask = k[:, None] > 0.5
        zero = jnp.zeros((), dt)
        return ((jnp.where(mask, new_c, zero),
                 jnp.where(mask, new_h, zero)), new_h)

    _, ys = lax.scan(step, (c0, h0), (x_proj, keep), unroll=unroll)
    return ys
