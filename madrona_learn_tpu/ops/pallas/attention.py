"""Pallas-TPU fused multi-head attention for entity sets.

Equivalent capability to the reference's Triton flash-attention fork
(reference: pallas/attention.py:34-567), specialized for this framework's
workload: attention over O(10-100) *entities*, not long sequences. The whole
(seq x seq) score matrix for a batch tile fits in VMEM, so instead of an
online-softmax flash loop the kernel fuses QK^T -> softmax -> PV in a single
pass per (batch-block, head) program — one HBM round trip, full MXU tiles.

Padding support: entity axes are padded to sublane multiples by the model
layer; ``valid_len`` masks the padded keys with a -inf score bias (the
reference's Triton kernel instead relies on its caller's pad-to-16 and has
no mask operand, reference: models.py:74-89). ``valid_len`` is static — the
pad amount is a shape property, so no dynamic masking machinery is needed.

``mha``'s backward uses JAX autodiff through the jnp twin; for the routed
entity counts recompute-in-bwd is bandwidth-optimal. ``mha_flash`` has a
flash-structured custom backward (the hand-written bwd the reference keeps
for long sequences, reference: pallas/attention.py:322-537): the forward
saves the per-row logsumexp, and two Mosaic kernels accumulate dK/dV over
query blocks and dQ over KV blocks without ever materializing the
[B, H, S, S] score tensor.

``mha_reference`` is the jnp twin used for tests and fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 8

_NEG_INF = -1e30


def _mha_kernel(scale, valid_len, seq_len, q_ref, k_ref, v_ref, o_ref):
    # refs: [BLOCK_B, S, D] for one head.
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [BLOCK_B, S, S]

    if valid_len < seq_len:
        key_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        scores = jnp.where(key_idx < valid_len, scores, _NEG_INF)

    weights = jax.nn.softmax(scores, axis=-1)

    out = jax.lax.dot_general(
        weights, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("valid_len", "interpret"))
def mha(q, k, v, valid_len=None, interpret=False):
    """q, k, v: [B, S, H, D] -> [B, S, H, D] fused attention output.

    ``valid_len`` (static): only the first ``valid_len`` key/value entities
    participate; the rest are masked out of the softmax. Output rows past
    ``valid_len`` are garbage — callers slice them off (they correspond to
    padding queries).

    Differentiable: forward runs the fused kernel; backward recomputes
    through the jnp twin (``pallas_call`` has no reverse-mode rule). At
    entity scale the recompute is cheaper than materializing softmax
    residuals — the reference hand-writes a bwd kernel only because its
    sequences are long (reference: pallas/attention.py:322-537).
    """
    return _mha(q, k, v, valid_len, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mha(q, k, v, valid_len, interpret):
    return _mha_impl(q, k, v, valid_len, interpret)


def _mha_fwd_rule(q, k, v, valid_len, interpret):
    return _mha_impl(q, k, v, valid_len, interpret), (q, k, v)


def _mha_bwd_rule(valid_len, interpret, residuals, g):
    # Backward recomputes through the jnp reference while the primal ran
    # the Mosaic kernel: the returned gradient is for a forward whose
    # rounding (XLA fusion order) differs from the kernel's (MXU
    # accumulation order) by O(eps * S) — negligible at entity scale
    # (S <= 256 on the routed path) and covered by the fwd-vs-twin
    # tolerances in tests/test_pallas_kernels.py. At this scale the
    # recompute is bandwidth-optimal; ``mha_flash`` has its own
    # flash-structured backward (``_mha_flash_bwd_rule``) that never
    # materializes the [B, H, S, S] score tensor.
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_: mha_reference(q_, k_, v_, valid_len=valid_len),
        q, k, v)
    return vjp(g)


_mha.defvjp(_mha_fwd_rule, _mha_bwd_rule)


def _mha_impl(q, k, v, valid_len, interpret):
    B, S, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    if valid_len is None:
        valid_len = S
    assert 0 < valid_len <= S

    # [B, S, H, D] -> [B*H pseudo-batch, S, D] keeps a clean 3-D kernel.
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, S, D)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    pad = (-(B * H)) % BLOCK_B
    if pad:
        qb = jnp.pad(qb, [(0, pad), (0, 0), (0, 0)])
        kb = jnp.pad(kb, [(0, pad), (0, 0), (0, 0)])
        vb = jnp.pad(vb, [(0, pad), (0, 0), (0, 0)])
    n = B * H + pad

    grid = (n // BLOCK_B,)
    spec = pl.BlockSpec((BLOCK_B, S, D), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale, valid_len, S),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, S, D), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:B * H].reshape(B, H, S, D).transpose(0, 2, 1, 3)
    return out


# --- flash variant: KV-chunked online softmax for large entity counts ----
#
# The single-pass kernel above holds the whole [BLOCK_B, S, S] score matrix
# in VMEM; past ~128 entities that loses to XLA (benchmarks/
# attention_bench.py). This variant is the classic flash loop — the
# reference's Triton kernel's structure (reference: pallas/attention.py:
# 34-150) re-expressed as a Mosaic grid: kv chunks innermost, the
# (max, sum, acc) online-softmax state in VMEM scratch across the kv axis.

FLASH_BLOCK_S = 128


def _mha_flash_kernel(scale, valid_len, q_ref, k_ref, v_ref, o_ref, lse_ref,
                      acc_scr, m_scr, l_scr):
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)
    f32 = jnp.float32

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[...].astype(f32)  # [BB, BQ, D]
    k = k_ref[...].astype(f32)  # [BB, BK, D]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    ) * scale  # [BB, BQ, BK]

    key_idx = ki * FLASH_BLOCK_S + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 2)
    s = jnp.where(key_idx < valid_len, s, _NEG_INF)

    m_prev = m_scr[...]                               # [BB, BQ]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_new[..., None])
    alpha = jnp.exp(m_prev - m_new)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1)
    acc_scr[...] = (
        acc_scr[...] * alpha[..., None]
        + jax.lax.dot_general(
            p, v_ref[...].astype(f32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32))
    m_scr[...] = m_new

    @pl.when(ki == num_k - 1)
    def _():
        o_ref[...] = (
            acc_scr[...] / l_scr[...][..., None]).astype(o_ref.dtype)
        # Per-query-row logsumexp (natural log) — the flash backward's
        # softmax residual: p = exp(s - lse) rebuilds each probability
        # tile without renormalization.
        lse_ref[...] = m_scr[...] + jnp.log(l_scr[...])


def _mha_flash_impl(q, k, v, valid_len, interpret, return_lse=False):
    # The [n, s_pad] f32 lse output is computed and written even when the
    # caller discards it (return_lse=False, the inference/primal path):
    # XLA cannot DCE a pallas_call output, and splitting two kernel
    # variants to gate it is not warranted — the extra write is ~1/(2D)
    # of the output traffic (D=32: ~1.6%), and the round-4 constant-token
    # forward sweep that set the >256 routing (flash fwd parity with XLA
    # within process noise at S>=512 — BASELINE.md) was measured WITH
    # this write, so its cost is already priced into the routing
    # decision.
    B, S, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    if valid_len is None:
        valid_len = S
    # Same contract as mha: valid_len == 0 would make every score _NEG_INF
    # and silently return a uniform average of V instead of failing.
    assert 0 < valid_len <= S, (valid_len, S)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, S, D)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    pad_b = (-(B * H)) % BLOCK_B
    pad_s = (-S) % FLASH_BLOCK_S
    widths = [(0, pad_b), (0, pad_s), (0, 0)]
    if pad_b or pad_s:
        qb = jnp.pad(qb, widths)
        kb = jnp.pad(kb, widths)
        vb = jnp.pad(vb, widths)
    n = B * H + pad_b
    s_pad = S + pad_s
    bs = FLASH_BLOCK_S

    grid = (n // BLOCK_B, s_pad // bs, s_pad // bs)  # kv innermost
    out, lse = pl.pallas_call(
        functools.partial(_mha_flash_kernel, scale, valid_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_B, bs, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((BLOCK_B, bs, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((BLOCK_B, bs, D), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_B, bs, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((BLOCK_B, bs), lambda b, qi, ki: (b, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, s_pad, D), q.dtype),
            jax.ShapeDtypeStruct((n, s_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_B, bs, D), jnp.float32),
            pltpu.VMEM((BLOCK_B, bs), jnp.float32),
            pltpu.VMEM((BLOCK_B, bs), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:B * H, :S].reshape(B, H, S, D).transpose(0, 2, 1, 3)
    if return_lse:
        return out, lse[:B * H, :S].reshape(B, H, S)
    return out


def _mha_flash_bwd_dkdv_kernel(scale, valid_len, q_ref, do_ref, k_ref,
                               v_ref, lse_ref, delta_ref, dk_ref, dv_ref):
    qi = pl.program_id(2)
    ki = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(qi == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[...].astype(f32)      # [BB, BQ, D]
    k = k_ref[...].astype(f32)      # [BB, BK, D]
    v = v_ref[...].astype(f32)      # [BB, BK, D]
    do = do_ref[...].astype(f32)    # [BB, BQ, D]
    lse = lse_ref[...]              # [BB, BQ] f32
    delta = delta_ref[...]          # [BB, BQ] f32

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    ) * scale  # [BB, BQ, BK]
    key_idx = ki * FLASH_BLOCK_S + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 2)
    s = jnp.where(key_idx < valid_len, s, _NEG_INF)
    p = jnp.exp(s - lse[..., None])  # [BB, BQ, BK]; masked keys -> 0

    # dV += P^T @ dO  (contract the query axis)
    dv_ref[...] += jax.lax.dot_general(
        p, do,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32)
    # dP = dO @ V^T; dS = P * (dP - delta); dK += dS^T @ Q * scale
    dp = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)  # [BB, BQ, BK]
    ds = p * (dp - delta[..., None]) * scale
    dk_ref[...] += jax.lax.dot_general(
        ds, q,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32)


def _mha_flash_bwd_dq_kernel(scale, valid_len, q_ref, do_ref, k_ref,
                             v_ref, lse_ref, delta_ref, dq_ref):
    ki = pl.program_id(2)
    f32 = jnp.float32

    @pl.when(ki == 0)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    q = q_ref[...].astype(f32)
    k = k_ref[...].astype(f32)
    v = v_ref[...].astype(f32)
    do = do_ref[...].astype(f32)
    lse = lse_ref[...]
    delta = delta_ref[...]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    ) * scale
    key_idx = ki * FLASH_BLOCK_S + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 2)
    s = jnp.where(key_idx < valid_len, s, _NEG_INF)
    p = jnp.exp(s - lse[..., None])

    dp = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)
    ds = p * (dp - delta[..., None]) * scale
    # dQ += dS @ K
    dq_ref[...] += jax.lax.dot_general(
        ds, k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mha_flash(q, k, v, valid_len, interpret):
    return _mha_flash_impl(q, k, v, valid_len, interpret)


def _mha_flash_fwd_rule(q, k, v, valid_len, interpret):
    out, lse = _mha_flash_impl(q, k, v, valid_len, interpret,
                               return_lse=True)
    return out, (q, k, v, out, lse)


def _mha_flash_bwd_rule(valid_len, interpret, residuals, g):
    """Flash-structured backward: never materializes [B, H, S, S].

    FlashAttention-2 scheme over the same KV-chunked grid as the forward
    (the structure of the reference's Triton bwd, reference:
    pallas/attention.py:322-537): ``delta = rowsum(dO * O)`` precomputed,
    each probability tile rebuilt as ``exp(s - lse)`` from the forward's
    saved logsumexp, then two kernels — dK/dV accumulate over query
    blocks (q innermost, f32 output block revisited in VMEM) and dQ
    accumulates over KV blocks (kv innermost). Zero-padded dO rows make
    padded/garbage query rows contribute exactly zero (their ``delta`` is
    also zero), so the pad regions need no extra masking.
    """
    q, k, v, out, lse = residuals
    B, S, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    vl = S if valid_len is None else valid_len

    # delta_i = sum_d dO_id * O_id  (f32, per query row)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # [B, S, H]

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, S, D)

    qb, kb, vb, gb = to_bh(q), to_bh(k), to_bh(v), to_bh(g)
    lse_b = lse.reshape(B * H, S)
    delta_b = delta.transpose(0, 2, 1).reshape(B * H, S)

    pad_b = (-(B * H)) % BLOCK_B
    pad_s = (-S) % FLASH_BLOCK_S
    if pad_b or pad_s:
        widths3 = [(0, pad_b), (0, pad_s), (0, 0)]
        widths2 = [(0, pad_b), (0, pad_s)]
        qb = jnp.pad(qb, widths3)
        kb = jnp.pad(kb, widths3)
        vb = jnp.pad(vb, widths3)
        gb = jnp.pad(gb, widths3)
        lse_b = jnp.pad(lse_b, widths2)
        delta_b = jnp.pad(delta_b, widths2)
    n = B * H + pad_b
    s_pad = S + pad_s
    bs = FLASH_BLOCK_S

    qspec = pl.BlockSpec((BLOCK_B, bs, D), lambda b, ki, qi: (b, qi, 0))
    kspec = pl.BlockSpec((BLOCK_B, bs, D), lambda b, ki, qi: (b, ki, 0))
    rowspec = pl.BlockSpec((BLOCK_B, bs), lambda b, ki, qi: (b, qi))
    dk, dv = pl.pallas_call(
        functools.partial(_mha_flash_bwd_dkdv_kernel, scale, vl),
        grid=(n // BLOCK_B, s_pad // bs, s_pad // bs),  # q innermost
        in_specs=[qspec, qspec, kspec, kspec, rowspec, rowspec],
        out_specs=[kspec, kspec],
        out_shape=[jax.ShapeDtypeStruct((n, s_pad, D), jnp.float32)] * 2,
        interpret=interpret,
    )(qb, gb, kb, vb, lse_b, delta_b)

    qspec2 = pl.BlockSpec((BLOCK_B, bs, D), lambda b, qi, ki: (b, qi, 0))
    kspec2 = pl.BlockSpec((BLOCK_B, bs, D), lambda b, qi, ki: (b, ki, 0))
    rowspec2 = pl.BlockSpec((BLOCK_B, bs), lambda b, qi, ki: (b, qi))
    dq = pl.pallas_call(
        functools.partial(_mha_flash_bwd_dq_kernel, scale, vl),
        grid=(n // BLOCK_B, s_pad // bs, s_pad // bs),  # kv innermost
        in_specs=[qspec2, qspec2, kspec2, kspec2, rowspec2, rowspec2],
        out_specs=qspec2,
        out_shape=jax.ShapeDtypeStruct((n, s_pad, D), jnp.float32),
        interpret=interpret,
    )(qb, gb, kb, vb, lse_b, delta_b)

    def from_bh(x, dtype):
        return (x[:B * H, :S].reshape(B, H, S, D)
                .transpose(0, 2, 1, 3).astype(dtype))

    return (from_bh(dq, q.dtype), from_bh(dk, k.dtype),
            from_bh(dv, v.dtype))


_mha_flash.defvjp(_mha_flash_fwd_rule, _mha_flash_bwd_rule)


@functools.partial(jax.jit, static_argnames=("valid_len", "interpret"))
def mha_flash(q, k, v, valid_len=None, interpret=False):
    """Flash (online-softmax, KV-chunked) attention: [B, S, H, D] -> same.

    Same contract as ``mha``; use for large entity counts where the
    single-pass kernel's [S, S] score tile stops paying (see
    benchmarks/attention_bench.py for the measured crossover).
    """
    return _mha_flash(q, k, v, valid_len, interpret)


def mha_reference(q, k, v, valid_len=None):
    """jnp twin: [B, S, H, D] attention with f32 softmax + key masking."""
    S = q.shape[1]
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum(
        "bshd,bthd->bhst", q.astype(jnp.float32), k.astype(jnp.float32))
    scores = scores * scale
    if valid_len is not None and valid_len < S:
        key_mask = jnp.arange(S) < valid_len
        scores = jnp.where(key_mask[None, None, None, :], scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", weights, v.astype(jnp.float32))
    return out.astype(q.dtype)
