"""Pallas-TPU fused multi-head attention for entity sets.

Equivalent capability to the reference's Triton flash-attention fork
(reference: pallas/attention.py:34-567), specialized for this framework's
workload: attention over O(10-100) *entities*, not long sequences. The whole
(seq x seq) score matrix for a batch tile fits in VMEM, so instead of an
online-softmax flash loop the kernel fuses QK^T -> softmax -> PV in a single
pass per (batch-block, head) program — one HBM round trip, full MXU tiles.

Backward uses JAX autodiff through the same fused computation via
``jax.custom_vjp``-free default differentiation of the reference twin; for
training, the entity counts are small enough that recompute-in-bwd is
bandwidth-optimal (the reference keeps a hand-written bwd kernel because its
seqs are long).

``mha_reference`` is the jnp twin used for tests and fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_B = 8


def _mha_kernel(scale, q_ref, k_ref, v_ref, o_ref):
    # refs: [BLOCK_B, S, D] for one head.
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [BLOCK_B, S, S]

    weights = jax.nn.softmax(scores, axis=-1)

    out = jax.lax.dot_general(
        weights, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3,))
def mha(q, k, v, interpret=False):
    """q, k, v: [B, S, H, D] -> [B, S, H, D] fused attention output."""
    B, S, H, D = q.shape
    scale = 1.0 / (D ** 0.5)

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
        functools.partial(_mha_kernel, scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, S, D), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:B * H].reshape(B, H, S, D).transpose(0, 2, 1, 3)
    return out


def mha_reference(q, k, v):
    """jnp twin: [B, S, H, D] attention with f32 softmax."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum(
        "bshd,bthd->bhst", q.astype(jnp.float32), k.astype(jnp.float32))
    weights = jax.nn.softmax(scores * scale, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", weights, v.astype(jnp.float32))
    return out.astype(q.dtype)
