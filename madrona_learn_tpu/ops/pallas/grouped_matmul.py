"""Pallas-TPU grouped matmul: per-chunk policy weights without gathers.

Multi-policy chunked inference computes ``y[c] = x[c] @ W[policy_of[c]]``
for each policy-pure chunk ``c``. The XLA formulation gathers a full weight copy
per chunk (``W[idx]`` materializes ``[num_chunks, in, out]`` — hundreds of MB
per step at population scale) before batched matmuls. This kernel instead
prefetches the chunk→policy index vector (scalar prefetch) and lets each
grid program DMA its policy's weight tile straight out of the stacked
``[P, in, out]`` array: weight traffic drops from O(num_chunks · |W|) to the
tiles actually touched.

This is the same structure as MoE grouped GEMMs (experts = policies,
routing = matchmaking). jnp twin: ``grouped_matmul_reference``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, x_ref, w_ref, o_ref):
    # x_ref: [1, C, IN] block for chunk i; w_ref: [1, IN, OUT] for its policy.
    o_ref[...] = jax.lax.dot_general(
        x_ref[0], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[None].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3,))
def grouped_matmul(x, weights, chunk_policy, interpret=False):
    """x: [B, C, IN]; weights: [P, IN, OUT]; chunk_policy: [B] int32.

    Returns [B, C, OUT] with ``out[i] = x[i] @ weights[chunk_policy[i]]``.
    The OUT dim is tiled so (x, w, out) blocks fit VMEM with double
    buffering at any width.
    """
    B, C, IN = x.shape
    P, _, OUT = weights.shape

    tile_out = OUT
    while (C * IN + IN * tile_out + C * tile_out) * 4 * 2 > 12 * 2**20:
        assert tile_out % 2 == 0
        tile_out //= 2
    tile_out = max(tile_out, min(OUT, 128))
    num_out_tiles = -(OUT // -tile_out)
    assert OUT % tile_out == 0, (OUT, tile_out)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, num_out_tiles),
        in_specs=[
            pl.BlockSpec((1, C, IN), lambda i, j, idx_ref: (i, 0, 0)),
            pl.BlockSpec(
                (1, IN, tile_out), lambda i, j, idx_ref: (idx_ref[i], 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, C, tile_out), lambda i, j, idx_ref: (i, 0, j)),
    )

    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, OUT), x.dtype),
        interpret=interpret,
    )(chunk_policy.astype(jnp.int32), x, weights)


def grouped_matmul_reference(x, weights, chunk_policy):
    """jnp twin: gather weights per chunk, batched matmul."""
    w = weights[chunk_policy]  # [B, IN, OUT]
    return jax.lax.dot_general(
        x.astype(jnp.float32), w.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
    ).astype(x.dtype)
