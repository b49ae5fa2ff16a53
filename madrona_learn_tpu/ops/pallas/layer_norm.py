"""Pallas-TPU fused layer norm with custom VJP.

Equivalent capability to the reference's Triton layer-norm fork (reference:
pallas/layer_norm.py:30-291), re-written as a Mosaic kernel: the forward
fuses mean/var/normalize/affine in one VMEM pass and stashes (mu, rsigma);
the backward runs one kernel for dx and accumulates dw/db partials per row
block (summed outside). ``layer_norm_reference`` is the jnp twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

BLOCK_ROWS = 256


def _fwd_kernel(eps, x_ref, w_ref, b_ref, y_ref, mu_ref, rsigma_ref):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    centered = x - mu
    var = jnp.mean(centered * centered, axis=1, keepdims=True)
    rsigma = lax.rsqrt(var + eps)

    y = centered * rsigma * w_ref[...].astype(jnp.float32) + \
        b_ref[...].astype(jnp.float32)

    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu
    rsigma_ref[...] = rsigma


def _bwd_kernel(x_ref, w_ref, mu_ref, rsigma_ref, dy_ref,
                dx_ref, dw_ref, db_ref):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    mu = mu_ref[...]
    rsigma = rsigma_ref[...]

    xhat = (x - mu) * rsigma
    wdy = w * dy

    # dx = rsigma * (wdy - mean(wdy) - xhat * mean(wdy * xhat))
    D = x.shape[1]
    c1 = jnp.sum(xhat * wdy, axis=1, keepdims=True) / D
    c2 = jnp.sum(wdy, axis=1, keepdims=True) / D
    dx = (wdy - c2 - xhat * c1) * rsigma

    dx_ref[...] = dx.astype(dx_ref.dtype)

    # The TPU grid runs sequentially, so all programs accumulate dw/db into
    # one shared output block (initialized by the first program).
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[0:1, :] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[0:1, :] += jnp.sum(dy, axis=0, keepdims=True)


def _pad_rows(x, block):
    n = x.shape[0]
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0)])
    return x, n, n + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm(x, weight, bias, eps=1e-6, interpret=False):
    """x: [N, D]; weight/bias: [D]. Returns [N, D] in x.dtype."""
    y, _, _ = _layer_norm_fwd_impl(x, weight, bias, eps, interpret)
    return y


def _layer_norm_fwd_impl(x, weight, bias, eps, interpret):
    x_p, n, n_padded = _pad_rows(x, BLOCK_ROWS)
    D = x.shape[1]
    grid = (n_padded // BLOCK_ROWS,)

    y, mu, rsigma = pl.pallas_call(
        functools.partial(_fwd_kernel, eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, D), lambda i: (i, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, D), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_padded, D), x.dtype),
            jax.ShapeDtypeStruct((n_padded, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_padded, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x_p, weight, bias)

    return y[:n], mu, rsigma


def _layer_norm_fwd(x, weight, bias, eps, interpret):
    y, mu, rsigma = _layer_norm_fwd_impl(x, weight, bias, eps, interpret)
    return y, (x, weight, mu, rsigma)


def _layer_norm_bwd(eps, interpret, residuals, dy):
    x, weight, mu, rsigma = residuals
    x_p, n, n_padded = _pad_rows(x, BLOCK_ROWS)
    dy_p, _, _ = _pad_rows(dy, BLOCK_ROWS)
    D = x.shape[1]
    grid = (n_padded // BLOCK_ROWS,)

    dx, dw_partial, db_partial = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, D), lambda i: (i, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_ROWS, D), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, D), lambda i: (i, 0)),
            pl.BlockSpec((8, D), lambda i: (0, 0)),
            pl.BlockSpec((8, D), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_padded, D), x.dtype),
            jax.ShapeDtypeStruct((8, D), jnp.float32),
            jax.ShapeDtypeStruct((8, D), jnp.float32),
        ],
        interpret=interpret,
    )(x_p, weight, mu, rsigma, dy_p)

    dw = dw_partial[0].astype(weight.dtype)
    db = db_partial[0].astype(weight.dtype)
    return dx[:n], dw, db


layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


def layer_norm_reference(x, weight, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)
