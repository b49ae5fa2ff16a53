"""Pallas-TPU fused GAE reverse scan.

The jnp implementation (ops/gae.py) lowers the recurrence to a length-T XLA
while-loop of small elementwise ops, each reading/writing [N] rows from HBM.
This kernel instead keeps a whole [T, BLOCK_N] tile resident in VMEM and runs
the backward recurrence in-register, one grid program per agent block — a
single HBM round trip for the entire scan. (North-star kernel list:
BASELINE.json "Pallas kernels for GAE scans".)

Ships with a jnp reference twin (``gae_reference``) used in tests; CPU/GPU
backends fall back to it automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

BLOCK_N = 512


def _gae_kernel(gamma, lam, rewards_ref, values_ref, notdones_ref,
                bootstrap_ref, out_ref):
    T = rewards_ref.shape[0]

    def body(i, carry):
        next_adv, next_val = carry
        t = T - 1 - i
        nd = notdones_ref[t, :]
        r = rewards_ref[t, :]
        v = values_ref[t, :]

        masked_next_val = next_val * nd
        masked_next_adv = next_adv * nd
        td_err = r + gamma * masked_next_val - v
        adv = td_err + gamma * lam * masked_next_adv

        out_ref[t, :] = adv
        return adv, v

    bootstrap = bootstrap_ref[0, :]
    lax.fori_loop(0, T, body, (jnp.zeros_like(bootstrap), bootstrap))


@functools.partial(jax.jit, static_argnums=(0, 1, 6))
def gae_pallas(gamma, lam, rewards, values, dones, bootstrap,
               interpret=False):
    """advantages[T, N] from rewards/values/dones [T, N] + bootstrap [N]."""
    T, N = rewards.shape
    notdones = jnp.where(dones, 0.0, 1.0).astype(jnp.float32)

    pad = (-N) % BLOCK_N
    if pad:
        pad2 = [(0, 0), (0, pad)]
        rewards = jnp.pad(rewards, pad2)
        values = jnp.pad(values, pad2)
        notdones = jnp.pad(notdones, pad2)
        bootstrap = jnp.pad(bootstrap, [(0, pad)])
    n_padded = N + pad
    # 2-D bootstrap keeps the Mosaic operand layout lane-tiled like the rest.
    bootstrap2d = bootstrap.reshape(1, n_padded)

    grid = (n_padded // BLOCK_N,)
    out = pl.pallas_call(
        functools.partial(_gae_kernel, gamma, lam),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, BLOCK_N), lambda i: (0, i)),
            pl.BlockSpec((T, BLOCK_N), lambda i: (0, i)),
            pl.BlockSpec((T, BLOCK_N), lambda i: (0, i)),
            pl.BlockSpec((1, BLOCK_N), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((T, BLOCK_N), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((T, n_padded), jnp.float32),
        interpret=interpret,
    )(rewards.astype(jnp.float32), values.astype(jnp.float32), notdones,
      bootstrap2d.astype(jnp.float32))

    return out[:, :N]


def gae_reference(gamma, lam, rewards, values, dones, bootstrap):
    """jnp twin of the kernel (identical math; used for tests/fallback)."""

    def step(carry, inputs):
        next_adv, next_val = carry
        d, r, v = inputs
        nv = jnp.where(d, 0.0, next_val)
        na = jnp.where(d, 0.0, next_adv)
        td = r + gamma * nv - v
        adv = td + gamma * lam * na
        return (adv, v), adv

    (_, _), advantages = lax.scan(
        step, (jnp.zeros_like(bootstrap), bootstrap),
        (dones, rewards.astype(jnp.float32), values.astype(jnp.float32)),
        reverse=True)
    return advantages


def compute_advantages_pallas(gamma, lam, rewards, values, dones,
                              bootstrap_values, interpret=False):
    """Drop-in for ops.gae.compute_advantages ([C, T/C, P, B, 1] layout)."""
    C, TC, P, B = dones.shape[:4]
    T, N = C * TC, P * B
    adv = gae_pallas(
        gamma, lam,
        rewards.reshape(T, N), values.reshape(T, N),
        dones.reshape(T, N), bootstrap_values.reshape(N),
        interpret)
    return adv.reshape(C, TC, P, B, 1)
