"""Small numeric utilities (reference: utils.py:15-40)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp


@dataclass
class TypedShape:
    """(shape, dtype) pair used to describe preallocated buffers."""

    shape: Tuple[int, ...]
    dtype: Any


def symlog(x):
    """Symmetric log squashing used by DreamerV3-style critics."""
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x):
    """Inverse of :func:`symlog`."""
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def convert_float_leaves(data, desired_dtype):
    """Cast every floating-point leaf of a pytree to ``desired_dtype``."""

    def convert(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype=desired_dtype)
        return x

    return jax.tree.map(convert, data)
