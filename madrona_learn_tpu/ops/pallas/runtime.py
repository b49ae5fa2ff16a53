"""Shared routing gate for every Pallas kernel in the framework.

One function decides, at trace time, whether the compiled Mosaic kernels
can serve the current computation; every kernel call site (LSTM/GRU
sequence passes, entity attention, layer norm, the GAE scan) consults it
and falls back to its jnp twin otherwise. Model-path call sites import the
``models.attention._pallas_backend_ok`` alias so tests/benchmarks keep a
single monkeypatch point.
"""

from __future__ import annotations

import os

import jax


def pallas_backend_ok() -> bool:
    """Whether the compiled Pallas kernels can serve the current trace.

    Three conditions, each load-bearing:

    1. A real TPU backend. An explicitly pinned ``jax_default_device``
       decides the platform check (``jax.default_backend()`` reports the
       primary backend even when computation is pinned elsewhere, e.g.
       CPU-mesh dryruns) but grants nothing else — the multi-device
       checks below still apply; a pinned-to-one-chip serving process on
       a multi-chip host opts in via ``MADRONA_LEARN_TPU_FORCE_PALLAS=1``.
    2. Otherwise: single-device process, OR the trace is inside a
       shard_map that is manual over EVERY mesh axis. Mosaic custom calls
       cannot be automatically partitioned — a multi-device GSPMD jit
       containing one fails to compile ("wrap the call in a shard_map",
       jax/_src/tpu_custom_call.py) — so on multi-chip meshes callers
       fall back to the jnp twins (same math, partitionable) unless the
       step runs under a fully-manual shard_map.
    3. ``MADRONA_LEARN_TPU_FORCE_PALLAS=1`` overrides the multi-device
       checks for single-device jits inside multi-chip processes — e.g.
       serving pinned to one chip of a pod via ``jax_default_device``.

    A pinned ``jax_default_device`` no longer short-circuits the
    multi-device checks: pinning selects where *unsharded* computations
    run, but an explicitly multi-device GSPMD jit traced with a pinned
    default device would still route Mosaic calls into a program that
    fails to partition. So a pinned TPU device must additionally satisfy
    the same single-device / fully-manual-mesh / FORCE_PALLAS conditions.
    """
    dev = jax.config.jax_default_device
    if dev is not None and getattr(dev, "platform", None) != "tpu":
        return False
    if dev is None and jax.default_backend() != "tpu":
        return False
    if jax.device_count() == 1:
        return True
    if os.environ.get("MADRONA_LEARN_TPU_FORCE_PALLAS") == "1":
        return True
    mesh = jax.sharding.get_abstract_mesh()
    manual = set(getattr(mesh, "manual_axes", ()))
    return bool(mesh.axis_names) and manual == set(mesh.axis_names)
