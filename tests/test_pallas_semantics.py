"""Pallas-call semantics the framework's kernels rely on.

The reference vendors a 1,791-line fork of JAX's pallas test suite
(reference: pallas/test.py:145-1424) because its Triton lowering fork could
silently break pallas_call basics. We don't fork the lowering, but the same
insurance matters: these tests pin down every pallas_call behavior our
Mosaic kernels depend on — grid/BlockSpec tiling, in-kernel control flow,
accumulator dtypes, iota masking, vmap over kernels, custom_vjp gradients —
in interpret mode so they run everywhere, plus on hardware via
scripts/validate_tpu.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental import pallas as pl


def _call(kernel, out_shape, *args, **kwargs):
    return pl.pallas_call(
        kernel, out_shape=out_shape, interpret=True, **kwargs)(*args)


# -- pallas_call basics -------------------------------------------------------

def test_elementwise_kernel():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    out = _call(kernel, jax.ShapeDtypeStruct((8, 8), jnp.float32), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 1)


def test_grid_blockspec_tiling():
    """Each grid program sees exactly its [BLOCK, D] tile."""
    BLOCK = 4

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)
        o_ref[...] = x_ref[...] + jnp.float32(i)

    x = jnp.zeros((16, 8), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((BLOCK, 8), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BLOCK, 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((16, 8), jnp.float32),
        interpret=True)(x)
    want = np.repeat(np.arange(4, dtype=np.float32), BLOCK)[:, None]
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(want, (16, 8)))


def test_multiple_inputs_outputs():
    def kernel(a_ref, b_ref, s_ref, d_ref):
        a = a_ref[...]
        b = b_ref[...]
        s_ref[...] = a + b
        d_ref[...] = a - b

    a = jnp.arange(32, dtype=jnp.float32).reshape(4, 8)
    b = jnp.ones((4, 8), jnp.float32)
    s, d = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((4, 8), jnp.float32),
                   jax.ShapeDtypeStruct((4, 8), jnp.float32)),
        interpret=True)(a, b)
    np.testing.assert_allclose(np.asarray(s), np.asarray(a + b))
    np.testing.assert_allclose(np.asarray(d), np.asarray(a - b))


def test_static_closure_parameters():
    """Static python scalars bound via functools.partial (the pattern every
    kernel here uses for gamma/lam/scale/valid_len)."""
    def kernel(scale, x_ref, o_ref):
        o_ref[...] = x_ref[...] * scale

    x = jnp.ones((8, 8), jnp.float32)
    for scale in (0.5, 2.0):
        out = _call(functools.partial(kernel, scale),
                    jax.ShapeDtypeStruct((8, 8), jnp.float32), x)
        np.testing.assert_allclose(np.asarray(out), scale)


# -- in-kernel control flow ---------------------------------------------------

def test_fori_loop_reverse_recurrence():
    """The GAE kernel's shape: a reverse fori_loop carrying state across
    rows of a VMEM-resident tile."""
    T, N = 16, 8

    def kernel(x_ref, o_ref):
        def body(i, carry):
            t = T - 1 - i
            carry = carry * 0.5 + x_ref[t, :]
            o_ref[t, :] = carry
            return carry

        lax.fori_loop(0, T, body, jnp.zeros((N,), jnp.float32))

    x = jnp.asarray(np.random.default_rng(0).normal(size=(T, N)), jnp.float32)
    out = _call(kernel, jax.ShapeDtypeStruct((T, N), jnp.float32), x)

    want = np.zeros((T, N), np.float32)
    carry = np.zeros(N, np.float32)
    for t in range(T - 1, -1, -1):
        carry = carry * 0.5 + np.asarray(x)[t]
        want[t] = carry
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_cond_in_kernel():
    def kernel(x_ref, o_ref):
        total = jnp.sum(x_ref[...])
        o_ref[...] = lax.cond(
            total > 0, lambda v: v + 1.0, lambda v: v - 1.0, x_ref[...])

    x = jnp.ones((4, 8), jnp.float32)
    out = _call(kernel, jax.ShapeDtypeStruct((4, 8), jnp.float32), x)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_when_guard():
    """pl.when: predicated writes (grid-position-dependent epilogues)."""
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[0, :] = jnp.zeros_like(o_ref[0, :])

    x = jnp.ones((8, 8), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec((4, 8), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((4, 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
        interpret=True)(x)
    want = np.ones((8, 8), np.float32)
    want[0] = 0
    np.testing.assert_allclose(np.asarray(out), want)


# -- dtypes and masking -------------------------------------------------------

def test_bf16_inputs_f32_accumulation():
    """preferred_element_type drives f32 accumulation from bf16 operands —
    the Mosaic-native capability that obviates the reference's entire Triton
    lowering fork (reference: pallas/lowering_hack.py)."""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(16, 64)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(64, 16)), jnp.bfloat16)
    out = _call(kernel, jax.ShapeDtypeStruct((16, 16), jnp.float32), a, b)
    want = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)
    assert out.dtype == jnp.float32


def test_broadcasted_iota_masking():
    """The masked-MHA pattern: iota along one axis of a >=2D tile."""
    def kernel(valid, x_ref, o_ref):
        idx = lax.broadcasted_iota(jnp.int32, x_ref.shape, 1)
        o_ref[...] = jnp.where(idx < valid, x_ref[...], -1e30)

    x = jnp.ones((4, 8), jnp.float32)
    out = _call(functools.partial(kernel, 5),
                jax.ShapeDtypeStruct((4, 8), jnp.float32), x)
    np_out = np.asarray(out)
    assert (np_out[:, :5] == 1.0).all() and (np_out[:, 5:] == -1e30).all()


# -- composition with JAX transforms -----------------------------------------

def test_vmap_over_pallas_call():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def f(x):
        return _call(kernel, jax.ShapeDtypeStruct((8, 8), jnp.float32), x)

    x = jnp.arange(3 * 64, dtype=jnp.float32).reshape(3, 8, 8)
    out = jax.vmap(f)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)


def test_jit_nesting_and_constant_folding():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    @jax.jit
    def g(x):
        y = _call(kernel, jax.ShapeDtypeStruct((8, 8), jnp.float32), x)
        return y * 3.0

    x = jnp.zeros((8, 8), jnp.float32)
    np.testing.assert_allclose(np.asarray(g(x)), 3.0)


def test_mha_grad_matches_reference_grad():
    """custom_vjp kernels: gradient of the fused MHA must equal the jnp
    twin's gradient (the masked case included)."""
    from madrona_learn_tpu.ops.pallas.attention import mha, mha_reference

    rng = np.random.default_rng(2)
    shape = (2, 16, 2, 32)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)

    for valid in (None, 11):
        def loss_kernel(q, k, v):
            out = mha(q, k, v, valid_len=valid, interpret=True)
            sl = out if valid is None else out[:, :valid]
            return jnp.sum(jnp.tanh(sl))

        def loss_ref(q, k, v):
            out = mha_reference(q, k, v, valid_len=valid)
            sl = out if valid is None else out[:, :valid]
            return jnp.sum(jnp.tanh(sl))

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


def test_gae_kernel_vs_scan_under_vmap():
    """The Pallas GAE wrapper composes with vmap over a leading policy axis
    exactly like the jnp scan it replaces."""
    from madrona_learn_tpu.ops.pallas.gae import gae_pallas, gae_reference

    rng = np.random.default_rng(3)
    P, T, N = 3, 8, 64
    r = jnp.asarray(rng.normal(size=(P, T, N)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(P, T, N)), jnp.float32)
    d = jnp.asarray(rng.random((P, T, N)) < 0.2)
    b = jnp.asarray(rng.normal(size=(P, N)), jnp.float32)

    got = jax.vmap(
        lambda r, v, d, b: gae_pallas(0.99, 0.95, r, v, d, b,
                                      interpret=True))(r, v, d, b)
    want = jax.vmap(
        lambda r, v, d, b: gae_reference(0.99, 0.95, r, v, d, b))(r, v, d, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# -- grid patterns the fused sequence kernels rely on -------------------------

def test_scratch_carry_across_innermost_grid_axis():
    """VMEM scratch persists across the innermost grid axis (the fused
    LSTM/GRU kernels keep their recurrent carry there): a running-sum
    kernel over a (batch_tiles, T) grid must accumulate along T."""
    from jax.experimental.pallas import tpu as pltpu

    B, T, F = 16, 5, 128
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(T, B, F)), jnp.float32)

    def kernel(x_ref, o_ref, acc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        acc[...] += x_ref[0]
        o_ref[0] = acc[...]

    out = pl.pallas_call(
        kernel,
        grid=(2, T),
        in_specs=[pl.BlockSpec((1, B // 2, F), lambda b, t: (t, b, 0))],
        out_specs=pl.BlockSpec((1, B // 2, F), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, F), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B // 2, F), jnp.float32)],
        interpret=True,
    )(x)
    want = jnp.cumsum(x, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_reversed_time_index_map():
    """Index maps may run the innermost grid axis backwards through the
    array (the fused backward kernels read t = T-1-it): an exclusive
    reverse cumsum written through a reversed map must match the jnp one."""
    from jax.experimental.pallas import tpu as pltpu

    B, T, F = 8, 6, 128
    x = jnp.asarray(
        np.random.default_rng(12).normal(size=(T, B, F)), jnp.float32)

    def kernel(T_, x_ref, o_ref, acc):
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        o_ref[0] = acc[...]          # exclusive: before adding step t
        acc[...] += x_ref[0]

    tmap = lambda b, t: (T - 1 - t, b, 0)
    out = pl.pallas_call(
        functools.partial(kernel, T),
        grid=(1, T),
        in_specs=[pl.BlockSpec((1, B, F), tmap)],
        out_specs=pl.BlockSpec((1, B, F), tmap),
        out_shape=jax.ShapeDtypeStruct((T, B, F), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, F), jnp.float32)],
        interpret=True,
    )(x)
    # out[t] = sum of x[t+1:]
    want = jnp.flip(jnp.cumsum(jnp.flip(x, 0), axis=0), 0) - x
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_multi_output_pallas_call_with_mixed_specs():
    """One pallas_call may emit outputs with different block shapes/maps
    (the LSTM backward emits per-step dgates plus a once-per-tile dh0)."""
    from jax.experimental.pallas import tpu as pltpu

    B, T, F = 8, 4, 128
    x = jnp.asarray(
        np.random.default_rng(13).normal(size=(T, B, F)), jnp.float32)

    def kernel(x_ref, per_step_ref, total_ref, acc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        per_step_ref[0] = x_ref[0] * 2.0
        acc[...] += x_ref[0]

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            total_ref[...] = acc[...]

    per_step, total = pl.pallas_call(
        kernel,
        grid=(1, T),
        in_specs=[pl.BlockSpec((1, B, F), lambda b, t: (t, b, 0))],
        out_specs=[
            pl.BlockSpec((1, B, F), lambda b, t: (t, b, 0)),
            pl.BlockSpec((B, F), lambda b, t: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, F), jnp.float32),
            jax.ShapeDtypeStruct((B, F), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, F), jnp.float32)],
        interpret=True,
    )(x)
    np.testing.assert_allclose(np.asarray(per_step), np.asarray(x * 2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(total),
                               np.asarray(jnp.sum(x, axis=0)),
                               rtol=1e-5, atol=1e-5)


def test_flash_online_softmax_state_machine():
    """The mha_flash online-softmax update (running max/sum/acc rescaling
    across kv chunks) matches a direct softmax when composed chunk by
    chunk in plain jnp — pins the algebra the kernel implements."""
    rng = np.random.default_rng(14)
    S, D = 256, 32
    s = jnp.asarray(rng.normal(size=(S,)), jnp.float32) * 5
    v = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)

    m = jnp.float32(-1e30)
    l = jnp.float32(0.0)
    acc = jnp.zeros((D,), jnp.float32)
    for start in range(0, S, 64):
        sc = s[start:start + 64]
        m_new = jnp.maximum(m, jnp.max(sc))
        p = jnp.exp(sc - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p)
        acc = acc * alpha + p @ v[start:start + 64]
        m = m_new
    got = acc / l
    want = jax.nn.softmax(s) @ v
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
