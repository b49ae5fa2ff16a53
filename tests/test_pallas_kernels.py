"""Pallas TPU kernels vs their jnp reference twins (interpret mode on CPU).

Mirrors the reference's kernel test strategy (reference: pallas/test.py:
1476-1788): forward/backward comparisons against plain-jnp references with
tolerance asserts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_learn_tpu.ops.gae import compute_advantages
from madrona_learn_tpu.ops.pallas.attention import mha, mha_reference
from madrona_learn_tpu.ops.pallas.gae import (
    compute_advantages_pallas,
    gae_pallas,
    gae_reference,
)
from madrona_learn_tpu.ops.pallas.layer_norm import (
    layer_norm,
    layer_norm_reference,
)


def test_gae_kernel_matches_reference():
    rng = np.random.default_rng(0)
    T, N = 32, 700  # deliberately not a BLOCK_N multiple
    rewards = jnp.asarray(rng.normal(size=(T, N)), jnp.float32)
    values = jnp.asarray(rng.normal(size=(T, N)), jnp.float32)
    dones = jnp.asarray(rng.random((T, N)) < 0.1)
    bootstrap = jnp.asarray(rng.normal(size=(N,)), jnp.float32)

    got = gae_pallas(0.99, 0.95, rewards, values, dones, bootstrap,
                     interpret=True)
    want = gae_reference(0.99, 0.95, rewards, values, dones, bootstrap)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gae_kernel_matches_trainer_scan():
    rng = np.random.default_rng(3)
    C, TC, P, B = 2, 8, 2, 96
    shape = (C, TC, P, B, 1)
    rewards = jnp.asarray(rng.normal(size=shape), jnp.float32)
    values = jnp.asarray(rng.normal(size=shape), jnp.float32)
    dones = jnp.asarray(rng.random(shape) < 0.15)
    bootstrap = jnp.asarray(rng.normal(size=(P, B, 1)), jnp.float32)

    got = compute_advantages_pallas(
        0.99, 0.9, rewards, values, dones, bootstrap, interpret=True)
    want = compute_advantages(0.99, 0.9, rewards, values, dones, bootstrap)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_layer_norm_forward(dtype):
    rng = np.random.default_rng(1)
    N, D = 300, 128
    x = jnp.asarray(rng.normal(size=(N, D)), dtype)
    w = jnp.asarray(rng.normal(size=(D,)), jnp.float32) + 1.0
    b = jnp.asarray(rng.normal(size=(D,)), jnp.float32)

    got = layer_norm(x, w, b, 1e-6, True)
    want = layer_norm_reference(x, w, b)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol)


def test_layer_norm_backward():
    rng = np.random.default_rng(2)
    N, D = 200, 64
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D,)), jnp.float32) + 1.0
    b = jnp.asarray(rng.normal(size=(D,)), jnp.float32)

    def loss_kernel(x, w, b):
        return jnp.sum(jnp.sin(layer_norm(x, w, b, 1e-6, True)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.sin(layer_norm_reference(x, w, b)))

    gx, gw, gb = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, w, b)
    rx, rw, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)

    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(4, 8, 2, 32), (3, 17, 4, 64)])
def test_mha_matches_reference(shape):
    rng = np.random.default_rng(4)
    B, S, H, D = shape
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)

    got = mha(q, k, v, interpret=True)
    want = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,valid", [((4, 16, 2, 32), 11),
                                         ((3, 8, 4, 64), 5)])
def test_mha_masked_matches_reference(shape, valid):
    """Static valid_len masking: padded keys must not influence the valid
    rows, and the kernel must agree with a fully-masked jnp attention."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)

    got = mha(q, k, v, valid_len=valid, interpret=True)
    want = mha_reference(q, k, v, valid_len=valid)
    np.testing.assert_allclose(np.asarray(got[:, :valid]),
                               np.asarray(want[:, :valid]),
                               rtol=1e-5, atol=1e-5)

    # Poisoning the padded K/V slots must not change valid outputs.
    k_poison = k.at[:, valid:].set(1e6)
    v_poison = v.at[:, valid:].set(-1e6)
    got_p = mha(q, k_poison, v_poison, valid_len=valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p[:, :valid]),
                               np.asarray(got[:, :valid]),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("shape,valid", [
    ((2, 256, 2, 32), None),    # multi-chunk KV, no mask
    ((2, 256, 2, 32), 200),     # mask inside the last chunk
    ((1, 300, 4, 64), 300),     # S not a chunk multiple (padded keys masked)
    ((3, 130, 2, 32), 97),      # q/k pad + mask across chunk boundary
])
def test_mha_flash_matches_reference(shape, valid):
    from madrona_learn_tpu.ops.pallas.attention import mha_flash

    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)

    got = mha_flash(q, k, v, valid_len=valid, interpret=True)
    want = mha_reference(q, k, v, valid_len=valid)
    vl = valid if valid is not None else shape[1]
    np.testing.assert_allclose(np.asarray(got[:, :vl]),
                               np.asarray(want[:, :vl]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,valid", [
    ((2, 256, 2, 32), 250),     # mask inside the last chunk
    ((2, 256, 2, 32), None),    # multi-chunk KV, no mask
    ((1, 300, 4, 64), 300),     # S not a chunk multiple (padded keys)
    ((3, 130, 2, 32), 97),      # q/k pad + mask across chunk boundary
])
def test_mha_flash_backward_matches_reference(shape, valid):
    """mha_flash has a flash-structured backward (two Mosaic kernels, dK/dV
    over query blocks + dQ over KV blocks, probabilities rebuilt from the
    forward's saved logsumexp — never materializing [B, H, S, S]). Checked
    against the jnp twin's autodiff, including key-mask and chunk-padding
    boundaries where padded rows must contribute exactly zero."""
    from madrona_learn_tpu.ops.pallas.attention import mha_flash

    rng = np.random.default_rng(9)
    vl = valid if valid is not None else shape[1]
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    probe = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v)
            return jnp.sum(out[:, :vl] * probe[:, :vl])
        return f

    got = jax.grad(loss(lambda q, k, v: mha_flash(
        q, k, v, valid_len=valid, interpret=True)), argnums=(0, 1, 2))(
        q, k, v)
    want = jax.grad(loss(lambda q, k, v: mha_reference(
        q, k, v, valid_len=valid)), argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
        assert np.all(np.isfinite(np.asarray(g))), name


def test_mha_flash_backward_is_flash_structured():
    """The grad trace must contain exactly three pallas_calls (fwd,
    dK/dV, dQ) and no materialized [.., S, S] score tensor outside them —
    i.e. the backward is genuinely flash-structured, not the jnp-twin
    recompute the single-pass ``mha`` uses."""
    from madrona_learn_tpu.ops.pallas.attention import mha_flash

    B, S, H, D = 2, 256, 2, 32
    q = jnp.zeros((B, S, H, D), jnp.float32)
    f = jax.grad(
        lambda q, k, v: jnp.sum(mha_flash(q, k, v, valid_len=250,
                                          interpret=True)),
        argnums=(0, 1, 2))
    jaxpr = jax.make_jaxpr(f)(q, q, q)

    s = str(jaxpr)
    assert s.count("pallas_call") == 3, s.count("pallas_call")

    # No eqn output anywhere in the trace materializes an [..., S, S]
    # score tensor (jaxpr array types print with brackets — f32[2,2,256,256]
    # — so string-matching parenthesized shape tuples would miss a
    # dot_general score; walk the avals instead. The kernels' inner tiles
    # never appear as eqn outputs).
    def walk(jx):
        for eqn in jx.eqns:
            for v in eqn.outvars:
                aval = getattr(v, "aval", None)
                shape = getattr(aval, "shape", ())
                assert not (len(shape) >= 2
                            and shape[-1] == S and shape[-2] == S), (
                    eqn.primitive, shape)
            for sub in jax.core.jaxprs_in_params(eqn.params):
                walk(sub)
    walk(jaxpr.jaxpr)


def test_entity_net_pallas_path_matches_xla():
    """EntitySelfAttentionNet with use_pallas=True (padded 12-entity set)
    must match the flax attention path on identical params."""
    from flax.core import FrozenDict

    from madrona_learn_tpu.models import EntitySelfAttentionNet

    rng = np.random.default_rng(8)
    obs = FrozenDict({
        "self": jnp.asarray(rng.normal(size=(64, 16)), jnp.float32),
        "allies": jnp.asarray(rng.normal(size=(64, 5, 12)), jnp.float32),
        "enemies": jnp.asarray(rng.normal(size=(64, 6, 12)), jnp.float32),
    })

    kwargs = dict(num_embed_channels=32, num_out_channels=64, num_heads=2,
                  dtype=jnp.float32)
    net_xla = EntitySelfAttentionNet(**kwargs, use_pallas=False)
    net_pl = EntitySelfAttentionNet(**kwargs, use_pallas=True)

    import madrona_learn_tpu.models.attention as mattn
    import madrona_learn_tpu.ops.pallas.attention as pattn
    orig = pattn.mha
    orig_ok = mattn._pallas_backend_ok
    pattn.mha = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    mattn._pallas_backend_ok = lambda: True  # force the kernel path on CPU
    try:
        params = net_xla.init(jax.random.PRNGKey(0), obs, train=False)
        out_xla = net_xla.apply(params, obs, train=False)
        out_pl = net_pl.apply(params, obs, train=False)
        # The update pass (train=True) must route through the SAME kernel
        # as the rollout pass — PPO ratios start at 1 only if the two
        # forwards agree bit-for-bit.
        out_train = net_pl.apply(
            params, obs, train=True, mutable=["batch_stats"])[0]
    finally:
        pattn.mha = orig
        mattn._pallas_backend_ok = orig_ok

    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(out_pl))

    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=2e-5, atol=2e-5)


def test_self_attention_large_set_routes_flash():
    """Entity sets past 256 route to mha_flash (round 4: its
    flash-structured backward beats XLA autodiff there), and both the
    forward and the parameter gradients must match the flax path."""
    from madrona_learn_tpu.models.attention import SelfAttention

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(4, 300, 24)), jnp.float32)

    kwargs = dict(num_heads=2, qkv_features=32, out_features=24,
                  dtype=jnp.float32)
    net_xla = SelfAttention(**kwargs, use_pallas=False)
    net_pl = SelfAttention(**kwargs, use_pallas=True)

    import madrona_learn_tpu.models.attention as mattn
    import madrona_learn_tpu.ops.pallas.attention as pattn
    orig_flash = pattn.mha_flash
    orig_mha = pattn.mha
    orig_ok = mattn._pallas_backend_ok
    flash_calls = []

    def spy_flash(*a, **kw):
        flash_calls.append(True)
        return orig_flash(*a, **{**kw, "interpret": True})

    pattn.mha_flash = spy_flash
    pattn.mha = lambda *a, **kw: orig_mha(*a, **{**kw, "interpret": True})
    mattn._pallas_backend_ok = lambda: True
    try:
        params = net_xla.init(jax.random.PRNGKey(0), x)
        out_xla = net_xla.apply(params, x)
        out_pl = net_pl.apply(params, x)
        assert flash_calls, "large set did not route through mha_flash"

        def loss(net):
            return lambda p: jnp.sum(net.apply(p, x) ** 2)

        g_xla = jax.grad(loss(net_xla))(params)
        g_pl = jax.grad(loss(net_pl))(params)
    finally:
        pattn.mha_flash = orig_flash
        pattn.mha = orig_mha
        mattn._pallas_backend_ok = orig_ok

    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=2e-5, atol=2e-5)
    flat_pl, _ = jax.tree.flatten(g_pl)
    flat_xla, _ = jax.tree.flatten(g_xla)
    for a, b in zip(flat_pl, flat_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("shape", [(8, 64, 32, 4, 128), (5, 128, 64, 3, 96)])
def test_grouped_matmul_matches_reference(shape):
    from madrona_learn_tpu.ops.pallas.grouped_matmul import (
        grouped_matmul,
        grouped_matmul_reference,
    )

    B, C, IN, P, OUT = shape
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(B, C, IN)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(P, IN, OUT)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, P, size=(B,)), jnp.int32)

    got = grouped_matmul(x, w, idx, True)
    want = grouped_matmul_reference(x, w, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# Fused LSTM sequence kernel
# ---------------------------------------------------------------------------

def _lstm_rand(seed, T, N, H, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.normal(size=(T, N, 4 * H)), dtype)
    keep = jnp.asarray(rng.random((T, N)) > 0.2, dtype)
    wr = jnp.asarray(rng.normal(size=(H, 4 * H)) / np.sqrt(H), dtype)
    b = jnp.asarray(rng.normal(size=(4 * H,)), dtype)
    c0 = jnp.asarray(rng.normal(size=(N, H)), dtype)
    h0 = jnp.asarray(rng.normal(size=(N, H)), dtype)
    return xp, keep, wr, b, c0, h0


def _gru_rand(seed, T, N, H, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.normal(size=(T, N, 3 * H)), dtype)
    keep = jnp.asarray(rng.random((T, N)) > 0.2, dtype)
    wh = jnp.asarray(rng.normal(size=(H, 3 * H)) / np.sqrt(H), dtype)
    bh = jnp.asarray(rng.normal(size=(H,)), dtype)
    h0 = jnp.asarray(rng.normal(size=(N, H)), dtype)
    return xp, keep, wh, bh, h0


@pytest.mark.parametrize("T,N,H", [(5, 70, 128), (3, 512, 128), (1, 9, 128)])
def test_gru_kernel_forward_matches_reference(T, N, H):
    from madrona_learn_tpu.ops.pallas.gru import (
        gru_sequence, gru_sequence_reference)

    args = _gru_rand(20, T, N, H)
    got = gru_sequence(*args, interpret=True)
    want = gru_sequence_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gru_kernel_backward_matches_reference():
    from madrona_learn_tpu.ops.pallas.gru import (
        gru_sequence, gru_sequence_reference)

    T, N, H = 4, 70, 128
    args = _gru_rand(21, T, N, H)
    probe = jnp.asarray(
        np.random.default_rng(22).normal(size=(T, N, H)), jnp.float32)

    def loss_kernel(xp, wh, bh, h0):
        ys = gru_sequence(xp, args[1], wh, bh, h0, True)
        return jnp.sum(ys * probe)

    def loss_ref(xp, wh, bh, h0):
        ys = gru_sequence_reference(xp, args[1], wh, bh, h0)
        return jnp.sum(ys * probe)

    diff = (args[0],) + args[2:]
    got = jax.grad(loss_kernel, argnums=tuple(range(4)))(*diff)
    want = jax.grad(loss_ref, argnums=tuple(range(4)))(*diff)
    for g, w, name in zip(got, want, ("dxp", "dwh", "dbh", "dh0")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4,
            err_msg=name)


def test_gru_module_fused_matches_stepwise():
    """GRU(use_pallas=True): the fused sequence path (jnp twin off-TPU)
    must reproduce the step-by-step path with done clears."""
    from madrona_learn_tpu.models import GRU

    dtype = jnp.float32
    N, T, H, F = 6, 12, 128, 8
    gru = GRU(num_hidden_channels=H, num_layers=2, dtype=dtype,
              use_pallas=True)

    rng = np.random.default_rng(23)
    xs = jnp.asarray(rng.normal(size=(T, N, F)), dtype)
    dones = jnp.asarray(rng.random((T, N, 1)) < 0.2)

    init_state = gru.init_recurrent_state(N)
    params = gru.init(jax.random.PRNGKey(0), init_state, xs[0], False)

    state = init_state
    outs = []
    for t in range(T):
        out, state = gru.apply(params, state, xs[t], False)
        state = gru.clear_recurrent_state(state, dones[t])
        outs.append(out)
    stepwise = jnp.stack(outs)

    seq_out = gru.apply(
        params, init_state, dones, xs, False, method="sequence")
    np.testing.assert_allclose(
        np.asarray(stepwise), np.asarray(seq_out), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("family", ["lstm", "gru"])
def test_recurrent_module_fused_matches_stepwise_bf16(family):
    """bf16 + nonzero biases: the single-step (rollout) and fused-sequence
    (update) forwards must agree bit-for-bit — rounding-point mismatches
    (e.g. an unrounded fp32 bias on one path) only surface off-f32."""
    from madrona_learn_tpu.models import GRU, LSTM

    dtype = jnp.bfloat16
    N, T, H, F = 6, 10, 128, 8
    mod = (LSTM if family == "lstm" else GRU)(
        num_hidden_channels=H, num_layers=1, dtype=dtype, use_pallas=True)

    rng = np.random.default_rng(33)
    xs = jnp.asarray(rng.normal(size=(T, N, F)), dtype)
    dones = jnp.asarray(rng.random((T, N, 1)) < 0.2)

    init_state = mod.init_recurrent_state(N)
    params = mod.init(jax.random.PRNGKey(0), init_state, xs[0], False)
    # Nonzero biases (init is zeros, which would hide rounding bugs).
    params = jax.tree.map(
        lambda l: (jnp.asarray(
            np.random.default_rng(34).normal(size=l.shape), l.dtype)
            if l.ndim == 1 else l),
        params)

    state = init_state
    outs = []
    for t in range(T):
        out, state = mod.apply(params, state, xs[t], False)
        state = mod.clear_recurrent_state(state, dones[t])
        outs.append(out)
    stepwise = jnp.stack(outs)

    seq_out = mod.apply(
        params, init_state, dones, xs, False, method="sequence")
    np.testing.assert_array_equal(np.asarray(stepwise, np.float32),
                                  np.asarray(seq_out, np.float32))


def test_gru_kernel_module_path_matches_twin():
    """Force the kernel (interpret) through the module's fused path."""
    from madrona_learn_tpu.models import GRU
    import madrona_learn_tpu.models.attention as mattn
    import madrona_learn_tpu.ops.pallas.gru as pgru

    dtype = jnp.float32
    N, T, H, F = 10, 6, 128, 16
    gru = GRU(num_hidden_channels=H, num_layers=1, dtype=dtype,
              use_pallas=True)

    rng = np.random.default_rng(24)
    xs = jnp.asarray(rng.normal(size=(T, N, F)), dtype)
    dones = jnp.asarray(rng.random((T, N, 1)) < 0.3)
    init_state = gru.init_recurrent_state(N)
    params = gru.init(jax.random.PRNGKey(1), init_state, xs[0], False)

    twin = gru.apply(params, init_state, dones, xs, False,
                     method="sequence")

    orig_seq = pgru.gru_sequence
    orig_ok = mattn._pallas_backend_ok
    pgru.gru_sequence = lambda *a, **kw: orig_seq(*a, True)
    mattn._pallas_backend_ok = lambda: True
    try:
        fused = gru.apply(params, init_state, dones, xs, False,
                          method="sequence")
    finally:
        pgru.gru_sequence = orig_seq
        mattn._pallas_backend_ok = orig_ok

    np.testing.assert_allclose(np.asarray(fused), np.asarray(twin),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T,N,H", [(5, 70, 128), (3, 512, 128), (1, 9, 128)])
def test_lstm_kernel_forward_matches_reference(T, N, H):
    from madrona_learn_tpu.ops.pallas.lstm import (
        lstm_sequence, lstm_sequence_reference)

    args = _lstm_rand(10, T, N, H)
    got = lstm_sequence(*args, interpret=True)
    want = lstm_sequence_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_lstm_kernel_backward_matches_reference():
    from madrona_learn_tpu.ops.pallas.lstm import (
        lstm_sequence, lstm_sequence_reference)

    T, N, H = 4, 70, 128
    args = _lstm_rand(11, T, N, H)
    probe = jnp.asarray(
        np.random.default_rng(12).normal(size=(T, N, H)), jnp.float32)

    def loss_kernel(xp, wr, b, c0, h0):
        ys = lstm_sequence(xp, args[1], wr, b, c0, h0, True)
        return jnp.sum(ys * probe)

    def loss_ref(xp, wr, b, c0, h0):
        ys = lstm_sequence_reference(xp, args[1], wr, b, c0, h0)
        return jnp.sum(ys * probe)

    diff = (args[0],) + args[2:]
    got = jax.grad(loss_kernel, argnums=tuple(range(5)))(*diff)
    want = jax.grad(loss_ref, argnums=tuple(range(5)))(*diff)
    for g, w, name in zip(got, want, ("dxp", "dwr", "db", "dc0", "dh0")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4,
            err_msg=name)


def _lstm_proj_rand(seed, T, N, F, H, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, N, F)), dtype)
    keep = jnp.asarray(rng.random((T, N)) > 0.2, dtype)
    wi = jnp.asarray(rng.normal(size=(F, 4 * H)) / np.sqrt(F), dtype)
    wr = jnp.asarray(rng.normal(size=(H, 4 * H)) / np.sqrt(H), dtype)
    b = jnp.asarray(rng.normal(size=(4 * H,)), dtype)
    c0 = jnp.asarray(rng.normal(size=(N, H)), dtype)
    h0 = jnp.asarray(rng.normal(size=(N, H)), dtype)
    return x, keep, wi, wr, b, c0, h0


@pytest.mark.parametrize("T,N,F,H", [(5, 70, 128, 128), (3, 260, 256, 128),
                                     (1, 9, 384, 128)])
def test_lstm_proj_kernel_forward_matches_reference(T, N, F, H):
    """Projection-fused kernel == hoisted projection + the sequence twin
    (identical rounding point), including done clears and batch padding."""
    from madrona_learn_tpu.ops.pallas.lstm import (
        lstm_sequence_proj, lstm_sequence_proj_reference)

    args = _lstm_proj_rand(30, T, N, F, H)
    got = lstm_sequence_proj(*args, interpret=True)
    want = lstm_sequence_proj_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_lstm_proj_kernel_backward_matches_reference():
    """Gradients through the projection-fused kernel — including the new
    in-kernel dWi epilogue and the directly-emitted dx — match AD through
    the twin."""
    from madrona_learn_tpu.ops.pallas.lstm import (
        lstm_sequence_proj, lstm_sequence_proj_reference)

    T, N, F, H = 4, 70, 256, 128
    args = _lstm_proj_rand(31, T, N, F, H)
    probe = jnp.asarray(
        np.random.default_rng(32).normal(size=(T, N, H)), jnp.float32)

    def loss_kernel(x, wi, wr, b, c0, h0):
        ys = lstm_sequence_proj(x, args[1], wi, wr, b, c0, h0, True)
        return jnp.sum(ys * probe)

    def loss_ref(x, wi, wr, b, c0, h0):
        ys = lstm_sequence_proj_reference(x, args[1], wi, wr, b, c0, h0)
        return jnp.sum(ys * probe)

    diff = (args[0],) + args[2:]
    got = jax.grad(loss_kernel, argnums=tuple(range(6)))(*diff)
    want = jax.grad(loss_ref, argnums=tuple(range(6)))(*diff)
    for g, w, name in zip(got, want,
                          ("dx", "dwi", "dwr", "db", "dc0", "dh0")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4,
            err_msg=name)


def test_lstm_module_fused_matches_stepwise():
    """LSTM(use_pallas=True): the fused sequence path (jnp twin off-TPU)
    must reproduce the precise-gates step-by-step path with done clears —
    the rollout/update consistency contract at the module level."""
    from madrona_learn_tpu.models import LSTM

    dtype = jnp.float32
    N, T, H, F = 6, 12, 128, 8
    lstm = LSTM(num_hidden_channels=H, num_layers=2, dtype=dtype,
                use_pallas=True)

    rng = np.random.default_rng(13)
    xs = jnp.asarray(rng.normal(size=(T, N, F)), dtype)
    dones = jnp.asarray(rng.random((T, N, 1)) < 0.2)

    init_state = lstm.init_recurrent_state(N)
    params = lstm.init(jax.random.PRNGKey(0), init_state, xs[0], False)

    state = init_state
    outs = []
    for t in range(T):
        out, state = lstm.apply(params, state, xs[t], False)
        state = lstm.clear_recurrent_state(state, dones[t])
        outs.append(out)
    stepwise = jnp.stack(outs)

    seq_out = lstm.apply(
        params, init_state, dones, xs, False, method="sequence")
    np.testing.assert_allclose(
        np.asarray(stepwise), np.asarray(seq_out), rtol=1e-5, atol=1e-5)

    # Param structure is identical with and without the flag (checkpoints
    # are interchangeable).
    params_plain = LSTM(
        num_hidden_channels=H, num_layers=2, dtype=dtype).init(
            jax.random.PRNGKey(0), init_state, xs[0], False)
    assert jax.tree.structure(params) == jax.tree.structure(params_plain)


def test_lstm_kernel_module_path_matches_twin():
    """Force the kernel (interpret) through the module's fused path."""
    from madrona_learn_tpu.models import LSTM
    import madrona_learn_tpu.models.attention as mattn
    import madrona_learn_tpu.ops.pallas.lstm as plstm

    dtype = jnp.float32
    N, T, H, F = 10, 6, 128, 16
    lstm = LSTM(num_hidden_channels=H, num_layers=1, dtype=dtype,
                use_pallas=True)

    rng = np.random.default_rng(14)
    xs = jnp.asarray(rng.normal(size=(T, N, F)), dtype)
    dones = jnp.asarray(rng.random((T, N, 1)) < 0.3)
    init_state = lstm.init_recurrent_state(N)
    params = lstm.init(jax.random.PRNGKey(1), init_state, xs[0], False)

    twin = lstm.apply(params, init_state, dones, xs, False,
                      method="sequence")

    orig_seq = plstm.lstm_sequence
    orig_ok = mattn._pallas_backend_ok
    plstm.lstm_sequence = lambda *a, **kw: orig_seq(*a, True)
    mattn._pallas_backend_ok = lambda: True
    try:
        fused = lstm.apply(params, init_state, dones, xs, False,
                           method="sequence")
    finally:
        plstm.lstm_sequence = orig_seq
        mattn._pallas_backend_ok = orig_ok

    np.testing.assert_allclose(np.asarray(fused), np.asarray(twin),
                               rtol=1e-5, atol=1e-5)


def test_lstm_proj_kernel_module_path_matches_twin():
    """Force the projection-fused kernel (interpret) through the module's
    fused path: F=128 satisfies lstm_proj_supported, so the module skips
    the hoisted Dense and reads the input_proj kernel via self.variables —
    outputs AND input_proj gradients must match the plain path."""
    from madrona_learn_tpu.models import LSTM
    import madrona_learn_tpu.models.attention as mattn
    import madrona_learn_tpu.ops.pallas.lstm as plstm

    dtype = jnp.float32
    N, T, H, F = 10, 6, 128, 128
    lstm = LSTM(num_hidden_channels=H, num_layers=2, dtype=dtype,
                use_pallas=True, fuse_input_proj=True)

    rng = np.random.default_rng(33)
    xs = jnp.asarray(rng.normal(size=(T, N, F)), dtype)
    dones = jnp.asarray(rng.random((T, N, 1)) < 0.3)
    init_state = lstm.init_recurrent_state(N)
    params = lstm.init(jax.random.PRNGKey(1), init_state, xs[0], False)
    probe = jnp.asarray(rng.normal(size=(T, N, 2 * H)), dtype)

    def loss(p):
        ys = lstm.apply(p, init_state, dones, xs, False, method="sequence")
        return jnp.sum(ys * probe)

    want, want_grads = jax.value_and_grad(loss)(params)

    orig_proj = plstm.lstm_sequence_proj
    orig_ok = mattn._pallas_backend_ok
    plstm.lstm_sequence_proj = lambda *a, **kw: orig_proj(*a, interpret=True)
    mattn._pallas_backend_ok = lambda: True
    try:
        got, got_grads = jax.value_and_grad(loss)(params)
    finally:
        plstm.lstm_sequence_proj = orig_proj
        mattn._pallas_backend_ok = orig_ok

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    flat_w = jax.tree_util.tree_leaves_with_path(want_grads)
    flat_g = jax.tree_util.tree_leaves_with_path(got_grads)
    assert len(flat_w) == len(flat_g) and len(flat_w) > 0
    for (pw, w), (pg, g) in zip(flat_w, flat_g):
        assert pw == pg
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4,
            err_msg=jax.tree_util.keystr(pw))
        assert np.any(np.asarray(w) != 0), jax.tree_util.keystr(pw)


def test_layer_norm_module_param_structure_invariant():
    """LayerNorm(use_pallas=True) must create flax's exact param tree
    (impl/{scale,bias}): checkpoints stay interchangeable across the
    kernel gate and PPO's renorm_layernorms reads those paths by name."""
    import madrona_learn_tpu.ops.pallas.layer_norm as pln
    import madrona_learn_tpu.ops.pallas.runtime as prt
    from madrona_learn_tpu.models.common import LayerNorm

    orig_ln = pln.layer_norm
    orig_ok = prt.pallas_backend_ok
    pln.layer_norm = lambda *a, **kw: orig_ln(*a, **{**kw, "interpret": True})
    prt.pallas_backend_ok = lambda: True
    try:
        x = jnp.asarray(
            np.random.default_rng(50).normal(size=(6, 128)), jnp.float32)
        p_pallas = LayerNorm(dtype=jnp.float32, use_pallas=True).init(
            jax.random.PRNGKey(0), x)
        p_flax = LayerNorm(dtype=jnp.float32, use_pallas=False).init(
            jax.random.PRNGKey(0), x)
        assert (jax.tree.structure(p_pallas)
                == jax.tree.structure(p_flax)), (p_pallas, p_flax)

        got = LayerNorm(dtype=jnp.float32, use_pallas=True).apply(p_flax, x)
        want = LayerNorm(dtype=jnp.float32, use_pallas=False).apply(
            p_flax, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
    finally:
        pln.layer_norm = orig_ln
        prt.pallas_backend_ok = orig_ok
