"""Fused rollout policy-step kernel: twin equivalence + module integration.

Covers ops/pallas/policy_step.py (kernel vs jnp twin in interpret mode,
padding and dtype cases) and the RecurrentBackboneEncoder.use_fused_step
routing (fused path == unfused flax modules in fp32; bounded divergence in
bf16; sequence-path consistency for the PPO ratio argument).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_learn_tpu.models import (
    LSTM,
    MLP,
    RecurrentBackboneEncoder,
)
from madrona_learn_tpu.ops.pallas.policy_step import (
    fused_policy_step,
    fused_policy_step_reference,
    policy_step_supported,
)


def make_inputs(key, N, F, H, layers, dtype):
    ks = iter(jax.random.split(key, 5 + 3 * layers))
    x = jax.random.normal(next(ks), (N, F), jnp.float32).astype(dtype)
    mlp = []
    fin = F
    for _ in range(layers):
        w = jax.random.normal(next(ks), (fin, H), jnp.float32) * 0.2
        s = 1.0 + 0.1 * jax.random.normal(next(ks), (H,), jnp.float32)
        b = 0.1 * jax.random.normal(next(ks), (H,), jnp.float32)
        mlp.append((w.astype(dtype), s, b))
        fin = H
    wi = jax.random.normal(next(ks), (H, 4 * H), jnp.float32) * 0.1
    wr = jax.random.normal(next(ks), (H, 4 * H), jnp.float32) * 0.1
    b = jnp.linspace(-0.1, 0.1, 4 * H, dtype=jnp.float32)
    c = jax.random.normal(next(ks), (N, H), jnp.float32).astype(dtype)
    h = jax.random.normal(next(ks), (N, H), jnp.float32).astype(dtype)
    return x, mlp, wi.astype(dtype), wr.astype(dtype), b, c, h


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("N,layers", [(256, 2), (300, 2), (64, 1)])
def test_kernel_matches_twin_interpret(dtype, N, layers):
    """Mosaic kernel (interpret mode) == jnp twin, incl. non-dividing batch
    and the F=3 feature-pad path."""
    H, F = 128, 3
    args = make_inputs(jax.random.PRNGKey(0), N, F, H, layers, dtype)
    out_k, (c_k, h_k) = fused_policy_step(*args, interpret=True)
    out_t, (c_t, h_t) = fused_policy_step_reference(*args)

    # fp32: 1-ulp-level reduction-order differences from the padded K
    # dimension of the kernel's dots; bf16: storage rounding.
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    for a, b in ((out_k, out_t), (c_k, c_t), (h_k, h_t)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=atol)


def test_supported_gate():
    assert policy_step_supported(256, 3, jnp.bfloat16)
    assert not policy_step_supported(200, 3, jnp.bfloat16)  # H % 128
    assert not policy_step_supported(256, 200, jnp.bfloat16)  # F > 128
    assert not policy_step_supported(256, 3, jnp.float16)


def make_encoder(fused, dtype, H=256, layers=2, use_pallas=False):
    return RecurrentBackboneEncoder(
        net=MLP(num_channels=H, num_layers=layers, dtype=dtype),
        rnn=LSTM(num_hidden_channels=H, num_layers=1, dtype=dtype,
                 use_pallas=use_pallas),
        use_fused_step=fused)


def test_fused_encoder_exact_fp32():
    """Fused single-step path == unfused flax modules, bitwise in fp32
    (same math convention; the twin serves the CPU backend)."""
    N, F, dtype = 70, 3, jnp.float32
    x = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)
    enc = make_encoder(True, dtype)
    rnn0 = enc.init_recurrent_state(N)
    variables = enc.init(jax.random.PRNGKey(1), rnn0, x, train=False)

    out_f, carry_f = enc.apply(variables, rnn0, x, train=False)
    out_u, carry_u = make_encoder(False, dtype).apply(
        variables, rnn0, x, train=False)

    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_u))
    for a, b in zip(carry_f, carry_u):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_encoder_bf16_close():
    N, F, dtype = 70, 3, jnp.bfloat16
    x = jax.random.normal(
        jax.random.PRNGKey(0), (N, F), jnp.float32).astype(dtype)
    enc = make_encoder(True, dtype, use_pallas=True)
    rnn0 = enc.init_recurrent_state(N)
    variables = enc.init(jax.random.PRNGKey(1), rnn0, x, train=False)

    out_f, _ = enc.apply(variables, rnn0, x, train=False)
    out_u, _ = make_encoder(False, dtype, use_pallas=True).apply(
        variables, rnn0, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_u, np.float32),
        atol=2e-2)


def test_fused_step_chain_matches_sequence_path():
    """Chaining fused single steps over T steps must track the update-time
    sequence pass (the PPO-ratio consistency argument): fp32 exact, and the
    episode-boundary clear semantics line up."""
    T, N, F, dtype = 5, 33, 3, jnp.float32
    enc = make_encoder(True, dtype)
    x_seq = jax.random.normal(jax.random.PRNGKey(2), (T, N, F), jnp.float32)
    ends = jnp.zeros((T, N, 1), jnp.bool_).at[2, ::3].set(True)
    rnn0 = enc.init_recurrent_state(N)
    variables = enc.init(jax.random.PRNGKey(1), rnn0, x_seq[0], train=False)

    # Rollout-style: step, then clear on done.
    outs = []
    carry = rnn0
    for t in range(T):
        out, carry = enc.apply(variables, carry, x_seq[t], train=False)
        carry = enc.clear_recurrent_state(carry, ends[t])
        outs.append(out)
    rollout_feats = jnp.stack(outs)  # [T, N, H]

    seq_feats = enc.apply(
        variables, rnn0, ends, x_seq.reshape(T * N, F), train=False,
        method="sequence").reshape(T, N, -1)

    np.testing.assert_allclose(
        np.asarray(rollout_feats), np.asarray(seq_feats), atol=1e-6)


def test_training_with_fused_step_matches_unfused():
    """Full training through the rollout engine with use_fused_step=True
    must reproduce the unfused run exactly in fp32 (the twin's math matches
    the flax modules bitwise there) — proving the fused path composes with
    reorder/store/GAE/PPO, not just the isolated module."""
    import madrona_learn_tpu as mlt
    from madrona_learn_tpu.envs import ToyEnvConfig, make_toy_env
    from madrona_learn_tpu.models import (
        ActorCritic, BackboneShared, DenseLayerCritic,
        DenseLayerDiscreteActor, DictActor)

    def run(fused):
        actions = {"move": mlt.DiscreteActionsConfig(actions_num_buckets=[5])}
        sim_fns = make_toy_env(ToyEnvConfig(
            num_worlds=32, episode_len=10, grid_size=5, seed=7))
        ac = ActorCritic(
            backbone=BackboneShared(
                prefix=lambda obs, train: jnp.concatenate(
                    [obs["delta"], obs["time"]], axis=-1),
                encoder=make_encoder(fused, jnp.float32, H=128, layers=2)),
            actor=DictActor(heads={"move": DenseLayerDiscreteActor(
                cfg=actions["move"], dtype=jnp.float32)}),
            critic=DenseLayerCritic(dtype=jnp.float32))
        policy = mlt.Policy(
            actor_critic=ac,
            obs_preprocess=mlt.ObservationsEMANormalizer.create(
                decay=0.99, dtype=jnp.float32))
        cfg = mlt.TrainConfig(
            num_worlds=32, num_agents_per_world=1, num_updates=3,
            actions=actions, steps_per_update=8, num_bptt_chunks=2,
            lr=1e-3, gamma=0.95, gae_lambda=0.95, seed=7,
            metrics_buffer_size=1,
            algo=mlt.PPOConfig(
                num_epochs=1, minibatch_size=32, clip_coef=0.2,
                value_loss_coef=0.5, entropy_coef=0.01, max_grad_norm=0.5),
            dreamer_v3_critic=False,
            compute_advantages=True)
        mgr = mlt.init_training(
            None, cfg, sim_fns, policy,
            init_sim_ctrl=jnp.zeros((1,), jnp.int32))
        update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)
        for _ in range(3):
            mgr = update(mgr)
        return (jax.device_get(mgr.metrics.metrics["Loss"].mean),
                jax.device_get(mgr.metrics.metrics["Rewards"].mean))

    def make_encoder(fused, dtype, H, layers):
        return RecurrentBackboneEncoder(
            net=MLP(num_channels=H, num_layers=layers, dtype=dtype),
            rnn=LSTM(num_hidden_channels=H, num_layers=1, dtype=dtype),
            use_fused_step=fused)

    loss_f, rew_f = run(True)
    loss_u, rew_u = run(False)
    assert np.isfinite(loss_f).all()
    # Not bitwise inside the full vmapped rollout loop: one ulp of fp32
    # reassociation (observed 3e-8 relative after 3 updates); the module-
    # level test above IS exact.
    np.testing.assert_allclose(loss_f, loss_u, rtol=1e-5)
    np.testing.assert_allclose(rew_f, rew_u, rtol=1e-5)


def test_mismatched_towers_fall_back():
    """Applicability gate: towers the kernel can't serve (width or dtype
    mismatch, bf16 without use_pallas) must fall back to the flax path and
    still run correctly rather than crash or change precision."""
    N, F = 16, 3
    x32 = jax.random.normal(jax.random.PRNGKey(0), (N, F), jnp.float32)

    def check(enc, x):
        rnn0 = enc.init_recurrent_state(N)
        v = enc.init(jax.random.PRNGKey(1), rnn0, x, train=False)
        out, _ = enc.apply(v, rnn0, x, train=False)
        assert np.isfinite(np.asarray(out, np.float32)).all()

    # MLP wider than the LSTM hidden.
    check(RecurrentBackboneEncoder(
        net=MLP(num_channels=256, num_layers=1, dtype=jnp.float32),
        rnn=LSTM(num_hidden_channels=128, num_layers=1, dtype=jnp.float32),
        use_fused_step=True), x32)
    # Mixed dtypes across the trunk.
    check(RecurrentBackboneEncoder(
        net=MLP(num_channels=128, num_layers=1, dtype=jnp.float32),
        rnn=LSTM(num_hidden_channels=128, num_layers=1, dtype=jnp.bfloat16),
        use_fused_step=True), x32)
    # bf16 without use_pallas: sequence pass would use bf16 gate math, so
    # the fused (fp32 precise-gates) single step must NOT engage.
    enc = RecurrentBackboneEncoder(
        net=MLP(num_channels=128, num_layers=1, dtype=jnp.bfloat16),
        rnn=LSTM(num_hidden_channels=128, num_layers=1, dtype=jnp.bfloat16,
                 use_pallas=False),
        use_fused_step=True)
    assert not enc._fused_step_applicable(
        (x32.astype(jnp.bfloat16),))
    check(enc, x32.astype(jnp.bfloat16))


def test_fused_encoder_under_policy_vmap():
    """The rollout engine vmaps the policy forward over stacked per-policy
    params; the fused path must batch correctly."""
    P, N, F, dtype = 3, 40, 3, jnp.float32
    enc = make_encoder(True, dtype, H=128, layers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (P, N, F), jnp.float32)
    rnn0 = enc.init_recurrent_state(N)

    def init_one(key):
        return enc.init(key, rnn0, x[0], train=False)

    variables = jax.vmap(init_one)(jax.random.split(jax.random.PRNGKey(1), P))
    rnn_p = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (P, *a.shape)), rnn0)

    out_f, _ = jax.vmap(
        lambda v, r, xi: enc.apply(v, r, xi, train=False))(
            variables, rnn_p, x)
    out_u, _ = jax.vmap(
        lambda v, r, xi: make_encoder(False, dtype, H=128, layers=1).apply(
            v, r, xi, train=False))(variables, rnn_p, x)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_u))
