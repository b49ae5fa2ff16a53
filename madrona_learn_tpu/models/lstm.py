"""Stacked LSTM with explicit, batch-leading recurrent state.

Capability parity with the reference RNN layer (reference: rnn.py:10-111):
stacked LSTM layers whose per-layer outputs concatenate into the feature
vector, zero-init state, done-masked clearing, and a time-axis scan for the
BPTT update pass.

TPU-first state layout: the (c, h) state is a pair of ``[N, num_layers, H]``
arrays — the agent batch leads, so the sim<->policy reorder gathers and the
``data``-axis mesh sharding act on axis 0 of exactly two contiguous buffers.
The sequence scan broadcasts params (weights stay VMEM-resident across
timesteps) and applies the done-mask *after* each step, matching the rollout
engine's step-then-reset ordering so rollout and update passes see identical
state trajectories.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LSTM"]


class _StackedCell(nn.Module):
    """One step through all layers; carry is ([N,L,H] c, [N,L,H] h)."""

    hidden: int
    layers: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, x):
        c_in, h_in = carry

        cs, hs, outs = [], [], []
        layer_in = x
        for layer in range(self.layers):
            cell = nn.OptimizedLSTMCell(
                features=self.hidden,
                kernel_init=jax.nn.initializers.orthogonal(),
                recurrent_kernel_init=jax.nn.initializers.orthogonal(),
                bias_init=jax.nn.initializers.constant(0),
                dtype=self.dtype,
                name=f"layer_{layer}",
            )
            (c, h), out = cell((c_in[:, layer], h_in[:, layer]), layer_in)
            layer_in = h
            cs.append(c)
            hs.append(h)
            outs.append(out)

        carry = (jnp.stack(cs, axis=1), jnp.stack(hs, axis=1))
        return carry, jnp.concatenate(outs, axis=-1)


class LSTM(nn.Module):
    num_hidden_channels: int
    num_layers: int
    dtype: jnp.dtype

    @nn.nowrap
    def init_recurrent_state(self, N):
        shape = (N, self.num_layers, self.num_hidden_channels)
        return (jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype))

    @nn.nowrap
    def clear_recurrent_state(self, rnn_states, should_clear):
        # should_clear: [N, 1]; broadcasts over (layer, hidden).
        mask = should_clear[..., None]
        return tuple(
            jnp.where(mask, jnp.zeros((), s.dtype), s) for s in rnn_states)

    def setup(self):
        self.cell = _StackedCell(
            hidden=self.num_hidden_channels,
            layers=self.num_layers,
            dtype=self.dtype,
        )

    def __call__(self, cur_hiddens, in_features, train):
        new_hiddens, out = self.cell(cur_hiddens, in_features)
        return out, new_hiddens

    def sequence(self, start_hiddens, seq_ends, seq_x, train):
        """[T, N, F] features -> [T, N, L*H] outputs, clearing state after
        any step whose ``seq_ends`` flag is set (episode boundary)."""

        def step(cell, carry, x, end):
            carry, y = cell(carry, x)
            return self.clear_recurrent_state(carry, end), y

        scanned = nn.scan(
            step,
            in_axes=0,
            out_axes=0,
            variable_broadcast="params",
            variable_carry=False,
            split_rngs={"params": False},
        )
        _, outputs = scanned(self.cell, start_hiddens, seq_x, seq_ends)
        return outputs
