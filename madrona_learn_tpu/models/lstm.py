"""Stacked LSTM with explicit recurrent-state management.

Capability parity with the reference RNN layer (reference: rnn.py:10-111):
stacked ``OptimizedLSTMCell`` layers whose per-layer outputs are concatenated,
zero-init recurrent state, done-masked state clearing, and a time-axis
``sequence`` scan used by the PPO update pass.

TPU notes: recurrent state is kept as stacked *batch-leading* ``[N,
num_layers, H]`` arrays (rather than Python lists of [N, H]) so the whole
state is two contiguous buffers whose leading axis is the agent batch — the
axis every sim<->policy gather/scatter and mesh sharding acts on. The
sequence scan runs under ``nn.scan`` with params broadcast, so XLA keeps
weights resident in VMEM across timesteps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LSTM"]


class MultiLayerLSTMCell(nn.Module):
    num_hidden_channels: int
    num_layers: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry: Tuple[jax.Array, jax.Array], inputs: jax.Array):
        in_c, in_h = carry  # each [N, num_layers, H]

        x = inputs
        new_c, new_h, outs = [], [], []
        for i in range(self.num_layers):
            (c_i, h_i), out = nn.OptimizedLSTMCell(
                features=self.num_hidden_channels,
                kernel_init=jax.nn.initializers.orthogonal(),
                recurrent_kernel_init=jax.nn.initializers.orthogonal(),
                bias_init=jax.nn.initializers.constant(0),
                dtype=self.dtype,
            )((in_c[:, i], in_h[:, i]), x)
            x = h_i
            new_c.append(c_i)
            new_h.append(h_i)
            outs.append(out)

        return (
            (jnp.stack(new_c, axis=1), jnp.stack(new_h, axis=1)),
            jnp.concatenate(outs, -1),
        )


class LSTM(nn.Module):
    num_hidden_channels: int
    num_layers: int
    dtype: jnp.dtype

    @nn.nowrap
    def init_recurrent_state(self, N):
        zeros = jnp.zeros(
            (N, self.num_layers, self.num_hidden_channels), self.dtype)
        return (zeros, zeros)

    @nn.nowrap
    def clear_recurrent_state(self, rnn_states, should_clear):
        # should_clear: [N, 1] broadcast over layers and hidden channels.
        c, h = rnn_states
        mask = should_clear[..., None]
        zero = jnp.zeros((), c.dtype)
        return (jnp.where(mask, zero, c), jnp.where(mask, zero, h))

    def setup(self):
        self.cell = MultiLayerLSTMCell(
            self.num_hidden_channels, self.num_layers, self.dtype)

    def __call__(self, cur_hiddens, in_features, train):
        new_hiddens, out = self.cell(cur_hiddens, in_features)
        return out, new_hiddens

    def sequence(self, start_hiddens, seq_ends, seq_x, train):
        """Run the cell over a [T, N, ...] sequence, clearing state at episode
        boundaries (``seq_ends`` true at step t clears state entering t+1)."""

        def step(cell, carry, x, end):
            carry, y = cell(carry, x)
            carry = self.clear_recurrent_state(carry, end)
            return carry, y

        scan = nn.scan(
            step,
            in_axes=0,
            out_axes=0,
            unroll=1,
            variable_axes={},
            variable_broadcast="params",
            variable_carry=False,
            split_rngs={"params": False},
        )
        _, outputs = scan(self.cell, start_hiddens, seq_x, seq_ends)
        return outputs
