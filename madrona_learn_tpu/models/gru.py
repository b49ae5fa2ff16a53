"""Stacked GRU with the same recurrent protocol as the LSTM.

The reference ships only an LSTM (reference: rnn.py:10-111); a GRU is the
standard lighter-state alternative (one [N, L, H] buffer instead of two —
half the recurrent-state memory and sim<->policy reorder traffic, ~25% fewer
recurrent FLOPs). Drop-in for ``LSTM`` anywhere a backbone takes an ``rnn``:
same ``init_recurrent_state`` / ``clear_recurrent_state`` / ``__call__`` /
``sequence`` surface, same batch-leading TPU state layout and
step-then-reset done-mask ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["GRU"]


class _StackedGRUCell(nn.Module):
    """One step through all layers; carry is a single [N, L, H] array."""

    hidden: int
    layers: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, x):
        hs, outs = [], []
        layer_in = x
        for layer in range(self.layers):
            cell = nn.GRUCell(
                features=self.hidden,
                kernel_init=jax.nn.initializers.orthogonal(),
                recurrent_kernel_init=jax.nn.initializers.orthogonal(),
                bias_init=jax.nn.initializers.constant(0),
                dtype=self.dtype,
                name=f"layer_{layer}",
            )
            h, out = cell(carry[:, layer], layer_in)
            layer_in = h
            hs.append(h)
            outs.append(out)

        return jnp.stack(hs, axis=1), jnp.concatenate(outs, axis=-1)


class GRU(nn.Module):
    num_hidden_channels: int
    num_layers: int
    dtype: jnp.dtype
    # See LSTM.seq_unroll.
    seq_unroll: int = 1

    @nn.nowrap
    def init_recurrent_state(self, N):
        shape = (N, self.num_layers, self.num_hidden_channels)
        return jnp.zeros(shape, self.dtype)

    @nn.nowrap
    def clear_recurrent_state(self, rnn_states, should_clear):
        # should_clear: [N, 1]; broadcasts over (layer, hidden).
        mask = should_clear[..., None]
        return jnp.where(mask, jnp.zeros((), rnn_states.dtype), rnn_states)

    def setup(self):
        self.cell = _StackedGRUCell(
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
            unroll=self.seq_unroll,
        )
        _, outputs = scanned(self.cell, start_hiddens, seq_x, seq_ends)
        return outputs
