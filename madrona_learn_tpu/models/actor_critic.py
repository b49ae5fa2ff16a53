"""ActorCritic module and backbone composition.

Capability parity with the reference actor-critic layer (reference:
actor_critic.py:13-303): an ``ActorCritic`` flax module exposing four apply
methods — ``rollout`` (sample/argmax actions + value), ``update`` (sequence
forward for stored actions returning log-probs/entropies/critic),
``actor_only`` and ``critic_only`` — over pluggable backbones:

- ``BackboneEncoder``: feed-forward (empty recurrent state).
- ``RecurrentBackboneEncoder``: net -> rnn, with a time-axis ``sequence`` path.
- ``BackboneShared`` / ``BackboneSeparate``: one or two encoder towers feeding
  the actor and critic heads.

Recurrent-state init/clear are ``nn.nowrap`` helpers so the rollout engine can
manage state outside module application.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict, frozen_dict

from ..utils.profile import profile


class Backbone(nn.Module):
    def _flatten_obs_sequence(self, obs):
        return jax.tree.map(lambda o: o.reshape(-1, *o.shape[2:]), obs)

    @nn.nowrap
    def init_recurrent_state(self, N):
        raise NotImplementedError

    @nn.nowrap
    def clear_recurrent_state(self, recurrent_states, should_clear):
        raise NotImplementedError


class ActorCritic(nn.Module):
    backbone: Backbone
    actor: nn.Module
    critic: nn.Module

    @nn.nowrap
    def init_recurrent_state(self, N):
        return self.backbone.init_recurrent_state(N)

    @nn.nowrap
    def clear_recurrent_state(self, recurrent_states, should_clear):
        return self.backbone.clear_recurrent_state(
            recurrent_states, should_clear)

    def setup(self):
        pass

    def actor_only(self, rnn_states_in, obs_in, train=False):
        features, rnn_states_out = self.backbone.actor_only(
            rnn_states_in, obs_in, train=train)
        dists = self.actor(features, train=train)
        return FrozenDict({"actions": dists.best()}), rnn_states_out

    def critic_only(self, rnn_states_in, obs_in, train=False):
        features, rnn_states_out = self.backbone.critic_only(
            rnn_states_in, obs_in, train=train)
        return (
            FrozenDict({"critic": self.critic(features, train=train)}),
            rnn_states_out,
        )

    def rollout(self, prng_key, rnn_states_in, obs_in, train=False,
                sample_actions=True, return_debug=False):
        actor_features, critic_features, rnn_states_out = self.backbone(
            rnn_states_in, obs_in, train=train)

        dists = self.actor(actor_features, train=train)

        results = {}
        if sample_actions:
            actions, log_probs = dists.sample(prng_key)
            results["log_probs"] = log_probs
        else:
            actions = dists.best()
        results["actions"] = actions
        results["critic"] = self.critic(critic_features, train=train)

        return frozen_dict.freeze(results), rnn_states_out

    def update(self, rnn_states, sequence_breaks, rollout_actions, obs,
               train=True):
        """Forward stored [T, N, ...] sequences for the PPO update pass."""
        actor_features, critic_features = self.backbone.sequence(
            rnn_states, sequence_breaks, obs, train=train)

        dists = self.actor(actor_features, train=train)
        critic_out = self.critic(critic_features, train=train)

        T, N = sequence_breaks.shape[0:2]
        flat_actions = jax.tree.map(
            lambda a: a.reshape(T * N, *a.shape[2:]), rollout_actions)

        log_probs, entropies = dists.action_stats(flat_actions)

        unflatten = lambda x: x.reshape(T, N, *x.shape[1:])
        return FrozenDict({
            "log_probs": jax.tree.map(unflatten, log_probs),
            "entropies": jax.tree.map(unflatten, entropies),
            "critic": jax.tree.map(unflatten, critic_out),
        })


class BackboneEncoder(nn.Module):
    net: nn.Module

    @nn.nowrap
    def init_recurrent_state(self, N):
        return ()

    @nn.nowrap
    def clear_recurrent_state(self, recurrent_states, should_clear):
        return ()

    def __call__(self, rnn_states, inputs, train):
        return self.net(inputs, train=train), ()

    def sequence(self, rnn_start_states, sequence_ends, flattened_inputs,
                 train):
        return self.net(flattened_inputs, train=train)


class RecurrentBackboneEncoder(nn.Module):
    net: nn.Module
    rnn: nn.Module

    @nn.nowrap
    def init_recurrent_state(self, N):
        return self.rnn.init_recurrent_state(N)

    @nn.nowrap
    def clear_recurrent_state(self, recurrent_states, should_clear):
        return self.rnn.clear_recurrent_state(recurrent_states, should_clear)

    def setup(self):
        pass

    def __call__(self, rnn_states_in, *inputs, train):
        features = self.net(*inputs, train=train)
        rnn_out, new_rnn_states = self.rnn(rnn_states_in, features, train)
        return rnn_out, new_rnn_states

    def sequence(self, rnn_start_states, sequence_ends, flattened_inputs,
                 train):
        # inputs arrive pre-flattened [T*N, ...]; reshape to [T, N, ...] for
        # the rnn scan, then flatten back for the heads.
        features = self.net(flattened_inputs, train=train)
        features_seq = jax.tree.map(
            lambda x: x.reshape(*sequence_ends.shape[0:2], *x.shape[1:]),
            features)

        with profile("rnn.fwd_sequence"):
            rnn_out_seq = self.rnn.sequence(
                rnn_start_states, sequence_ends, features_seq, train=train)

        return jax.tree.map(
            lambda x: x.reshape(-1, *x.shape[2:]), rnn_out_seq)


class BackboneShared(Backbone):
    prefix: Union[nn.Module, Callable]
    encoder: nn.Module

    @nn.nowrap
    def init_recurrent_state(self, N):
        return self.encoder.init_recurrent_state(N)

    @nn.nowrap
    def clear_recurrent_state(self, recurrent_states, should_clear):
        return self.encoder.clear_recurrent_state(
            recurrent_states, should_clear)

    def setup(self):
        pass

    def _encode(self, rnn_states_in, obs_in, train):
        processed = self.prefix(obs_in, train=train)
        return self.encoder(rnn_states_in, processed, train=train)

    def __call__(self, rnn_states_in, obs_in, train):
        features, rnn_states_out = self._encode(rnn_states_in, obs_in, train)
        return features, features, rnn_states_out

    def actor_only(self, rnn_states_in, obs_in, train):
        return self._encode(rnn_states_in, obs_in, train)

    def critic_only(self, rnn_states_in, obs_in, train):
        return self._encode(rnn_states_in, obs_in, train)

    def sequence(self, rnn_start_states, sequence_ends, obs_in, train):
        flattened_obs = self._flatten_obs_sequence(obs_in)
        processed = self.prefix(flattened_obs, train=train)
        features = self.encoder.sequence(
            rnn_start_states, sequence_ends, processed, train=train)
        return features, features


class BackboneSeparate(Backbone):
    prefix: Union[nn.Module, Callable]
    actor_encoder: nn.Module
    critic_encoder: nn.Module

    @nn.nowrap
    def init_recurrent_state(self, N):
        return (self.actor_encoder.init_recurrent_state(N),
                self.critic_encoder.init_recurrent_state(N))

    @nn.nowrap
    def clear_recurrent_state(self, recurrent_states, should_clear):
        return (
            self.actor_encoder.clear_recurrent_state(
                recurrent_states[0], should_clear),
            self.critic_encoder.clear_recurrent_state(
                recurrent_states[1], should_clear),
        )

    def setup(self):
        pass

    def __call__(self, rnn_states_in, obs_in, train):
        processed = self.prefix(obs_in, train=train)
        actor_features, actor_rnn = self.actor_encoder(
            rnn_states_in[0], processed, train=train)
        critic_features, critic_rnn = self.critic_encoder(
            rnn_states_in[1], processed, train=train)
        return actor_features, critic_features, (actor_rnn, critic_rnn)

    def actor_only(self, rnn_states_in, obs_in, train):
        processed = self.prefix(obs_in, train=train)
        features, rnn_out = self.actor_encoder(
            rnn_states_in[0], processed, train=train)
        return features, (rnn_out, rnn_states_in[1])

    def critic_only(self, rnn_states_in, obs_in, train):
        processed = self.prefix(obs_in, train=train)
        features, rnn_out = self.critic_encoder(
            rnn_states_in[1], processed, train=train)
        return features, (rnn_states_in[0], rnn_out)

    def sequence(self, rnn_start_states, sequence_ends, obs_in, train):
        flattened_obs = self._flatten_obs_sequence(obs_in)
        processed = self.prefix(flattened_obs, train=train)
        actor_features = self.actor_encoder.sequence(
            rnn_start_states[0], sequence_ends, processed, train=train)
        critic_features = self.critic_encoder.sequence(
            rnn_start_states[1], sequence_ends, processed, train=train)
        return actor_features, critic_features
