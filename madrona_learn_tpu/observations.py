"""Observation preprocessing pipelines keyed on obs-dict entries.

Capability parity with the reference observation system (reference:
observations.py:13-160): a 5-operation protocol (preprocess / init_state /
update_state / init_obs_stats / update_obs_stats) mapped over the obs dict,
with optional per-policy vmap, plus three implementations: EMA normalizer
(with per-key prep functions and a skip set), dtype caster, and no-op.

The stats split matters for the resident train step: ``update_obs_stats``
accumulates streaming batch stats *during* rollouts (cheap, per step) while
``update_state`` folds them into the EMA estimates once per update, so the
normalizer state used for inference stays frozen within a rollout phase.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Set

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from .ops.ema import EMANormalizer


@dataclass(frozen=True)
class ObservationsPreprocess:
    def preprocess(self, states, obs, vmap):
        return self._map_obs(self._preprocess, vmap, states, obs)

    def init_state(self, obs, vmap):
        return self._map_obs(self._init_state, vmap, obs)

    def update_state(self, states, o_stats, vmap):
        return self._map_obs(self._update_state, vmap, states, o_stats)

    def init_obs_stats(self, states, vmap):
        return self._map_obs(self._init_obs_stats, vmap, states)

    def update_obs_stats(self, states, cur_obs_stats, num_prev_updates, obs,
                         vmap):
        def update_stats(ob_name, state, stats, ob):
            return self._update_obs_stats(
                ob_name, state, stats, num_prev_updates, ob)

        return self._map_obs(update_stats, vmap, states, cur_obs_stats, obs)

    def _map_obs(self, cb, vmap, *args):
        keys = args[0].keys()
        out = {}
        for ob_name in keys:
            ob_args = [a[ob_name] for a in args]
            if vmap:
                vmap_axes = [None] + [
                    0 if a is not None else None for a in ob_args]
                if all(ax is None for ax in vmap_axes):
                    f = cb
                else:
                    f = jax.vmap(cb, in_axes=vmap_axes)
            else:
                f = cb
            out[ob_name] = f(ob_name, *ob_args)
        return FrozenDict(out)

    # Per-key operations; default to stateless no-ops.
    def _init_state(self, ob_name, ob):
        return None

    def _update_state(self, ob_name, est, ob_stats):
        return None

    def _init_obs_stats(self, ob_name, est):
        return None

    def _update_obs_stats(self, ob_name, est, ob_stats, num_prev_updates, ob):
        return None


@dataclass(frozen=True)
class ObservationsEMANormalizer(ObservationsPreprocess):
    normalizer: EMANormalizer
    prep_fns: Dict[str, Callable]
    skip_normalization: Set[str]

    @staticmethod
    def create(
        decay: float,
        dtype: jnp.dtype,
        eps: float = 1e-5,
        prep_fns: Dict[str, Callable] = {},
        skip_normalization: Set[str] = frozenset(),
    ):
        return ObservationsEMANormalizer(
            normalizer=EMANormalizer(
                decay=decay, norm_dtype=dtype, inv_dtype=dtype, eps=eps),
            prep_fns=prep_fns,
            skip_normalization=skip_normalization,
        )

    def _prep_ob(self, ob_name, ob):
        return self.prep_fns.get(ob_name, lambda x: x)(ob)

    def _preprocess(self, ob_name, est, ob):
        ob = self._prep_ob(ob_name, ob)
        if ob_name in self.skip_normalization:
            return ob
        return self.normalizer.normalize(est, ob)

    def _init_state(self, ob_name, ob):
        if ob_name in self.skip_normalization:
            return None
        return self.normalizer.init_estimates(self._prep_ob(ob_name, ob))

    def _update_state(self, ob_name, est, ob_stats):
        if ob_name in self.skip_normalization:
            return None
        return self.normalizer.update_estimates(est, ob_stats)

    def _init_obs_stats(self, ob_name, est):
        if ob_name in self.skip_normalization:
            return None
        return self.normalizer.init_input_stats(est)

    def _update_obs_stats(self, ob_name, est, ob_stats, num_prev_updates, ob):
        if ob_name in self.skip_normalization:
            return None
        ob = self._prep_ob(ob_name, ob)
        return self.normalizer.update_input_stats(
            ob_stats, num_prev_updates, ob)


@dataclass(frozen=True)
class ObservationsCaster(ObservationsPreprocess):
    dtype: jnp.dtype

    @staticmethod
    def create(dtype: jnp.dtype):
        return ObservationsCaster(dtype=dtype)

    def _preprocess(self, ob_name, _, ob):
        return ob.astype(self.dtype)


@dataclass(frozen=True)
class ObservationsPreprocessNoop(ObservationsPreprocess):
    @staticmethod
    def create():
        return ObservationsPreprocessNoop()

    def _preprocess(self, ob_name, _, ob):
        return ob
