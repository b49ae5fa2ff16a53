"""The simulator boundary contract.

The trainer consumes a caller-supplied dict of JAX-callables (``sim_fns``)
with the exact same protocol as the reference (reference: rollouts.py:206-215,
905-947, 300-309), so a Madrona-style batch simulator can plug in as an XLA
custom call / ``jax.ffi`` call while tests and toy configs use pure-JAX envs:

- ``init() -> {'state': pytree, 'obs': {name: [sim_batch, ...]}}``
- ``step({'state', 'actions': {name: [sim_batch, ...]},
          'resets': [num_worlds, 1] i32, 'sim_ctrl',
          'pbt': {'policy_assignments': [sim_batch, 1] i32,
                  optional 'reward_hyper_params': [num_policies, H]}})
     -> {'state', 'obs', 'rewards': [sim_batch, 1],
         'dones': [sim_batch, 1], optional 'pbt': {'episode_results'}}``
- optional ``get_ckpts() -> ckpts`` / ``load_ckpts(trigger, ckpts) -> obs``
  for simulator-state snapshots.

Everything must be shape-static and jit-traceable; the step function runs
inside the resident training program. On a sharded mesh the sim batch axis is
sharded over the ``data`` mesh axis, so a pure-JAX env shards for free, and a
native simulator integrates per-shard via ``shard_map``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional


@dataclass(frozen=True)
class SimInterface:
    """Typed wrapper over the ``sim_fns`` dict (both forms are accepted)."""

    init: Callable[[], Dict[str, Any]]
    step: Callable[[Dict[str, Any]], Dict[str, Any]]
    get_ckpts: Optional[Callable] = None
    load_ckpts: Optional[Callable] = None

    def as_dict(self) -> Dict[str, Callable]:
        fns = {"init": self.init, "step": self.step}
        if self.get_ckpts is not None:
            fns["get_ckpts"] = self.get_ckpts
        if self.load_ckpts is not None:
            fns["load_ckpts"] = self.load_ckpts
        return fns


def as_sim_fns(sim) -> Dict[str, Callable]:
    if isinstance(sim, SimInterface):
        return sim.as_dict()
    return sim
