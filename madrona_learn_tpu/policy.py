"""User-facing policy bundle (reference: policy.py:13-17)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from .models.actor_critic import ActorCritic
from .observations import ObservationsPreprocess


@dataclass(frozen=True)
class Policy:
    actor_critic: ActorCritic
    obs_preprocess: Optional[ObservationsPreprocess] = None
    get_episode_scores: Optional[Callable] = None
