"""Named-scope + trace-annotation profiling context (reference: profile.py:6-32).

Usage::

    with profile("Collect Rollouts"):
        ...

Scopes show up both in HLO (via ``jax.named_scope``) and in XProf traces
(via ``jax.profiler.TraceAnnotation``).
"""

from contextlib import contextmanager

import jax

__all__ = ["profile"]


class Profiler:
    def __init__(self):
        self.disabled = False

    @contextmanager
    def __call__(self, name):
        if self.disabled:
            yield
            return
        with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
            yield

    def disable(self):
        self.disabled = True

    def enable(self):
        self.disabled = False


profile = Profiler()
