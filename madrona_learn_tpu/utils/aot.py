"""AOT compilation helper with HLO dump hooks (reference: utils.py:21-57).

``aot_compile`` jits a function with all-argument donation, lowers and
compiles it once so the steady-state train loop never re-traces.  Env vars:

- ``MADRONA_LEARN_TPU_DUMP_LOWERED=<path>``: dump StableHLO before compile.
- ``MADRONA_LEARN_TPU_DUMP_IR=<path>``: dump the compiled executable IR.
"""

from os import environ as env_vars

import jax

__all__ = ["aot_compile", "cfg_jax_mem"]


def cfg_jax_mem(mem_fraction: float):
    """Cap the XLA client memory fraction and enable strict dtype promotion."""
    env_vars["XLA_PYTHON_CLIENT_MEM_FRACTION"] = f"{mem_fraction:.2f}"
    jax.config.update("jax_numpy_dtype_promotion", "strict")


def aot_compile(func, *args, donate=True):
    if donate:
        func = jax.jit(func, donate_argnums=range(len(args)))
    else:
        func = jax.jit(func)

    lowered = func.lower(*args)

    if "MADRONA_LEARN_TPU_DUMP_LOWERED" in env_vars:
        with open(env_vars["MADRONA_LEARN_TPU_DUMP_LOWERED"], "w") as f:
            print(lowered.as_text(), file=f)

    compiled = lowered.compile()

    if "MADRONA_LEARN_TPU_DUMP_IR" in env_vars:
        with open(env_vars["MADRONA_LEARN_TPU_DUMP_IR"], "w") as f:
            print(compiled.as_text(), file=f)

    return compiled
