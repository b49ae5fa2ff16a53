"""Buffer donation: the update step must reuse the training state's buffers
in place (parity with the reference's donation check, reference:
tests/ac_test.py:30-47)."""

import jax
import jax.numpy as jnp
import pytest

from test_train_e2e import run_training


def test_update_iter_reuses_donated_buffers():
    mgr, _ = run_training(num_updates=1, num_worlds=16, seed=51)

    update = jax.jit(lambda m: m.update_iter(), donate_argnums=0)
    mgr = update(mgr)  # compile once

    # Find a large param leaf and compare device buffer pointers across an
    # update. With donation the output aliases the input's memory.
    leaves_before = [
        x for x in jax.tree.leaves(mgr) if hasattr(x, "unsafe_buffer_pointer")
        and x.size >= 1024]
    ptrs_before = {x.unsafe_buffer_pointer() for x in leaves_before}

    mgr2 = update(mgr)
    leaves_after = [
        x for x in jax.tree.leaves(mgr2)
        if hasattr(x, "unsafe_buffer_pointer") and x.size >= 1024]
    ptrs_after = {x.unsafe_buffer_pointer() for x in leaves_after}

    reused = ptrs_before & ptrs_after
    assert reused, "no donated buffers were reused in place"
