"""Two-process jax.distributed smoke test on CPU.

Validates the multi-host init path (parallel/distributed.py) without a pod:
two processes, 4 virtual CPU devices each, form one 8-device global mesh and
run a psum across it.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from madrona_learn_tpu.parallel import distributed

ok = distributed.init_multi_host(
    coordinator_address="127.0.0.1:29671",
    num_processes=2,
    process_id=proc_id,
)
assert ok

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

assert len(jax.devices()) == 8, jax.devices()
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))

# Each process contributes its local shard of a global [8] array.
local = jnp.arange(4, dtype=jnp.float32) + 4 * proc_id
global_arr = jax.make_array_from_single_device_arrays(
    (8,), NamedSharding(mesh, P("data")),
    [jax.device_put(local[i:i+1], d) for i, d in enumerate(
        jax.local_devices())])

total = jax.jit(
    lambda x: jnp.sum(x),
    out_shardings=NamedSharding(mesh, P()))(global_arr)
result = float(jax.device_get(total))
assert result == sum(range(8)), result
print(f"proc {proc_id} OK: {result}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    # PYTHONPATH must exclude any sitecustomize that eagerly initializes a
    # backend (jax.distributed.initialize must run first in each worker).
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outputs))

    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK: 28.0" in out
