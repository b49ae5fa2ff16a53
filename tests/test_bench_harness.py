"""bench.py harness robustness: a backend-init failure must still produce
one parseable JSON record (the driver records only rc + last JSON line;
round 2's perf evidence was lost to an unretried UNAVAILABLE at first TPU
contact — see VERDICT.md round 2 item 1).

Methodology being protected: reference tests/ac_test.py:355-369
(AOT-compile-then-time), which assumes the backend simply exists.
"""

import json
import sys

import pytest


@pytest.fixture()
def bench_module(monkeypatch):
    monkeypatch.setenv("MADRONA_LEARN_TPU_BENCH_INIT_WAIT", "0")
    monkeypatch.setenv("MADRONA_LEARN_TPU_BENCH_RETRY_WAIT", "0")
    sys.modules.pop("bench", None)
    import bench

    return bench


def test_backend_failure_emits_json_error_record(
        bench_module, monkeypatch, capsys):
    import jax

    def boom():
        raise RuntimeError("UNAVAILABLE: tunnel down")

    monkeypatch.setattr(jax, "devices", boom)
    rc = bench_module.main()
    assert rc == 0

    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    record = json.loads(lines[-1])
    assert record["metric"] == "ppo_env_steps_per_s_per_chip"
    assert record["value"] is None
    assert "UNAVAILABLE" in record["error"]


def test_acquire_backend_retries_then_succeeds(bench_module, monkeypatch):
    import jax
    import jax.extend.backend

    calls = {"n": 0}
    real_devices = jax.devices

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: cold tunnel")
        return real_devices()

    monkeypatch.setattr(jax, "devices", flaky)
    # clear_backends would drop the live CPU backend mid-test; the retry
    # loop treats a failing clear as best-effort, so stub it out.
    monkeypatch.setattr(
        jax.extend.backend, "clear_backends",
        lambda: (_ for _ in ()).throw(RuntimeError("stubbed")))
    backend = bench_module.acquire_backend(
        max_wait_s=30.0, initial_delay_s=0.01)
    assert backend == jax.default_backend()
    assert calls["n"] == 3


def test_stderr_scrub_keeps_json_last_and_drops_noise(tmp_path):
    """Driver-capture hardening (VERDICT r4 weak #5): XLA's native
    cpu_aot_loader spew (multi-KB ERROR lines on fd 2) must not trail the
    JSON record in the combined stream, and known-noise lines must be
    scrubbed while real diagnostics survive."""
    import os
    import subprocess

    script = (
        "import os, sys\n"
        "sys.path.insert(0, %r)\n"
        "import bench\n"
        "bench._install_stderr_scrub()\n"
        "os.write(2, b'E0000 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
        "result. ... SIGILL.\\n')\n"
        "os.write(2, b'real diagnostic line\\n')\n"
        "bench._emit_record({'metric': 'm', 'value': 1})\n"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               MADRONA_LEARN_TPU_BENCH_STDERR_LOG=str(
                   tmp_path / "stderr.log"))
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=240)
    assert proc.returncode == 0
    out = proc.stdout.decode()
    lines = [ln for ln in out.splitlines() if ln.strip()]
    # JSON record is the LAST line of the combined stream.
    assert json.loads(lines[-1]) == {"metric": "m", "value": 1}
    assert "cpu_aot_loader" not in out
    assert "real diagnostic line" in out
    # The unfiltered log keeps everything for debugging.
    logged = (tmp_path / "stderr.log").read_text()
    assert "cpu_aot_loader" in logged


def test_wall_limit_hang_emits_json_error(bench_module, monkeypatch, capsys):
    """A hung backend (jax.devices() blocking forever — observed when the
    tunnel service dies) must be interrupted by the SIGALRM watchdog and
    converted to a JSON error record instead of a silent stall."""
    import time as _time

    import jax

    monkeypatch.setenv("MADRONA_LEARN_TPU_BENCH_WALL_LIMIT", "1")

    def hang():
        _time.sleep(300)

    monkeypatch.setattr(jax, "devices", hang)
    t0 = _time.monotonic()
    rc = bench_module.main()
    assert rc == 0
    assert _time.monotonic() - t0 < 30

    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    record = json.loads(lines[-1])
    assert record["value"] is None
    assert "wall-clock" in record["error"]
