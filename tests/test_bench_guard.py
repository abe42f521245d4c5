"""bench.py device-availability guard (fails fast when the backend is
unreachable instead of hanging the caller — the axon relay wedges jax
backend init indefinitely when the tunnel is down)."""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(extra_env, timeout=180):
    env = os.environ.copy()
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=timeout)


def _last_json_line(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in: {stdout!r}"
    return json.loads(lines[-1])


def test_guard_reports_probe_timeout():
    # A microscopic timeout expires before the probe subprocess can even
    # start — deterministic regardless of relay health.
    proc = _run_bench({"BENCH_DEVICE_TIMEOUT": "0.01"})
    assert proc.returncode == 1
    rec = _last_json_line(proc.stdout)
    assert rec["value"] == 0.0
    assert "no jax devices within" in rec["error"]


def test_guard_reports_backend_init_failure():
    # An unknown platform makes the probe subprocess exit non-zero fast.
    proc = _run_bench({"JAX_PLATFORMS": "no_such_platform",
                       "PALLAS_AXON_POOL_IPS": "",
                       "BENCH_DEVICE_TIMEOUT": "120"})
    assert proc.returncode == 1
    rec = _last_json_line(proc.stdout)
    assert rec["value"] == 0.0
    assert "jax backend init failed" in rec["error"]


def test_guard_error_record_carries_the_failing_mode():
    # A BENCH_MODE=train outage must NOT fabricate a 0.0 data point for
    # the primary adapt-step metric — the record is labeled with the
    # mode that failed (and train/infer use a null baseline ratio, as
    # their successful records do).
    proc = _run_bench({"BENCH_DEVICE_TIMEOUT": "0.01",
                       "BENCH_MODE": "train"})
    assert proc.returncode == 1
    rec = _last_json_line(proc.stdout)
    assert rec["metric"] == "pretrain_images_per_sec"
    assert rec["unit"] == "img/s"
    assert rec["vs_baseline"] is None
    assert rec["value"] == 0.0


def test_differential_harness_records_compile_time():
    # Every timed mode must record its first-call (compile) wall time so
    # bench artifacts carry a compile-time series (the r03 multi-chip
    # dryrun died of an unnoticed compile blowup; BENCH compile_seconds
    # is the regression guard).
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench2",
                                                  REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    calls = []

    def timed(n):
        calls.append(n)
        return 7.0 if len(calls) == 1 else 0.1 * n

    elapsed = mod._differential_elapsed(timed, num_steps=4,
                                        compile_key="probe")
    assert mod.LAST_COMPILE_SECONDS["probe"] == 7.0
    assert calls[0] == 1  # first call isolates the compile
    assert elapsed > 0
    # the source must thread the records into the artifact
    src = (REPO / "bench.py").read_text()
    assert 'record["compile_seconds"]' in src


def test_guard_passes_on_live_backend():
    # The probe subprocess inherits os.environ (the container pins
    # JAX_PLATFORMS=axon there even though conftest forces CPU
    # in-process) — point it at the CPU backend explicitly.
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    saved = {k: os.environ.get(k)
             for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")}
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    try:
        mod._require_devices()  # must not raise SystemExit
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_timing_discipline_forces_value_fetches():
    """Tripwire for the TIMING HONESTY rule (bench.py module docstring):
    over the axon relay, block_until_ready returns at DISPATCH for
    donated executables, so honest timing requires a forced value fetch
    (float(...)) inside every timed window. Assert (a) every
    ``timed*`` closure handed to _differential_elapsed contains a
    float(...) force, and (b) bench.py never relies on
    block_until_ready for timing (the documented foot-gun)."""
    import ast

    src = (REPO / "bench.py").read_text()
    assert "block_until_ready" not in src.replace(
        "block_until_ready does not reliably wait", ""), \
        "bench.py must not time via block_until_ready (dispatch latency)"

    tree = ast.parse(src)
    timed_funcs = [n for n in ast.walk(tree)
                   if isinstance(n, ast.FunctionDef)
                   and n.name.startswith("timed")]
    assert timed_funcs, "expected timed() closures in bench.py"
    for fn in timed_funcs:
        forces = [n for n in ast.walk(fn)
                  if isinstance(n, ast.Call)
                  and isinstance(n.func, ast.Name)
                  and n.func.id == "float"]
        assert forces, (f"bench.py:{fn.lineno} {fn.name}() has no "
                        "float(...) value-fetch force")
