"""bench.py outage behavior: a TPU tunnel failure must produce ONE
diagnosable JSON line (value=null + error field), never a crash or hang.

Round-4 hardening for the judge's round-3 finding: BENCH_r03.json recorded
rc=1 with no JSON record because backend init raised (or, in reproduction
attempts, slept indefinitely in the axon retry loop).
"""

import json
import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _json_lines(out):
    recs = []
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            recs.append(json.loads(line))
    return recs


def test_backend_unavailable_emits_failure_json(capsys, monkeypatch):
    bench = _load_bench()

    def boom():
        raise bench.BackendUnavailable("UNAVAILABLE: TPU backend setup")

    monkeypatch.setattr(bench, "probe_backend", boom)
    bench.main()
    recs = _json_lines(capsys.readouterr().out)
    assert len(recs) == 1, "bench must emit exactly one JSON line"
    rec = recs[0]
    assert rec["metric"] == "pose_proposal_sec_per_rescan"
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert rec["error"] == "tpu_unavailable"


def test_unexpected_exception_emits_failure_json(capsys, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "probe_backend", lambda: None)

    def boom():
        raise ValueError("synthetic mid-run failure")

    monkeypatch.setattr(bench, "run_bench", boom)
    bench.main()
    recs = _json_lines(capsys.readouterr().out)
    assert len(recs) == 1
    assert recs[0]["value"] is None
    assert "ValueError" in recs[0]["error"]


def test_probe_retries_then_raises(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "PROBE_ATTEMPTS", 3)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = []

    def fake_run(cmd, capture_output, text, timeout):
        calls.append(timeout)

        class R:
            returncode = 1
            stdout = ""
            stderr = "jax.errors.JaxRuntimeError: UNAVAILABLE"
        return R()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    with pytest.raises(bench.BackendUnavailable):
        bench.probe_backend()
    assert len(calls) == 3


def test_probe_hang_is_killed(monkeypatch):
    """A probe subprocess that hangs (the judge-observed failure mode) is
    bounded by the per-attempt timeout, not waited on forever."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "PROBE_ATTEMPTS", 2)
    monkeypatch.setattr(bench, "PROBE_TIMEOUT_S", 0.2)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    real_run = bench.subprocess.run

    def fake_run(cmd, capture_output, text, timeout):
        # replace the jax probe with a sleep long past the timeout
        return real_run([sys.executable, "-c", "import time; time.sleep(60)"],
                        capture_output=capture_output, text=text,
                        timeout=timeout)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    with pytest.raises(bench.BackendUnavailable, match="timed out"):
        bench.probe_backend()


def test_hard_timeout_alarm_emits_failure_json():
    """End-to-end: run bench.py as a subprocess with a tiny hard timeout and
    a run that sleeps; SIGALRM must convert it into the failure JSON."""
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", RESCAN_BENCH_TIMEOUT="2",
               RESCAN_BENCH_PROBE_ATTEMPTS="1")
    code = (
        "import bench, time\n"
        "bench.probe_backend = lambda: None\n"
        "bench.run_bench = lambda: time.sleep(30)\n"
        "bench.main()\n")
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    recs = _json_lines(r.stdout)
    assert len(recs) == 1
    assert recs[0]["value"] is None
    assert recs[0]["error"] == "timeout"
