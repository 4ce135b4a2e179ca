"""bench.py outage wrapper: probe + measurement run in bounded children.

The axon tunnel has multi-hour outages where jax backend init hangs
(no exception), so `python bench.py` must never block forever — the
driver records no round number at all if it does. These tests exercise
the retry/timeout paths with subprocess.run monkeypatched; the real
measurement path is covered by running `bench.py --child` on CPU.
"""
import subprocess
import sys

import pytest

sys.path.insert(0, ".")  # repo root (bench.py is not in the package)
import bench  # noqa: E402


class _Recorder:
    def __init__(self, outcomes):
        """outcomes: list of 'ok' | 'timeout' | 'fail', consumed per call."""
        self.outcomes = list(outcomes)
        self.calls = []

    def __call__(self, argv, timeout=None, check=False, **kw):
        self.calls.append((list(argv), timeout))
        out = self.outcomes.pop(0)
        if out == "timeout":
            raise subprocess.TimeoutExpired(argv, timeout)
        if out == "fail":
            raise subprocess.CalledProcessError(1, argv)
        return subprocess.CompletedProcess(argv, 0)


def _run_main(monkeypatch, outcomes, tries=3):
    rec = _Recorder(outcomes)
    monkeypatch.setattr(subprocess, "run", rec)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("MASKUNET_BENCH_TRIES", str(tries))
    monkeypatch.setenv("MASKUNET_BENCH_RETRY_SLEEP_S", "0")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    return rec


def test_success_first_try(monkeypatch):
    rec = _run_main(monkeypatch, ["ok", "ok"])
    bench.main()
    # probe child then measurement child
    assert len(rec.calls) == 2
    assert rec.calls[0][0][1] == "-c"          # probe: python -c <matmul>
    assert "--child" in rec.calls[1][0]        # measurement child
    assert rec.calls[1][1] is not None         # bounded


def test_probe_hang_then_recovery(monkeypatch):
    # attempt 1: probe hangs (tunnel down); attempt 2: probe ok, bench ok
    rec = _run_main(monkeypatch, ["timeout", "ok", "ok"])
    bench.main()
    assert len(rec.calls) == 3


def test_measurement_hang_then_recovery(monkeypatch):
    # probe passes but the tunnel dies mid-measurement; retried
    rec = _run_main(monkeypatch, ["ok", "timeout", "ok", "ok"])
    bench.main()
    assert len(rec.calls) == 4


def test_permanent_outage_exits_nonzero(monkeypatch):
    rec = _run_main(monkeypatch, ["timeout"] * 3, tries=3)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    assert len(rec.calls) == 3                 # bounded: one probe per try


def test_child_flag_routes_to_measurement():
    # the dispatch in __main__ uses argv[1] == "--child"; guard the
    # contract that plain `python bench.py <batch>` still parses a batch
    assert bench._PROBE.startswith("import jax")
