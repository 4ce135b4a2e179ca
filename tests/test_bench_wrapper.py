"""bench.py outage wrapper: probe + measurement run in bounded children.

The axon tunnel has multi-hour outages where jax backend init hangs
(no exception), so `python bench.py` must never block forever — the
driver records no round number at all if it does. These tests exercise
the retry/timeout paths with subprocess.run monkeypatched; the real
measurement path is covered by running `bench.py --child` on CPU.
"""
import os
import subprocess
import sys

import pytest

# repo root (bench.py is not in the package); derived from this file so
# the suite survives out-of-root pytest invocation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
        # measurement children emit stderr noise then the one JSON line;
        # the parent must forward only the last line
        stdout = None
        if "--child" in argv:
            stdout = '{"metric": "m", "value": 1.0}\n'
        return subprocess.CompletedProcess(argv, 0, stdout=stdout)


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


def test_success_forwards_only_last_json_line(monkeypatch, capsys):
    rec = _run_main(monkeypatch, ["ok", "ok"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ['{"metric": "m", "value": 1.0}']


def test_empty_child_output_is_retried(monkeypatch):
    # a child that exits 0 without printing (tunnel died at the flush)
    # counts as a failed attempt, not a silent success
    rec = _Recorder(["ok", "ok", "ok", "ok"])

    def run(argv, timeout=None, check=False, **kw):
        res = rec(argv, timeout=timeout, check=check, **kw)
        if len(rec.calls) == 2:           # first measurement child
            res = subprocess.CompletedProcess(argv, 0, stdout="")
        return res

    monkeypatch.setattr(subprocess, "run", run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("MASKUNET_BENCH_TRIES", "3")
    monkeypatch.setenv("MASKUNET_BENCH_RETRY_SLEEP_S", "0")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    assert len(rec.calls) == 4            # probe, child, probe, child


def test_child_flag_routes_to_measurement(monkeypatch):
    # the __main__ dispatch: `--child N` runs one in-process measurement
    calls = []
    monkeypatch.setattr(bench, "_measure_and_print",
                        lambda batch: calls.append(batch))
    monkeypatch.setattr(bench, "main",
                        lambda: calls.append("parent"))
    bench._dispatch(["bench.py", "--child", "4"])
    assert calls == [4]
    bench._dispatch(["bench.py", "--child"])
    assert calls == [4, 8]                # default batch
    bench._dispatch(["bench.py", "16"])
    assert calls == [4, 8, "parent"]


def test_regression_gate_fields():
    # below 90% of best -> flagged; at/above -> not; no records -> no fields
    assert bench.regression_fields(100.0, 0.0) == {}
    f = bench.regression_fields(80.0, 100.0)
    assert f == {"best_recorded": 100.0, "regressed": True}
    f = bench.regression_fields(91.0, 100.0)
    assert f["regressed"] is False
    # train-rate gate rides under namespaced keys
    f = bench.regression_fields(150.0, 214.5, prefix="train_")
    assert f == {"train_best_recorded": 214.5, "train_regressed": True}


def test_best_recorded_scans_round_records(tmp_path):
    import json as _json

    (tmp_path / "BENCH_r01.json").write_text(_json.dumps(
        {"parsed": {"value": 530.1}}))
    (tmp_path / "BENCH_r03.json").write_text(_json.dumps(
        {"parsed": {"value": 729.0}}))
    (tmp_path / "BENCH_r04.json").write_text("not json {")   # tolerated
    (tmp_path / "BENCH_r05.json").write_text(_json.dumps({"rc": 1}))
    # a failed driver round records "parsed": null — must be tolerated,
    # not crash the measurement with AttributeError
    (tmp_path / "BENCH_r07.json").write_text(_json.dumps(
        {"parsed": None, "rc": 1}))
    # a different batch size never competes with the batch-8 history —
    # `bench.py 2` must not be flagged regressed against batch-8 bests
    (tmp_path / "BENCH_r06.json").write_text(_json.dumps(
        {"parsed": {"value": 900.0, "batch": 2}}))
    # train-rate history rides in the same records under its own field
    (tmp_path / "BENCH_r08.json").write_text(_json.dumps(
        {"parsed": {"value": 700.0, "train_images_per_sec": 214.5}}))
    assert bench.best_recorded(str(tmp_path)) == 729.0
    assert bench.best_recorded(str(tmp_path), batch=2) == 900.0
    assert bench.best_recorded(str(tmp_path), batch=4) == 0.0
    assert bench.best_recorded(str(tmp_path / "empty")) == 0.0
    assert bench.best_recorded(
        str(tmp_path), field="train_images_per_sec") == 214.5


def test_best_recorded_real_repo_records():
    # the in-repo round records must parse (the gate is only as good as
    # its inputs); as of r4 the best is 729.0
    assert bench.best_recorded() >= 729.0


def test_parent_batch_arg_reaches_child(monkeypatch):
    # plain `python bench.py <batch>`: the batch must ride into the
    # measurement child's argv
    rec = _run_main(monkeypatch, ["ok", "ok"])
    monkeypatch.setattr(sys, "argv", ["bench.py", "16"])
    bench.main()
    assert rec.calls[1][0][-2:] == ["--child", "16"]
