"""bench.py load-protocol guard (r8 VERDICT item 4): the harness must
WAIT for the 1-min load to clear the pin before timing, and stamp
protocol_violation when the host never idles — so a contaminated
record carries its own caveat (the BENCH_r08 failure mode: load_start
2.02 against a pinned "< 1" protocol, trustable only after a forensic
rerun)."""

from __future__ import annotations

import importlib
import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return importlib.reload(bench)


def test_wait_for_idle_passes_through_when_idle(monkeypatch):
    bench = _bench()
    monkeypatch.setattr(bench, "_loadavg", lambda: [0.2, 0.5, 0.5])
    assert bench._wait_for_idle() is False


def test_wait_for_idle_waits_then_clears(monkeypatch):
    bench = _bench()
    samples = iter([[2.5, 2.0, 1.0], [1.4, 1.8, 1.0], [0.4, 1.5, 1.0]])
    monkeypatch.setattr(bench, "_loadavg", lambda: next(samples))
    sleeps: list[float] = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    assert bench._wait_for_idle() is False
    assert len(sleeps) == 2  # two hot samples -> two waits -> idle


def test_wait_for_idle_stamps_violation_at_deadline(monkeypatch):
    bench = _bench()
    monkeypatch.setattr(bench, "_loadavg", lambda: [3.0, 3.0, 3.0])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # force the deadline to be already past after the first check
    monkeypatch.setattr(bench, "LOAD_WAIT_S", -1.0)
    assert bench._wait_for_idle() is True


def test_wait_for_idle_best_effort_without_loadavg(monkeypatch):
    bench = _bench()
    monkeypatch.setattr(bench, "_loadavg", lambda: None)
    assert bench._wait_for_idle() is False


def test_calibration_shape_and_determinism(monkeypatch):
    """r9 VERDICT item 6: the BENCH JSON must carry a single-core
    calibration microbenchmark so headlines normalize across the two
    sandbox host classes. Shape: numpy_s + jvm_s = total_s, all
    positive; the JVM spin must run on ONE partition (single core) —
    pinned via a fake spark session that records the partition count."""
    bench = _bench()

    calls: list[int] = []

    class _FakeDF:
        def selectExpr(self, *_a):
            return self

        def collect(self):
            return [(1,)]

    class _FakeSpark:
        def range(self, _n, numPartitions=None):
            calls.append(numPartitions)
            return _FakeDF()

    cal = bench._calibrate(_FakeSpark())
    assert set(cal) == {"numpy_s", "jvm_s", "total_s"}
    assert cal["numpy_s"] > 0 and cal["jvm_s"] >= 0
    assert cal["total_s"] == round(cal["numpy_s"] + cal["jvm_s"], 4)
    assert calls and all(p == 1 for p in calls)


def test_mid_run_violation_flags_foreign_load():
    """r11 VERDICT finding 1: BENCH_r11 recorded load_reps_max_1m 6.61
    with protocol_violation false — mid-run contention must now trip
    the flag. The ceiling separates the bench's own idle-host load
    (measured peaks 2.13 / 3.52) from foreign load (6.61)."""
    bench = _bench()
    idle_run = [[1.8, 1.0, 0.5], [3.5, 2.0, 1.0], [2.1, 2.2, 1.1]]
    assert bench._mid_run_violation(idle_run) is False
    contaminated = idle_run + [[6.61, 4.0, 2.0]]
    assert bench._mid_run_violation(contaminated) is True
    assert bench._mid_run_violation([]) is False


def test_mid_run_ceiling_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SELF_LOAD", "2.0")
    bench = _bench()
    assert bench.SELF_LOAD_CEILING == 2.0
    assert bench._mid_run_violation([[3.0, 1.0, 1.0]]) is True
