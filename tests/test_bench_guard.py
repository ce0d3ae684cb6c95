"""bench.py load-protocol guard (r8 VERDICT item 4): the harness must
WAIT for the 1-min load to clear the pin before timing, and stamp
protocol_violation when the host never idles — so a contaminated
record carries its own caveat (the BENCH_r08 failure mode: load_start
2.02 against a pinned "< 1" protocol, trustable only after a forensic
rerun)."""

from __future__ import annotations

import importlib
import os
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


def test_mid_run_violation_flags_foreign_load_fallback():
    """r11 VERDICT finding 1: BENCH_r11 recorded load_reps_max_1m 6.61
    with protocol_violation false — mid-run contention must now trip
    the flag. Loadavg ceiling is the FALLBACK path (foreign_cores is
    None, i.e. /proc attribution unavailable)."""
    bench = _bench()
    idle_run = [[1.8, 1.0, 0.5], [3.5, 2.0, 1.0], [2.1, 2.2, 1.1]]
    assert bench._mid_run_violation(idle_run, None) is False
    contaminated = idle_run + [[6.61, 4.0, 2.0]]
    assert bench._mid_run_violation(contaminated, None) is True
    assert bench._mid_run_violation([], None) is False


def test_mid_run_ceiling_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SELF_LOAD", "2.0")
    bench = _bench()
    assert bench.SELF_LOAD_CEILING == 2.0
    assert bench._mid_run_violation([[3.0, 1.0, 1.0]], None) is True


def test_mid_run_foreign_cpu_is_primary_signal():
    """r12: the primary mid-run guard is exact foreign-CPU attribution
    — a run whose OWN load exceeds the legacy ceiling must NOT trip
    when foreign CPU is low (the r12 idle-host run peaked at 5.89
    1-min load from its own wide shuffles: a ceiling false positive),
    and a low-load run WITH foreign CPU must trip."""
    bench = _bench()
    hot_self = [[5.89, 3.0, 2.0]]
    assert bench._mid_run_violation(hot_self, 0.1) is False
    assert bench._mid_run_violation([[0.5, 0.5, 0.5]], 2.7) is True


def test_foreign_cpu_cores_arithmetic(monkeypatch):
    """foreign cores = sum of OWN-jiffy deltas of processes outside
    the root's subtree (PID 1 excluded), / HZ / wall. snapshot format:
    pid -> (own utime+stime, ppid)."""
    bench = _bench()
    monkeypatch.setattr(bench.os, "sysconf", lambda _k: 100)
    root = 100
    # subtree: 100 <- 200 <- 300; foreign: 400; supervisor: 1
    s0 = {1: (0, 0), 100: (0, 1), 200: (0, 100), 300: (0, 200), 400: (0, 1)}
    s1 = {1: (9000, 0), 100: (500, 1), 200: (500, 100), 300: (2000, 200), 400: (3000, 1)}
    # only pid 400 counts: 3000 jiffies / 100 HZ / 10 s = 3 cores
    assert bench._foreign_cpu_cores(s0, s1, 10.0, root_pid=root) == 3.0
    # subtree + pid1 only -> 0
    s1b = {**s1, 400: (0, 1)}
    assert bench._foreign_cpu_cores(s0, s1b, 10.0, root_pid=root) == 0.0
    # a process born mid-window is counted from zero
    s1c = {**s1b, 500: (1000, 1)}
    assert bench._foreign_cpu_cores(s0, s1c, 10.0, root_pid=root) == 1.0
    assert bench._foreign_cpu_cores(None, s1, 10.0, root_pid=root) is None
    assert bench._foreign_cpu_cores(s0, s1, 0.0, root_pid=root) is None


def test_foreign_cpu_excludes_own_subtree_burn():
    """A live CHILD of this process burning CPU (the Spark JVM / its
    Python workers in the real bench) must NOT register as foreign."""
    import subprocess
    import time as _time

    bench = _bench()
    child = subprocess.Popen(
        [sys.executable, "-c", "import time;t=time.process_time()\nwhile time.process_time()-t<0.3: pass\ntime.sleep(5)"]
    )
    try:
        s0 = bench._proc_cpu_snapshot()
        t0 = _time.perf_counter()
        _time.sleep(0.6)  # child burns ~0.3 s CPU inside the window
        s1 = bench._proc_cpu_snapshot()
        wall = _time.perf_counter() - t0
        f_ours = bench._foreign_cpu_cores(s0, s1, wall)
        # same window re-attributed from a bogus root: OUR subtree
        # (incl. the burning child) now reads as foreign
        f_all = bench._foreign_cpu_cores(s0, s1, wall, root_pid=-1)
        assert f_ours is not None and f_all is not None
        child_jiffies = s1[child.pid][0] - s0.get(child.pid, (0, 0))[0]
        assert child_jiffies >= 20, child_jiffies  # burn actually happened
        # exclusion property, independent of ambient load: attributing
        # to the real root removes at least the child's burn
        hz = os.sysconf("SC_CLK_TCK") or 100
        assert f_all - f_ours >= (child_jiffies / hz / wall) * 0.9
    finally:
        child.kill()
        child.wait()


def test_foreign_cpu_excludes_kernel_threads_and_orphans(monkeypatch):
    """r12 ADVICE (low): kernel threads (PID 2's subtree) must not
    count as foreign — kworkers do the bench's own I/O writeback; and a
    bench descendant orphaned mid-window (reparented to PID 1 in the
    end snapshot) stays attributed to the bench because subtree
    membership accepts the ppid chain from EITHER snapshot."""
    bench = _bench()
    monkeypatch.setattr(bench.os, "sysconf", lambda _k: 100)
    root = 100
    # 300 is root's grandchild at s0; by s1 its parent exited and it
    # was reparented to PID 1. 7 is a kworker (child of kthreadd=2).
    s0 = {1: (0, 0), 2: (0, 0), 7: (0, 2), 100: (0, 1), 200: (0, 100), 300: (0, 200)}
    s1 = {1: (0, 0), 2: (500, 0), 7: (2000, 2), 100: (0, 1), 300: (4000, 1)}
    assert bench._foreign_cpu_cores(s0, s1, 10.0, root_pid=root) == 0.0
    # a real co-tenant in the same window still counts
    s1b = {**s1, 400: (3000, 1)}
    assert bench._foreign_cpu_cores(s0, s1b, 10.0, root_pid=root) == 3.0


def test_foreign_cpu_per_rep_windows_catch_short_lived_jobs(monkeypatch):
    """r12 ADVICE (medium): a foreign job that starts AND exits between
    two run-wide snapshots leaves no pid in the end snapshot and
    escaped attribution. Per-rep windows see it in the rep snapshot it
    straddles."""
    bench = _bench()
    monkeypatch.setattr(bench.os, "sysconf", lambda _k: 100)
    root = 100
    base = {1: (0, 0), 100: (0, 1)}
    s0 = dict(base)
    s_mid = {**base, 400: (2000, 1)}  # foreign job alive at rep boundary
    s1 = dict(base)  # ...and gone by the end
    # run-wide pair misses it entirely
    assert bench._foreign_cpu_cores(s0, s1, 10.0, root_pid=root) == 0.0
    # per-rep windows attribute the 2000 jiffies it burned while visible
    assert (
        bench._foreign_cpu_cores_reps([s0, s_mid, s1], 10.0, root_pid=root)
        == 2.0
    )
    # unavailable snapshots degrade to None (loadavg fallback engages)
    assert bench._foreign_cpu_cores_reps([s0, None, s1], 10.0, root_pid=root) is None
    assert bench._foreign_cpu_cores_reps([s0], 10.0, root_pid=root) is None


def test_proc_cpu_snapshot_shape():
    bench = _bench()
    s = bench._proc_cpu_snapshot()
    assert s is None or (os.getpid() in s and all(
        isinstance(v, tuple) and len(v) == 2 for v in s.values()
    ))
