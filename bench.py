#!/usr/bin/env python
"""Benchmark harness (reference O34, apps/nvdb_bench.cpp:254-432).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference harness shape: warmup pass to prime caches
(apps/nvdb_bench.cpp:317-322), then timed runs that fully materialize
results (anti-DCE: we count+collect, apps/nvdb_bench.cpp:332,358).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: the reference's own benchmark surface (flat scan /
# quantized scan / ANN+refine) plus one representative from each
# pipeline-extension family (dedup, text, relational, streaming).
# Grouped by family so SPARK_GRAFT_BENCH_RELEASE=1 can drain the
# registry caches between families (registry.release_caches()) — at
# larger sf this bounds executor storage to one family's working set
# instead of the whole run's accumulation; entries re-materialize
# transparently on next use.
BENCH_FAMILIES = (
    ("flat_scan", ("topk_dot", "topk_multi_twophase", "topk_multi_window")),
    ("quantized", ("topk_i8", "refine_i8")),
    ("ann", ("gt_build", "ivf_search")),
    ("dedup", ("minhash_lsh_pairs", "simhash64_pairs", "corpus_clean")),
    ("pipeline", ("pipeline_chunks_embed",)),
    ("relational", ("pricing_summary", "shipping_priority")),
    ("streaming", ("stream_event_counts",)),
)
BENCH_QUERIES = tuple(q for _, qs in BENCH_FAMILIES for q in qs)


def _host_fingerprint() -> dict:
    """CPU model + nominal MHz + core count, best-effort from
    /proc/cpuinfo (Linux-only; partial dict elsewhere)."""
    info: dict = {"n_cpus": os.cpu_count()}
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if ":" not in line:
                    continue
                k, v = (s.strip() for s in line.split(":", 1))
                if k == "model name" and "cpu_model" not in info:
                    info["cpu_model"] = v
                elif k == "cpu MHz" and "cpu_mhz" not in info:
                    try:
                        info["cpu_mhz"] = float(v)
                    except ValueError:
                        pass
    except OSError:
        pass
    return info


def _loadavg() -> list[float] | None:
    """1/5/15-minute load averages, best-effort (r7 VERDICT item 2:
    BENCH_r07 was load-contaminated and the artifact couldn't show it;
    recording load at start and per-rep makes contamination visible in
    the official record)."""
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - non-unix
        return None


# The load protocol the JSON telemetry exists to witness (PERF.md r8:
# "the bench runs only after every builder-side batch job has exited
# and the 1-minute load is < 1") — r8's official run violated it
# (load_start 2.02), so the harness now ENFORCES it: wait up to
# SPARK_GRAFT_BENCH_LOAD_WAIT seconds for the 1-min load to drop under
# the pin, and if it never does, stamp the record protocol_violation
# so no future round needs a forensic rerun to trust the headline.
LOAD_PIN = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_PIN", "1.0"))
LOAD_WAIT_S = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "300"))

# Mid-run contamination guard (r11 VERDICT finding 1): _wait_for_idle
# gates only the START of the run, so contention arriving mid-run was
# recorded (load_reps_max_1m) but never FLAGGED — BENCH_r11 shipped a
# 19.06 s headline with load_reps_max_1m 6.61 and protocol_violation
# false, and adjudicating it took a forensic rerun. The ceiling
# separates the bench's own load from foreign load: measured idle runs
# peak at 2.13 (r10 official) and 3.52 (r11 judge idle rerun) 1-min
# load from the bench's own bursts; the contaminated run hit 6.61.
#
# r12: the ceiling heuristic is now the FALLBACK only — the bench's
# own load profile moved with its plans (the r12 wide-then-coalesce
# shuffles sustain more runnable tasks; an idle-host r12 run peaked at
# 5.89 1-min load, a false positive against the 5.0 ceiling), proving
# a fixed loadavg ceiling cannot separate self from foreign load. The
# primary guard is direct attribution from /proc: per-process OWN
# utime+stime deltas over the timed-rep window, summed over processes
# outside this bench's subtree (see _foreign_cpu_cores for the exact
# exclusions and why), normalized to average foreign cores. The
# bench's own work is excluded exactly (the Spark JVM and Python
# workers are subtree descendants), so the threshold can be tight
# regardless of how parallel our own plans are.
SELF_LOAD_CEILING = float(os.environ.get("SPARK_GRAFT_BENCH_SELF_LOAD", "5.0"))

# Average foreign cores during timed reps above which the record is
# stamped contaminated. Idle-host noise (kernel threads, monitoring)
# measures well under 0.2 cores; the r11 contamination was ~3 cores.
FOREIGN_CPU_CORES = float(os.environ.get("SPARK_GRAFT_BENCH_FOREIGN_CPU", "1.0"))


def _proc_cpu_snapshot() -> dict[int, tuple[int, int]] | None:
    """pid -> (own utime+stime jiffies, ppid) for every live process.
    OWN time only (no cutime/cstime): per-pid deltas must not jump
    when a process reaps a child — measured live, the parent shell of
    an exiting Spark driver otherwise 'gains' the driver's whole CPU
    in one tick and reads as a foreign burst."""
    try:
        pids = [int(d) for d in os.listdir("/proc") if d.isdigit()]
    except OSError:  # pragma: no cover - non-linux
        return None
    out: dict[int, tuple[int, int]] = {}
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as fh:
                raw = fh.read()
        except OSError:
            continue  # exited between listdir and read
        # comm may contain spaces/parens: split after the LAST ')'
        rest = raw.rsplit(")", 1)[1].split()
        # rest[1]=ppid, rest[11]=utime, rest[12]=stime
        out[pid] = (int(rest[11]) + int(rest[12]), int(rest[1]))
    return out


def _foreign_jiffies(
    snap0: dict[int, tuple[int, int]],
    snap1: dict[int, tuple[int, int]],
    root: int,
) -> int:
    """OWN-jiffy deltas between two snapshots summed over processes
    OUTSIDE the bench's subtree — the contamination numerator.
    Excluded:

    - the bench subtree itself (this process, the Spark JVM, Python
      workers). Membership is a ppid-chain walk accepted from EITHER
      snapshot (r12 ADVICE: a bench descendant orphaned mid-window —
      e.g. a pyspark daemon whose parent exited — is reparented to
      PID 1 in the end snapshot and would otherwise read as foreign);
    - PID 1 (the container supervisor): measured on this sandbox, its
      CPU TRACKS the bench's own I/O volume (~4 cores during an
      8-core run with nothing else on the box), so counting it makes
      the bench's own activity read as contamination. A real co-tenant
      runs as its own pid(s) and is still counted;
    - PID 2 and its subtree (kernel threads — r12 ADVICE: kworkers
      doing the bench's OWN I/O writeback otherwise count as foreign).
    """
    maps = (
        {pid: pp for pid, (_, pp) in snap0.items()},
        {pid: pp for pid, (_, pp) in snap1.items()},
    )

    def chain_hits(pid: int, target: int) -> bool:
        for ppid in maps:
            p = pid
            seen: set[int] = set()
            while p > 0 and p not in seen:
                if p == target:
                    return True
                seen.add(p)
                p = ppid.get(p, 0)
        return False

    foreign = 0
    for pid, (j1, _) in snap1.items():
        if pid in (1, 2) or chain_hits(pid, root) or chain_hits(pid, 2):
            continue
        j0 = snap0.get(pid, (0, 0))[0]
        if j1 > j0:
            foreign += j1 - j0
    return foreign


def _foreign_cpu_cores(
    snap0: dict[int, tuple[int, int]] | None,
    snap1: dict[int, tuple[int, int]] | None,
    wall_s: float,
    root_pid: int | None = None,
) -> float | None:
    """Average foreign cores over one snapshot window (see
    _foreign_jiffies for the attribution rules). Processes that start
    AND exit strictly inside the window escape this pair's attribution
    — which is why main() snapshots per timed rep and sums the per-rep
    deltas (_foreign_cpu_cores_reps), so only sub-rep-lifetime
    processes can escape; the load telemetry (load_reps_max_1m) still
    records those. None when /proc was unreadable."""
    if snap0 is None or snap1 is None or wall_s <= 0:
        return None
    root = os.getpid() if root_pid is None else root_pid
    hz = os.sysconf("SC_CLK_TCK") or 100
    return round(_foreign_jiffies(snap0, snap1, root) / hz / wall_s, 3)


def _foreign_cpu_cores_reps(
    snaps: list[dict[int, tuple[int, int]] | None],
    wall_s: float,
    root_pid: int | None = None,
) -> float | None:
    """Average foreign cores over the whole timed window, attributed
    from PER-REP snapshot pairs (r12 ADVICE fix: a foreign job that
    started and exited between two RUN-WIDE snapshots was invisible to
    the end snapshot's pid listing and escaped both guards; narrowing
    each attribution window to one rep shrinks the escape to processes
    whose whole lifetime fits inside a single rep). None when any
    snapshot was unavailable."""
    if wall_s <= 0 or len(snaps) < 2 or any(s is None for s in snaps):
        return None
    root = os.getpid() if root_pid is None else root_pid
    foreign = sum(
        _foreign_jiffies(s0, s1, root)  # type: ignore[arg-type]
        for s0, s1 in zip(snaps, snaps[1:])
    )
    hz = os.sysconf("SC_CLK_TCK") or 100
    return round(foreign / hz / wall_s, 3)


def _mid_run_violation(
    load_samples: list[list[float]], foreign_cores: float | None = None
) -> bool:
    """True when another job measurably shared the machine DURING the
    timed reps. Primary signal: attributed foreign CPU (exact; see
    FOREIGN_CPU_CORES). Fallback when /proc attribution is unavailable:
    the legacy 1-min-loadavg ceiling."""
    if foreign_cores is not None:
        return foreign_cores > FOREIGN_CPU_CORES
    return bool(load_samples) and max(s[0] for s in load_samples) > SELF_LOAD_CEILING


def _wait_for_idle() -> bool:
    """Block (bounded) until the 1-min load clears the pin. Returns
    True if the protocol is violated (still hot at the deadline)."""
    la = _loadavg()
    if la is None:  # pragma: no cover - non-unix
        return False
    deadline = time.monotonic() + LOAD_WAIT_S
    while la[0] >= LOAD_PIN:
        if time.monotonic() >= deadline:
            print(
                f"# WARNING load {la} still >= pin {LOAD_PIN} after "
                f"{LOAD_WAIT_S:.0f}s wait; recording protocol_violation",
                file=sys.stderr,
            )
            return True
        print(
            f"# load {la} >= pin {LOAD_PIN}; waiting for idle host",
            file=sys.stderr,
        )
        time.sleep(15)
        la = _loadavg()
    return False


def _calibrate(spark) -> dict:
    """Single-core calibration microbenchmark (r9 VERDICT item 6): the
    sandbox alternates between host classes (~2.1 vs ~2.7 GHz nominal)
    whose uniform ~1.5x wall shift reads as a plan regression in raw
    cross-round comparison. Fixed-iteration work pins the host's
    single-thread speed next to the headline so any round's total can
    be normalized: same plans on a host with calibration_s 1.5x larger
    SHOULD be ~1.5x slower.

    Two components, both deliberately single-threaded and
    deterministic-iteration (elementwise NumPy never spawns BLAS
    threads, unlike matmul; the JVM spin is one codegen task on one
    partition): numpy_s covers the Arrow/UDF side of the engine,
    jvm_s the whole-stage-codegen side. min-of-3 each, the same
    de-noised estimator the timed queries use. Runs AFTER warmup and
    BEFORE the timed reps, so it never perturbs the protocol."""
    import numpy as np

    def min3(fn) -> float:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 4)

    # 2M doubles stays L3-cache-resident on both host classes, so the
    # kernel measures core speed, not memory bandwidth (a 16M-element
    # variant measured 15-30 s and rep-noisy — bandwidth-bound with
    # 128 MB temporaries; this one holds ~0.9 s even at loadavg 2.4)
    x = np.arange(1 << 21, dtype=np.float64) * 1e-6

    def numpy_kernel():
        y = x
        acc = 0.0
        for _ in range(300):
            y = y * 1.0000001 + 0.5
            acc += float(y[::65536].sum())
        return acc

    def jvm_kernel():
        spark.range(600_000_000, numPartitions=1).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).collect()

    out = {"numpy_s": min3(numpy_kernel), "jvm_s": min3(jvm_kernel)}
    out["total_s"] = round(out["numpy_s"] + out["jvm_s"], 4)
    return out


def main() -> None:
    from nano_vectordb_spark import registry
    from nano_vectordb_spark.session import get_spark

    violations: list[str] = []
    if _wait_for_idle():
        violations.append("start_wait_timeout")
    spark = get_spark(app_name="nvdb-bench", cpus=CPUS)

    # warmup: prime the file cache + JVM + Python UDF workers (the
    # reference warmup loop primes the same per-process one-time costs)
    for t in ("embeddings", "documents"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    import pandas as pd  # noqa: F401  (workers import it on first use)

    spark.range(int(CPUS) * 4, numPartitions=int(CPUS)).mapInPandas(
        lambda it: it, "id long"
    ).count()

    calibration = _calibrate(spark)

    # REPS timed runs per query, report the min — the reference harness
    # also loops timed runs per config (apps/nvdb_bench.cpp:332,358);
    # min is the standard de-noised single-node estimator.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    release_between = os.environ.get("SPARK_GRAFT_BENCH_RELEASE", "") == "1"
    load_start = _loadavg()
    load_samples: list[list[float]] = []
    timings: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    reps_wall0 = time.perf_counter()
    # per-REP snapshots (r12 ADVICE): attribution windows narrow to one
    # rep each, so a foreign job must start and exit within a single
    # rep to escape the pid listing. Snapshots are taken BETWEEN reps
    # (after each rep's clock stops), never inside a timed span.
    cpu_snaps: list[dict[int, tuple[int, int]] | None] = [_proc_cpu_snapshot()]
    for _family, names in BENCH_FAMILIES:
        for name in names:
            fn = registry.REGISTRY[name].fn
            ts: list[float] = []
            for _ in range(reps):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                n = df.count()  # materialize the full result
                ts.append(time.perf_counter() - t0)
                assert n >= 0
                la = _loadavg()
                if la is not None:
                    load_samples.append(la)
                cpu_snaps.append(_proc_cpu_snapshot())
            timings[name] = round(min(ts), 4)
            rep_times[name] = [round(t, 4) for t in ts]
        if release_between:
            registry.release_caches()
    foreign_cores = _foreign_cpu_cores_reps(
        cpu_snaps, time.perf_counter() - reps_wall0
    )
    # Re-run the calibration AFTER the reps: this sandbox's host speed
    # drifts up to ~1.6x WITHIN a session (hypervisor-level, invisible
    # to in-guest process accounting — foreign_cpu_cores_avg ~0 while
    # headlines move proportionally to calibration). The start/end
    # pair witnesses whether the timed window itself sat on a fast or
    # slow phase, which single-point calibration cannot show.
    calibration_end = _calibrate(spark)
    if _mid_run_violation(load_samples, foreign_cores):
        print(
            f"# WARNING mid-run foreign CPU {foreign_cores} cores (ceiling "
            f"{FOREIGN_CPU_CORES}) / 1-min load ceiling {SELF_LOAD_CEILING}; "
            f"recording protocol_violation",
            file=sys.stderr,
        )
        violations.append("mid_run_load")
    total = round(sum(timings.values()), 4)
    # medians alongside the mins (r12 VERDICT item 7 — ADDITIONS only:
    # "value"/"queries" stay min-of-3 for round-over-round continuity;
    # the median is the robust companion on a host whose speed drifts
    # ~1.6x at hypervisor level within a session)
    med = {
        name: round(sorted(ts)[len(ts) // 2], 4)
        for name, ts in rep_times.items()
    }
    total_median = round(sum(med.values()), 4)
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # r13: medians next to the mins (additive; see `med`)
                "value_median": total_median,
                "queries_median": med,
                # every rep per query (first rep includes one-time
                # materialization/caching) — makes machine-state noise
                # visible in the official record instead of only the min
                "query_reps": rep_times,
                "sf": sf,
                # host fingerprint: bench totals are only comparable
                # across rounds on the same machine class (the r6->r7
                # rotation showed a uniform ~1.25x shift on untouched
                # queries from a host change alone)
                "host": _host_fingerprint(),
                # single-core fixed-iteration microbenchmark: divide a
                # round's headline by (calibration_s ratio) before
                # comparing across host classes (r9 VERDICT item 6)
                "calibration_s": calibration["total_s"],
                "calibration": calibration,
                "calibration_end_s": calibration_end["total_s"],
                # load telemetry: load_start is the 1/5/15-min loadavg
                # BEFORE the first timed rep — the contamination signal
                # (the bench's own 32 threads inflate the 1-min average
                # DURING the run, so load_start/15-min are what to read;
                # a load_start 1-min well above 0 on a dedicated box
                # means another job shared the machine, as in BENCH_r07)
                "load_start": load_start,
                "load_reps_max_1m": (
                    round(max(s[0] for s in load_samples), 2)
                    if load_samples
                    else None
                ),
                # r8 VERDICT item 4 + r11 finding 1: True when the
                # host never went idle before the run OR foreign load
                # arrived mid-run (1-min load above the bench's own
                # idle-host ceiling during timed reps) — either way the
                # headline must be read with that caveat, and
                # violation_reasons says which gate tripped
                "protocol_violation": bool(violations),
                "violation_reasons": violations,
                "load_pin": LOAD_PIN,
                "self_load_ceiling": SELF_LOAD_CEILING,
                # r12: exact mid-run contamination attribution — CPU
                # consumed by processes outside this bench's subtree,
                # in average cores over the timed-rep window (replaces
                # the loadavg ceiling as the primary mid_run_load
                # signal; the ceiling stays as the non-/proc fallback)
                "foreign_cpu_cores_avg": foreign_cores,
                "foreign_cpu_ceiling": FOREIGN_CPU_CORES,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
