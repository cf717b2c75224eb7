"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query executes end-to-end into the noop sink — full plan runs
(scan → shuffle → aggregate), nothing collects to the driver, so the
timing reflects cluster-shaped execution, not driver serialization.

Self-validation (r10 redesign — r9's start/end scan-shaped calibration
stamped `contaminated: false` while ~19 phantom ≥1.5× round-over-round
deltas shipped): a fixed AGGREGATE-shaped calibration query
(`rollup_moments_stddev` — it feels the same JVM heap/GC pressure that
inflates the payload queries; the old `zorder_key_parts` scan did not)
is timed at the start, after every $SPARK_GRAFT_BENCH_CAL_EVERY
(default 25) queries, and at the end, against a stored idle reference.
Every query whose FLANKING checkpoint deviates >1.3× is stamped into
the payload's `suspect` map — contamination that begins mid-window is
caught by the closing checkpoint, so the whole window between the last
good and the first bad calibration is (correctly) under suspicion.
tools/bench_compare.py separates suspect deltas from adjudicable ones.

Self-test hooks (used by tests/test_bench_calibration.py):
  SPARK_GRAFT_BENCH_ONLY=q1,q2   run only these queries (plus the
                                 calibration query), in the given order
  SPARK_GRAFT_BENCH_CAL_EVERY=N  checkpoint interval
  SPARK_GRAFT_BENCH_PRESSURE=a:b spawn CPU-burner processes while
                                 queries with run-index in [a, b) run —
                                 a synthetic mid-run contamination whose
                                 window the suspect map must flag
  SPARK_GRAFT_BENCH_OUT=path     write the payload copy here. Default:
                                 BENCH_LOCAL.json for FULL runs only —
                                 subset (BENCH_ONLY) runs write nothing
                                 unless this is set, so self-tests never
                                 clobber the last full-run payload.

Idle references are per-SF (BENCH_CALIBRATION.json `idle_sec_by_sf`,
recorded once on an idle host by tools/record_calibration.py); a run at
an SF with no stored ref self-references the LOWER-median non-opening
checkpoint (contamination only inflates, so the lower median stays in
the clean half; the opening checkpoint carries warm-start drift and is
excluded from ref selection).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CAL_NAME = "rollup_moments_stddev"
CAL_THRESHOLD = 1.3


def flag_suspects(order: list[str], checkpoints: list[tuple[int, float]],
                  idle_ref: float | None,
                  thr: float = CAL_THRESHOLD) -> dict[str, float]:
    """Per-query suspicion from interleaved calibration checkpoints.

    ``order``: query names in run order. ``checkpoints``: (pos, sec)
    pairs where pos = number of queries completed when the calibration
    ran (0 = before the first). A query is suspect when EITHER flanking
    checkpoint (the last at pos <= its index, or the first after it)
    deviates more than ``thr``× from ``idle_ref`` — contamination that
    starts mid-window only shows in the closing checkpoint, so the
    whole window is tainted. Returns {name: worst flanking ratio}.
    Pure function — unit-tested directly."""
    if not idle_ref or idle_ref <= 0:
        return {}
    cps = sorted((p, s) for p, s in checkpoints if s >= 0)
    if not cps:
        return {}
    out: dict[str, float] = {}
    for i, name in enumerate(order):
        before = [s for p, s in cps if p <= i]
        after = [s for p, s in cps if p > i]
        flank = ([before[-1]] if before else []) + ([after[0]] if after else [])
        worst = max(flank) / idle_ref
        if worst > thr:
            out[name] = round(worst, 2)
    return out


def select_self_ref(checkpoints: list[tuple[int, float]]) -> float | None:
    """Fallback calibration reference when no stored idle ref exists for
    the run's SF: the LOWER-median checkpoint, excluding the opening
    (pos-0) one. Contamination only INFLATES checkpoints, so the lower
    median stays inside the clean half even when half the non-opening
    checkpoints are tainted; the opening checkpoint is excluded because
    it systematically carries residual warm-start drift (r10: pos-0
    read 1.28x despite the x2 warm-up, became the upper median, and
    absorbed a 1.4x pressured checkpoint — the teeth test flaked).
    Pure function — unit-tested directly."""
    good = sorted(s for p, s in checkpoints if s > 0 and p > 0)
    if not good:  # degenerate: only the opening checkpoint exists
        good = sorted(s for _, s in checkpoints if s > 0)
    return good[(len(good) - 1) // 2] if good else None


def _start_burners(n: int):
    """CPU-contention injection for the calibration self-test."""
    import multiprocessing as mp

    def burn():
        x = 1.0
        while True:
            x = x * 1.0000001 % 1e9 + 1.0

    procs = [mp.Process(target=burn, daemon=True) for _ in range(n)]
    for p in procs:
        p.start()
    return procs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    cal_every = int(os.environ.get("SPARK_GRAFT_BENCH_CAL_EVERY", "25"))
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    pressure = os.environ.get("SPARK_GRAFT_BENCH_PRESSURE")

    import __spark_entry__ as entry
    from crysda_spark.session import get_spark

    spark = get_spark("crysda_bench")

    # Size the shuffle-partition count from the ACTUAL input bytes of
    # this run's scale factor (floored at core count, so sf0.1-local
    # keeps its 32; a 100 TB run would land in the tens of thousands).
    from crysda_spark.plans.sizing import apply_recommended_shuffle_partitions
    n_parts = apply_recommended_shuffle_partitions(spark, sf_dir)
    print(f"# shuffle partitions sized to {n_parts} for {sf_dir}",
          file=sys.stderr)

    qs = entry.queries()
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        qs = {n: qs[n] for n in names}
    # warm the JVM + parquet footer caches with one tiny action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    cal_ref = None
    ref_source = None
    cal_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_CALIBRATION.json")
    try:
        with open(cal_path) as fh:
            ref = json.load(fh)
        if ref.get("query") == CAL_NAME:
            # r11: per-SF idle refs (idle_sec_by_sf, recorded by
            # tools/record_calibration.py) — the r10 single-SF file
            # left sf0.01/sf0.001 runs self-referencing checkpoints,
            # which absorbed taint when a minority were clean. The
            # legacy top-level (sf, idle_sec) pair still reads.
            by_sf = ref.get("idle_sec_by_sf") or {}
            key = f"{sf:g}"
            if key in by_sf:
                cal_ref = float(by_sf[key])
                ref_source = "stored_idle"
            elif ref.get("sf") == sf and "idle_sec" in ref:
                cal_ref = float(ref["idle_sec"])
                ref_source = "stored_idle"
    except (OSError, ValueError, KeyError):
        pass

    def _cleanup():
        from crysda_spark.plans.cache import release_pinned
        release_pinned()
        spark.catalog.clearCache()
        # clearCache does NOT release localCheckpoint RDDs or
        # broadcasts whose py4j handles are already unreferenced —
        # Spark's ContextCleaner frees those only after a DRIVER
        # GC. Iterative/broadcast-heavy queries (CC, PageRank,
        # k-means, PQ) otherwise leak executor storage across the
        # run and later heavyweight queries get timed under memory
        # pressure (measured 2.4x inflation by query ~120).
        import gc
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass

    cal_fn = entry.queries().get(CAL_NAME)

    def calibrate() -> float:
        if cal_fn is None:
            return -1.0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            cal_fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            _cleanup()
        return round(best, 3)

    def loadavg1() -> float:
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return -1.0

    def run_once(name, fn) -> float:
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        except Exception as e:  # a failing query must not hide the rest
            print(f"# bench error in {name}: {str(e).splitlines()[0][:160]}",
                  file=sys.stderr)
            return -1.0
        finally:
            # drop persisted blocks a query pinned (LSH band tables etc.)
            # so later queries aren't timed against accumulated cache
            _cleanup()

    load_start = loadavg1()
    if cal_fn is not None:
        # untimed warm-up ×2: the first calibration executions pay
        # Janino compile + shuffle/cache cold-start, which would
        # inflate the opening checkpoint (measured ~1.7-2.0x with ONE
        # warm-up run) and mis-flag the head of the run
        run_once(CAL_NAME, cal_fn)
        run_once(CAL_NAME, cal_fn)
    checkpoints: list[tuple[int, float]] = [(0, calibrate())]

    p_start = p_end = -1
    burners: list = []
    if pressure:
        p_start, p_end = (int(x) for x in pressure.split(":"))

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    errors: dict[str, int] = {}
    order: list[str] = []
    for idx, (name, fn) in enumerate(qs.items()):
        if idx == p_start:
            burners = _start_burners(2 * (os.cpu_count() or 8))
            print(f"# pressure injection ON at query {idx}", file=sys.stderr)
        # median-of-3 for EVERY query: the host has bursty external CPU
        # contention (r3→r4 showed 8× swings on identical code), and the
        # first run also pays one-time Janino codegen compile — neither is
        # a property of the query plan. The median is robust to one bad
        # run in either direction, making round-over-round 2× comparisons
        # adjudicable. queries_min records the per-query best run — the
        # strongest noise-rejector when comparing PLANS across rounds
        # (sub-second queries still swing ±1 s with host contention).
        runs = [run_once(name, fn) for _ in range(3)]
        ok = sorted(t for t in runs if t >= 0)
        # lower median: index 1 of 3; min of 2 if one run errored
        timings[name] = ok[(len(ok) - 1) // 2] if ok else -1.0
        timings_min[name] = ok[0] if ok else -1.0
        if len(ok) < len(runs):
            # intermittent failures must stay visible: a median over the
            # surviving runs alone would silently hide a 1-in-3 crasher
            errors[name] = len(runs) - len(ok)
        order.append(name)
        if idx + 1 == p_end and burners:
            for p in burners:
                p.terminate()
            burners = []
            print(f"# pressure injection OFF after query {idx}",
                  file=sys.stderr)
        if (idx + 1) % cal_every == 0 and idx + 1 < len(qs):
            checkpoints.append((idx + 1, calibrate()))
    if burners:
        for p in burners:
            p.terminate()
    checkpoints.append((len(order), calibrate()))
    load_end = loadavg1()

    if cal_ref is None:
        # see select_self_ref — a run where MOST checkpoints are
        # contaminated still needs the stored idle ref to be caught
        cal_ref = select_self_ref(checkpoints)
        if cal_ref is not None:
            ref_source = "lower_median_checkpoint"

    suspect = flag_suspects(order, checkpoints, cal_ref)
    contaminated = None
    if cal_ref and cal_ref > 0:
        ratios = [s / cal_ref for _, s in checkpoints if s >= 0]
        contaminated = bool(ratios and max(ratios) > CAL_THRESHOLD)
    if contaminated:
        print(f"# WARNING: bench contaminated — calibration {CAL_NAME} "
              f"checkpoints {checkpoints} vs idle ref {cal_ref}s "
              f"(>{CAL_THRESHOLD}x); {len(suspect)} queries stamped "
              "suspect — treat their deltas accordingly", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # r16 (VERDICT r15 #3): a drifted host window must not masquerade as
    # a code regression (or improvement) — report the total additionally
    # NORMALIZED by this run's calibration ratio. cal_mean excludes the
    # opening checkpoint (it systematically carries warm-start drift,
    # see select_self_ref); value_normalized = value · idle_ref/cal_mean
    # rescales the run onto the stored-idle host speed. Additions only:
    # "value" stays the raw total the driver compares.
    cal_vals = [s for p, s in checkpoints if s > 0 and p > 0] \
        or [s for _, s in checkpoints if s > 0]
    cal_mean = round(sum(cal_vals) / len(cal_vals), 3) if cal_vals else None
    norm = (round(total * cal_ref / cal_mean, 3)
            if cal_ref and cal_mean else None)
    payload = json.dumps({
        "metric": "total_query_seconds",
        "value": total,
        "value_normalized": norm,
        "unit": "sec",
        "queries_errors": errors,
        "sf": sf,
        "calibration": {"query": CAL_NAME, "idle_ref": cal_ref,
                        "ref_source": ref_source, "cal_mean": cal_mean,
                        "checkpoints": [[p, s] for p, s in checkpoints],
                        "cal_every": cal_every,
                        "load_avg_start": load_start,
                        "load_avg_end": load_end},
        "suspect": suspect,
        "contaminated": contaminated,
        # queries/queries_min LAST: the driver stores only a ~2000-char
        # TAIL of stdout, so trailing placement maximizes how much of
        # the per-query map survives in the captured window (r15 judge
        # recovered per-query data from the tail by regex)
        "queries_min": timings_min,
        "queries": timings,
    })
    print(payload)
    # the driver's stdout capture has truncated mid-JSON before (r4 lost
    # the first ~9 of 82 timings); persist a full copy so totals are
    # always auditable from the repo. Subset runs (SPARK_GRAFT_BENCH_ONLY
    # — self-tests, iteration loops) must NOT clobber the last FULL run's
    # payload (r10 judge finding): they only write when an explicit
    # SPARK_GRAFT_BENCH_OUT path is given.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path is None and not only:
        out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_LOCAL.json")
    if out_path:
        try:
            with open(out_path, "w") as fh:
                fh.write(payload + "\n")
        except OSError:
            pass
    # r16 (VERDICT r15 #2/#4): the driver's round-over-round comparator
    # came back empty (per_query {}, geomean null) because only a
    # ~2000-char stdout tail survives and the big payload line does not
    # fit it. The full 202-query map can NEVER fit 2000 chars (names
    # alone exceed it), so emit the per-query timings as SMALL
    # SELF-CONTAINED JSON lines (~1.2 KB each): whatever suffix of the
    # output the driver captures contains complete, parseable chunk
    # objects carrying a "queries" map. Additions only — the payload
    # line and the final headline line keep their r12 contract.
    names_sorted = sorted(timings)
    chunk = 30
    n_parts = (len(names_sorted) + chunk - 1) // chunk
    for i in range(n_parts):
        part = {n: timings[n] for n in names_sorted[i * chunk:(i + 1) * chunk]}
        print(json.dumps({"metric": "bench_queries_chunk",
                          "part": i + 1, "of": n_parts, "queries": part}))
    # the driver tail-captures stdout and has lost the HEAD of the ~4 KB
    # payload line two rounds running (BENCH_r04/r05 "parsed": null) —
    # repeat the headline numbers in one tiny final line so any
    # tail-window contains a complete, parseable JSON object
    print(json.dumps({"metric": "total_query_seconds", "value": total,
                      "value_normalized": norm, "cal_mean": cal_mean,
                      "unit": "sec", "sf": sf,
                      "n_queries": len(timings), "n_errors": len(errors),
                      "n_suspect": len(suspect),
                      "contaminated": contaminated}))


if __name__ == "__main__":
    main()
