"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query executes end-to-end into the noop sink — full plan runs
(scan → shuffle → aggregate), nothing collects to the driver, so the
timing reflects cluster-shaped execution, not driver serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

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
    # warm the JVM + parquet footer caches with one tiny action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # ---- self-validation: calibration query + host load -------------
    # The r8 artifact shipped 1.4-2.8x phantom regressions recorded under
    # external host load (this box shows bursty CPU contention the bench
    # can't see coming). A fixed calibration query timed at start AND end
    # against a stored idle reference makes the artifact self-validating:
    # when calibration deviates >1.3x the payload is stamped
    # "contaminated": true and per-query comparisons should be re-run.
    cal_name = "zorder_key_parts"
    cal_ref = None
    cal_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_CALIBRATION.json")
    try:
        with open(cal_path) as fh:
            ref = json.load(fh)
        if ref.get("query") == cal_name and ref.get("sf") == sf:
            cal_ref = float(ref["idle_sec"])
    except (OSError, ValueError, KeyError):
        pass

    def calibrate() -> float:
        if cal_name not in qs:
            return -1.0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            qs[cal_name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        from crysda_spark.plans.cache import release_pinned
        release_pinned()
        spark.catalog.clearCache()
        return round(best, 3)

    def loadavg1() -> float:
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return -1.0

    load_start = loadavg1()
    cal_start = calibrate()

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

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    errors: dict[str, int] = {}
    for name, fn in qs.items():
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
    cal_end = calibrate()
    load_end = loadavg1()
    contaminated = None
    if cal_ref and cal_ref > 0:
        worst = max(t for t in (cal_start, cal_end) if t >= 0) \
            if max(cal_start, cal_end) >= 0 else -1.0
        contaminated = bool(worst > 0 and worst / cal_ref > 1.3)
    if contaminated:
        print(f"# WARNING: bench contaminated — calibration {cal_name} "
              f"start={cal_start}s end={cal_end}s vs idle ref {cal_ref}s "
              f"(>1.3x); treat per-query regressions as suspect",
              file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = json.dumps({
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "queries_errors": errors,
        "sf": sf,
        "calibration": {"query": cal_name, "idle_ref": cal_ref,
                        "start": cal_start, "end": cal_end,
                        "load_avg_start": load_start,
                        "load_avg_end": load_end},
        "contaminated": contaminated,
    })
    print(payload)
    # the driver's stdout capture has truncated mid-JSON before (r4 lost
    # the first ~9 of 82 timings); persist a full copy so totals are
    # always auditable from the repo
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LOCAL.json"), "w") as fh:
            fh.write(payload + "\n")
    except OSError:
        pass
    # the driver tail-captures stdout and has lost the HEAD of the ~4 KB
    # payload line two rounds running (BENCH_r04/r05 "parsed": null) —
    # repeat the headline numbers in one tiny final line so any
    # tail-window contains a complete, parseable JSON object
    print(json.dumps({"metric": "total_query_seconds", "value": total,
                      "unit": "sec", "sf": sf,
                      "n_queries": len(timings), "n_errors": len(errors),
                      "contaminated": contaminated}))


if __name__ == "__main__":
    main()
