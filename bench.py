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
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = json.dumps({
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "queries_errors": errors,
        "sf": sf,
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
                      "n_queries": len(timings), "n_errors": len(errors)}))


if __name__ == "__main__":
    main()
