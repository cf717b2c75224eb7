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

    qs = entry.queries()
    # warm the JVM + parquet footer caches with one tiny action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a failing query must not hide the rest
            timings[name] = -1.0
            print(f"# bench error in {name}: {str(e).splitlines()[0][:160]}",
                  file=sys.stderr)
        # drop persisted blocks a query pinned (LSH band tables etc.) so
        # later queries aren't timed against accumulated cache pressure
        spark.catalog.clearCache()
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
