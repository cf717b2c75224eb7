"""r15 optimization profiler: per-query split of CONSTRUCTION cost
(driver-side plan building incl. any eager gate actions inside the
entry fn) vs EXECUTION cost (the noop-sink run of the returned plan),
plus Spark job counts for each phase and an optional formatted-plan
dump. The bench times fn() + noop together; optimization needs to know
which side of that line the seconds live on.

Usage:
  python tools/opt_profile.py [sf_dir] q1 q2 ...      profile queries
  SPARK_GRAFT_PLAN_DIR=plans/r15 SUFFIX=before \\
      python tools/opt_profile.py sf_dir q1           also dump plans
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]

    import __spark_entry__ as entry
    from crysda_spark.plans.cache import release_pinned
    from crysda_spark.plans.inspect import _explain_str
    from crysda_spark.plans.sizing import apply_recommended_shuffle_partitions
    from crysda_spark.session import get_spark

    spark = get_spark("opt_profile")
    apply_recommended_shuffle_partitions(spark, sf_dir)
    tracker = spark.sparkContext.statusTracker()
    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR")
    suffix = os.environ.get("SUFFIX", "before")
    # r15 advice: REPS=0 left `plan` unassigned and `best` None
    reps = max(1, int(os.environ.get("REPS", "2")))

    qs = entry.queries()
    names = args or list(qs)
    # warm the JVM + parquet footer caches
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def n_jobs() -> int:
        return len(tracker.getJobIdsForGroup(None))

    for name in names:
        fn = qs[name]
        best = None
        for _ in range(reps):
            j0, t0 = n_jobs(), time.perf_counter()
            df = fn(spark, sf_dir)
            t1, j1 = time.perf_counter(), n_jobs()
            df.write.format("noop").mode("overwrite").save()
            t2, j2 = time.perf_counter(), n_jobs()
            rec = {"q": name, "construct_s": round(t1 - t0, 3),
                   "exec_s": round(t2 - t1, 3),
                   "total_s": round(t2 - t0, 3),
                   "construct_jobs": j1 - j0, "exec_jobs": j2 - j1}
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
                plan = _explain_str(df, "formatted")
            release_pinned()
            spark.catalog.clearCache()
            import gc
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()  # noqa: SLF001
            except Exception:
                pass
        print(json.dumps(best), flush=True)
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"),
                      "w") as fh:
                fh.write(plan)


if __name__ == "__main__":
    main()
