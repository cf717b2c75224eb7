"""Same-window A/B: unbounded vs bounded-Levenshtein ER scoring
(VERDICT r15 next-round #7; the bounded variant was committed as
7a2a7cb and reverted in 430a48f — this adjudicates which to ship).
Interleaves variants in ONE process with bench-style cleanup and a
calibration probe per block.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as entry
import crysda_spark.pipeline.entity as er
from crysda_spark.plans.cache import release_pinned
from crysda_spark.plans.sizing import apply_recommended_shuffle_partitions
from crysda_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))

OLD_SCORED = er.er_scored_pairs
_LEV_BOUND = 8


def _similarity_bounded(a, b, threshold):
    ml = F.greatest(F.length(a), F.length(b), F.lit(1))
    k = _LEV_BOUND
    bound_fits = (F.lit(1.0 - threshold) * ml) <= F.lit(float(k))
    db = F.levenshtein(a, b, k)
    dist = (F.when(bound_fits, F.when(db >= 0, db))
            .otherwise(F.levenshtein(a, b))).cast("double")
    return F.lit(1.0) - dist / ml


def new_er_scored_pairs(f, id_col, name_col, threshold=0.9):
    cand = er.er_candidates(f, id_col, name_col)
    return (cand.withColumn("sim", _similarity_bounded(
                F.col("_nm_a"), F.col("_nm_b"), threshold))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def main():
    spark = get_spark("ab_er")
    apply_recommended_shuffle_partitions(spark, SF_DIR)
    qs = entry.queries()
    name = "entity_resolution_docs"
    fn = qs[name]
    cal_fn = qs["rollup_moments_stddev"]
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    def cleanup():
        release_pinned()
        spark.catalog.clearCache()
        import gc
        gc.collect()

    def run(f):
        t0 = time.perf_counter()
        f(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        cleanup()
        return round(dt, 3)

    for mode in ("new", "old"):
        er.er_scored_pairs = new_er_scored_pairs if mode == "new" else OLD_SCORED
        run(fn)

    rec = {"new": [], "old": [], "cal": []}
    for _ in range(REPS):
        rec["cal"].append(run(cal_fn))
        for mode in ("new", "old"):
            er.er_scored_pairs = (new_er_scored_pairs if mode == "new"
                                  else OLD_SCORED)
            rec[mode].append(run(fn))
    er.er_scored_pairs = OLD_SCORED
    for k in ("new", "old"):
        rec[f"{k}_med"] = sorted(rec[k])[(len(rec[k]) - 1) // 2]
        rec[f"{k}_min"] = min(rec[k])
    print(json.dumps({name: rec}, indent=1))


if __name__ == "__main__":
    main()
