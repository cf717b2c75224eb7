"""Same-window A/B: old two-aggregate pagerank iteration vs the new
single-keyed-aggregate iteration (VERDICT r15 next-round #4).
Interleaves NEW/OLD reps in ONE process with bench-style cleanup and a
calibration run per block. Old implementation is byte-for-byte the
pre-change body (verified against `git show <base>`); also reports
Spark job counts per variant (the structural claim: fewer stages per
checkpoint job, same one job per round).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as entry
import crysda_spark.pipeline.graph as gr
from crysda_spark.frame import Frame
from crysda_spark.plans.cache import release_pinned
from crysda_spark.plans.sizing import apply_recommended_shuffle_partitions
from crysda_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))

NEW_PAGERANK = gr.pagerank


def old_pagerank(edges, src="src", dst="dst", damping=0.85, max_iter=10,
                 tol=0.0, checkpoint_every=1):
    for c in (src, dst):
        if c in gr._RESERVED:
            raise ValueError("reserved")
    e = (edges.sdf.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
         .distinct().localCheckpoint(eager=True))
    nodes = (e.select(F.col("_src").alias("node"))
             .union(e.select(F.col("_dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return Frame(nodes.withColumn("rank", F.lit(0.0)))
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    base = nodes.join(deg, nodes["node"] == deg["_src"], "left").select(
        "node", "_deg").localCheckpoint(eager=True)
    ranks = base.withColumn("_rank", F.lit(1.0 / n))
    for it in range(max_iter):
        dang = (ranks.filter(F.col("_deg").isNull())
                .agg(F.coalesce(F.sum("_rank"), F.lit(0.0)).alias("_dang")))
        contrib = (ranks.join(e, ranks["node"] == e["_src"])
                   .select(F.col("_dst").alias("node"),
                           (F.col("_rank") / F.col("_deg")).alias("_contrib"))
                   .groupBy("node").agg(F.sum("_contrib").alias("_in")))
        nxt = (base.join(contrib, on="node", how="left")
               .crossJoin(F.broadcast(dang))
               .select("node", "_deg",
                       (F.lit((1.0 - damping) / n)
                        + F.lit(damping) * F.col("_dang") / n
                        + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                        ).alias("_rank")))
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        if tol > 0.0:
            delta = (nxt.select("node", "_rank")
                     .join(ranks.select("node", F.col("_rank").alias("_prev")),
                           on="node")
                     .agg(F.sum(F.abs(F.col("_rank") - F.col("_prev"))))
                     .collect()[0][0])
            ranks = nxt
            if delta < tol:
                break
        else:
            ranks = nxt
    return Frame(ranks.select("node", F.col("_rank").alias("rank")))


def main():
    spark = get_spark("ab_pagerank")
    apply_recommended_shuffle_partitions(spark, SF_DIR)
    tracker = spark.sparkContext.statusTracker()
    qs = entry.queries()
    name = "pagerank_cust_supplier"
    fn = qs[name]
    cal_fn = qs["rollup_moments_stddev"]
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    def cleanup():
        release_pinned()
        spark.catalog.clearCache()
        import gc
        gc.collect()

    def n_jobs():
        return len(tracker.getJobIdsForGroup(None))

    def n_stages(jids):
        tot = 0
        for j in jids:
            info = tracker.getJobInfo(j)
            if info is not None:
                tot += len(info.stageIds)
        return tot

    def run(f):
        ids0 = set(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        f(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        new_ids = [j for j in tracker.getJobIdsForGroup(None)
                   if j not in ids0]
        jobs = len(new_ids)
        stages = n_stages(new_ids)
        cleanup()
        return round(dt, 3), jobs, stages

    for mode in ("new", "old"):
        gr.pagerank = NEW_PAGERANK if mode == "new" else old_pagerank
        run(fn)

    rec = {"new": [], "old": [], "cal": [], "new_jobs": [], "old_jobs": [],
           "new_stages": [], "old_stages": []}
    for _ in range(REPS):
        rec["cal"].append(run(cal_fn)[0])
        for mode in ("new", "old"):
            gr.pagerank = NEW_PAGERANK if mode == "new" else old_pagerank
            dt, jobs, stages = run(fn)
            rec[mode].append(dt)
            rec[f"{mode}_jobs"].append(jobs)
            rec[f"{mode}_stages"].append(stages)
    gr.pagerank = NEW_PAGERANK
    for k in ("new", "old"):
        rec[f"{k}_med"] = sorted(rec[k])[(len(rec[k]) - 1) // 2]
        rec[f"{k}_min"] = min(rec[k])
    print(json.dumps({name: rec}, indent=1))


if __name__ == "__main__":
    main()
