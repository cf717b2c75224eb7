"""Same-window A/B: old Column-builder vs new generated-SQL paths for
_band_hashes / minhash_signatures_from_shingles / simhash_signatures
(VERDICT r15 next-round #1). Interleaves NEW/OLD reps per query in ONE
process with bench-style cleanup, plus a calibration run per block so
window drift is visible. Old implementations are byte-for-byte the
pre-b1f0c9c builders (verified against `git show b1f0c9c^`).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Column, functions as F

import __spark_entry__ as entry
import crysda_spark.pipeline.dedup as dd
from crysda_spark.plans.cache import release_pinned
from crysda_spark.plans.sizing import apply_recommended_shuffle_partitions
from crysda_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))

# ---------------- old (pre-b1f0c9c) builders, reconstructed verbatim
NEW_BAND = dd._band_hashes
NEW_MINH = dd.minhash_signatures_from_shingles
NEW_SIMH = dd.simhash_signatures


def old_band_hashes(sig, n_hashes, bands):
    if isinstance(sig, str):
        sig = F.col(sig)
    rows_per_band = n_hashes // bands
    return F.array(*[
        F.xxhash64(F.lit(b), F.concat_ws(",", *[
            F.element_at(sig, b * rows_per_band + r + 1).cast("string")
            for r in range(rows_per_band)]))
        for b in range(bands)])


def old_minhash_signatures_from_shingles(sh_df, id_col, n_hashes=32):
    sh = sh_df.select(id_col, F.explode_outer("sh").alias("_s"))
    hashed = sh.select(id_col, F.xxhash64("_s").alias("_h"))
    aggs = [F.min(F.xxhash64(F.lit(i), "_h")).alias(f"_mh{i}")
            for i in range(n_hashes)]
    sig = hashed.groupBy(id_col).agg(*aggs)
    return sig.select(id_col,
                      F.array(*[f"_mh{i}" for i in range(n_hashes)]).alias("sig"))


def old_simhash_signatures(f, text_col, id_col, bits=64):
    from crysda_spark.pipeline.text import tokens
    assert bits % 4 == 0
    capped = F.slice(tokens(F.col(text_col)), 1, 0xFFFF)
    tok = f.sdf.select(F.col(id_col), F.explode_outer(capped).alias("_w"))
    hashed = tok.select(id_col, F.xxhash64(F.lit(0x51), "_w").alias("_h"))

    def bitc(b):
        return F.shiftright("_h", b).bitwiseAND(F.lit(1))

    packed = []
    for g in range(bits // 4):
        e = bitc(4 * g).cast("long")
        for j in range(1, 4):
            e = e + F.shiftleft(bitc(4 * g + j).cast("long"), 16 * j)
        packed.append(e.alias(f"_p{g}"))
    pre = hashed.select(id_col, *packed)
    votes = pre.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(f"_p{g}").alias(f"_s{g}") for g in range(bits // 4)])
    sig = F.lit(0).cast("long")
    for b in range(bits):
        cnt = F.shiftright(F.col(f"_s{b // 4}"), 16 * (b % 4)) \
               .bitwiseAND(F.lit(0xFFFF))
        sig = sig + F.when(cnt * 2 > F.col("_n"),
                           F.shiftleft(F.lit(1).cast("long"), b)) \
                     .otherwise(F.lit(0).cast("long"))
    return votes.select(id_col, sig.alias("sh"))


def set_mode(mode):
    if mode == "old":
        dd._band_hashes = old_band_hashes
        dd.minhash_signatures_from_shingles = old_minhash_signatures_from_shingles
        dd.simhash_signatures = old_simhash_signatures
    else:
        dd._band_hashes = NEW_BAND
        dd.minhash_signatures_from_shingles = NEW_MINH
        dd.simhash_signatures = NEW_SIMH


def main():
    spark = get_spark("ab_dedup")
    apply_recommended_shuffle_partitions(spark, SF_DIR)
    qs = entry.queries()
    names = sys.argv[1:] or ["minhash_near_dups", "dedup_cluster_survivors",
                             "dedup_incremental_batch", "simhash_near_dups",
                             "dedup_full_pipeline", "embed_near_dups_lsh"]
    cal_fn = qs["rollup_moments_stddev"]
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    def cleanup():
        release_pinned()
        spark.catalog.clearCache()
        import gc
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        cleanup()
        return round(dt, 3)

    # warm both code paths once (Janino compile) before timing
    for mode in ("new", "old"):
        set_mode(mode)
        run(qs[names[0]])

    results = {}
    for name in names:
        fn = qs[name]
        rec = {"new": [], "old": [], "cal": []}
        for _ in range(REPS):
            rec["cal"].append(run(cal_fn))
            for mode in ("new", "old"):
                set_mode(mode)
                rec[mode].append(run(fn))
        set_mode("new")
        rec["new_med"] = sorted(rec["new"])[(len(rec["new"]) - 1) // 2]
        rec["old_med"] = sorted(rec["old"])[(len(rec["old"]) - 1) // 2]
        rec["new_min"] = min(rec["new"])
        rec["old_min"] = min(rec["old"])
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print("== SUMMARY ==")
    for name, rec in results.items():
        print(f"{name:30s} new med/min {rec['new_med']:6.2f}/{rec['new_min']:6.2f}"
              f"  old med/min {rec['old_med']:6.2f}/{rec['old_min']:6.2f}"
              f"  cal {min(rec['cal']):.3f}-{max(rec['cal']):.3f}")


if __name__ == "__main__":
    main()
