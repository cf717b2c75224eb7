"""Distributed EXACT linear-interpolation quantiles (``quantile_cont``).

Spark's exact ``percentile`` aggregate buffers EVERY value of a group in
a single aggregation buffer — at 100 TB with a handful of groups that is
billions of doubles flowing through one final-agg task. This operator
computes the identical result (DuckDB ``quantile_cont`` / Spark
``percentile`` semantics: rank ``h = 1 + (n-1)*q``, linear interpolation
between the floor/ceil order statistics) with no per-group value
buffering, via range-partitioned rank selection:

1. range-partition rows by ``(group..., value)`` so the global per-group
   sort order is partition-contiguous;
2. per-(partition, group) counts → cumulative offsets (a P×G frame,
   windowed cheaply) turn a partition-local ``row_number`` into a GLOBAL
   per-group rank; the row_number window partitions by
   ``(group..., partition_id)`` so no window partition ever exceeds one
   range split — group size never concentrates on one task;
3. the ≤ 2·G·Q target order statistics (floor/ceil of each ``h``) are
   selected with a broadcast join and interpolated in a final tiny
   aggregate.

The full data crosses the wire exactly twice (range exchange + the
(group, pid) window exchange), both with bounded partition sizes;
nothing collects to the driver. Interpolation uses the same
``lo + (hi - lo) * frac`` form as Spark/DuckDB so results agree
bit-for-bit on the oracle path.

Known caveat: range partitioning cannot split ties — a single value
duplicated billions of times still lands in one split. For such
degenerate distributions pre-salt the input or use approx_percentile.

Beyond-reference operator (the Crystal reference has no quantile
aggregate); SURVEY §2.4 extension.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _null_safe_join(left: DataFrame, right: DataFrame,
                    keys: list[str]) -> DataFrame:
    """Broadcast inner join on keys that must not drop NULL group keys
    (groupBy treats NULL as a regular key; a plain equi-join would).
    Right-side keys are renamed before the join so the output resolves
    unambiguously."""
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__r_{k}")
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(F.col(f"__r_{k}"))
        cond = c if cond is None else cond & c
    out = left.join(F.broadcast(renamed), cond, "inner")
    return out.drop(*[f"__r_{k}" for k in keys])


def quantile_cont(sdf: DataFrame, value_col: str, qs: Iterable[float],
                  by: list[str] | None = None,
                  num_partitions: int | None = None) -> DataFrame:
    """Exact per-group quantiles with linear interpolation.

    Returns a long-format DataFrame ``(*by, q, value)`` with one row per
    (group, quantile). NULL values are excluded (aggregate semantics);
    empty groups produce no rows.
    """
    by = list(by or [])
    qs = [float(q) for q in qs]
    if not qs:
        raise ValueError("quantile_cont: qs must be non-empty")
    if any(q < 0.0 or q > 1.0 for q in qs):
        raise ValueError(f"quantile_cont: quantiles must be in [0, 1], got {qs}")
    spark = sdf.sparkSession

    base = (sdf.select(*by, F.col(value_col).cast("double").alias("_v"))
            .where(F.col("_v").isNotNull()))
    n_part = int(num_partitions
                 or spark.conf.get("spark.sql.shuffle.partitions"))
    # The explicit partition count is load-bearing, not cosmetic: the plan
    # evaluates `ranged` in two branches (counts vs ranks), and _pid must be
    # identical in both. Range-bound sampling is deterministic for identical
    # input splits, and an explicit N makes the exchange REPARTITION_BY_NUM,
    # which AQE is forbidden to coalesce — so both branches see the same pids.
    ranged = (base.repartitionByRange(n_part, *(by + ["_v"]))
              .withColumn("_pid", F.spark_partition_id()))

    # P×G partition counts -> per-group cumulative offsets (tiny frame)
    pcounts = ranged.groupBy(*by, "_pid").agg(F.count(F.lit(1)).alias("_c"))
    w_off = (W.partitionBy(*by) if by else W.partitionBy()).orderBy("_pid")
    offsets = pcounts.withColumn(
        "_off",
        F.coalesce(F.sum("_c").over(w_off.rowsBetween(W.unboundedPreceding, -1)),
                   F.lit(0)))

    # G group totals -> the <= 2 target ranks per (group, quantile)
    totals = pcounts.groupBy(*by).agg(F.sum("_c").alias("_n"))
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    targets = (totals.crossJoin(F.broadcast(qdf))
               .withColumn("_h", F.lit(1.0) + (F.col("_n") - 1) * F.col("q"))
               .withColumn("_frac", F.col("_h") - F.floor("_h"))
               .select(*by, "q", "_frac",
                       F.explode(F.array(
                           F.struct(F.floor("_h").cast("bigint").alias("_rank"),
                                    F.lit("lo").alias("_kind")),
                           F.struct(F.ceil("_h").cast("bigint").alias("_rank"),
                                    F.lit("hi").alias("_kind")))).alias("_t"))
               .select(*by, "q", "_frac",
                       F.col("_t._rank").alias("_rank"),
                       F.col("_t._kind").alias("_kind")))

    # global per-group rank = partition offset + partition-local row_number;
    # the window partitions by (by..., _pid) so its size is bounded by one
    # range split, never by the group size
    w_rn = W.partitionBy(*(by + ["_pid"])).orderBy("_v")
    ranked = _null_safe_join(
        ranged.withColumn("_lrn", F.row_number().over(w_rn)),
        offsets.select(*by, "_pid", "_off"), by + ["_pid"])
    ranked = ranked.withColumn("_rank", F.col("_off") + F.col("_lrn"))

    picked = _null_safe_join(ranked, targets, by + ["_rank"])
    return (picked.groupBy(*by, "q")
            .agg(F.min("_frac").alias("_frac"),
                 F.max(F.when(F.col("_kind") == "lo", F.col("_v"))).alias("_vlo"),
                 F.max(F.when(F.col("_kind") == "hi", F.col("_v"))).alias("_vhi"))
            .select(*by, "q",
                    (F.col("_vlo")
                     + (F.col("_vhi") - F.col("_vlo")) * F.col("_frac"))
                    .alias("value")))
