"""Explicit skew mitigation: salting for hot join/grouping keys.

AQE's skewJoin handles most skew at runtime (enabled in our session
defaults). Salting remains necessary when a single key is hot enough
that even a split partition overwhelms one task's build side, for
stream-static joins (no AQE), and when the skew is in an aggregation
key. Both helpers are semantics-preserving rewrites of the plain op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF
from pyspark.sql import functions as F

SALT = "__salt__"


def salted_join(left: SparkDF, right: SparkDF, on: list[str],
                how: str = "inner", salt: int = 16) -> SparkDF:
    """Equi-join with the LEFT side's hot keys spread over ``salt``
    sub-keys. Left rows get a random salt in [0, salt); the right side
    is replicated ``salt`` times (explode of a literal range — keep the
    right side the smaller table). Result equals
    ``left.join(right, on, how)`` for inner/left joins.

    Shuffle math at scale: a key holding 10% of a 100 TB left side goes
    from one 10 TB partition to ``salt`` partitions of 10/salt TB each,
    at the cost of shuffling the (small) right side ``salt`` times."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l_salted = left.withColumn(SALT, (F.rand(seed=42) * salt).cast("int"))
    r_salted = right.withColumn(SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = l_salted.join(r_salted, on=on + [SALT], how=how)
    return out.drop(SALT)


def salted_agg(sdf: SparkDF, keys: list[str], aggs: dict[str, Column],
               salt: int = 16) -> SparkDF:
    """Two-phase aggregation for skewed grouping keys: partial aggregate
    on (keys + salt), then final aggregate on keys. Supports
    re-aggregable functions; ``aggs`` maps output name -> (partial_fn,
    final_fn) column builders applied to a column name, or for the
    common cases pass strings: "sum:col", "count", "min:col", "max:col".

    Spark's hash aggregate already does map-side partial aggregation,
    so this matters when the DISTINCT key set itself is small but hot
    (partial rows per partition stay few) — the salt stage splits the
    hot reduce task."""
    partial_cols = []
    final_cols = []
    for name, spec in aggs.items():
        if spec == "count":
            partial_cols.append(F.count(F.lit(1)).alias(f"_p_{name}"))
            final_cols.append(F.sum(f"_p_{name}").alias(name))
        else:
            op, col = spec.split(":", 1)
            partial = {"sum": F.sum, "min": F.min, "max": F.max}[op](col)
            final = {"sum": F.sum, "min": F.min, "max": F.max}[op](f"_p_{name}")
            partial_cols.append(partial.alias(f"_p_{name}"))
            final_cols.append(final.alias(name))
    salted = sdf.withColumn(SALT, (F.rand(seed=42) * salt).cast("int"))
    part = salted.groupBy(*keys, SALT).agg(*partial_cols)
    return part.groupBy(*keys).agg(*final_cols)


def key_skew_report(sdf: SparkDF, *cols: str, top: int = 10) -> SparkDF:
    """Per candidate key column: the ``top`` heaviest values with their
    share of rows and the skew ratio vs a perfectly uniform spread
    (heavy_count · distinct / total — 1.0 means uniform; a join or agg
    keyed on a column whose top value shows ratio ≫ shuffle-partition
    count is a salting/AQE-skew candidate BEFORE it burns a stage).

    One groupBy per column (tagged union — a single shuffle whose keys
    are (column-tag, value)); output is tiny:
    (column, value, n, share, skew_ratio, rank).
    """
    if not cols:
        raise ValueError("key_skew_report: name at least one column")
    from pyspark.sql.window import Window as W

    tagged = None
    for c in cols:
        t = sdf.select(F.lit(c).alias("column"),
                       F.col(c).cast("string").alias("value"))
        tagged = t if tagged is None else tagged.unionByName(t)
    counts = tagged.groupBy("column", "value").agg(F.count(F.lit(1)).alias("n"))
    stats = counts.groupBy("column").agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_distinct"))
    rank = F.row_number().over(
        W.partitionBy("column").orderBy(F.col("n").desc(), F.col("value")))
    return (counts.withColumn("rank", rank).filter(F.col("rank") <= top)
            .join(stats, on="column")
            .select("column", "value", "n",
                    F.round(F.col("n") / F.col("_total"), 6).alias("share"),
                    F.round(F.col("n") * F.col("_distinct") / F.col("_total"),
                            4).alias("skew_ratio"),
                    "rank"))
