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
