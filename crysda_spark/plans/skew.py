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


# ------------------------------------------------------- bloom prefilter
_BLOOM_P = (1 << 31) - 1
_BLOOM_HASHES = ((1103515245, 12345), (766245317, 987654321),
                 (514229635, 271828183), (1013904223, 141421357))


def _bloom_pos(c: Column, i: int, nbits: int) -> Column:
    a, b = _BLOOM_HASHES[i]
    k = F.pmod(F.xxhash64(c), F.lit(_BLOOM_P))
    return F.pmod(F.pmod(k * a + b, F.lit(_BLOOM_P)), F.lit(nbits))


_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _bloom_key_exprs(fact: SparkDF, fact_col: str,
                     dim: SparkDF, dim_col: str) -> tuple[Column, Column]:
    """One hash representation for both key sides. ``xxhash64`` is
    type-sensitive — int 5 and bigint 5 hash DIFFERENTLY — so join-
    equal values reaching the hash through different physical types
    would drop matching fact rows as false negatives, breaking the
    'false negatives cannot happen' contract. Integral pairs hash as
    long; any numeric mix hashes as double (the join-coercion superset;
    ``+ 0.0`` folds -0.0 into +0.0 so IEEE-equal zeros hash equal);
    equal non-numeric types hash as-is; anything else raises."""
    tf, td = dict(fact.dtypes)[fact_col], dict(dim.dtypes)[dim_col]
    fk, dk = F.col(fact_col), F.col(dim_col)

    def family(t: str) -> str:
        if t in _INTEGRAL:
            return "int"
        if t in ("float", "double") or t.startswith("decimal"):
            return "frac"
        return t

    ff, fd = family(tf), family(td)
    if ff == "int" and fd == "int":
        return fk.cast("long"), dk.cast("long")
    if ff in ("int", "frac") and fd in ("int", "frac"):
        return fk.cast("double") + F.lit(0.0), dk.cast("double") + F.lit(0.0)
    if tf == td:
        return fk, dk
    raise ValueError(
        f"bloom_prefilter: key dtypes {tf!r} ({fact_col}) and {td!r} "
        f"({dim_col}) have no common hash representation — cast one "
        f"side to the other's type first")


def bloom_prefilter(fact: SparkDF, fact_col: str, dim: SparkDF, dim_col: str,
                    nbits: int = 1 << 20, n_hashes: int = 3):
    """Semi-join pushdown without a shuffle: build a Bloom filter over
    the dim side's keys (one small aggregate — the filter is
    ``nbits/8`` bytes regardless of dim cardinality), broadcast it as
    a literal bit array, and drop fact rows map-side BEFORE any join
    shuffles them. False positives pass through (the later join stays
    correct); false negatives cannot happen.

    Spark injects runtime bloom filters only under specific plan
    shapes; this makes the rewrite explicit and composable. Returns
    the filtered fact DataFrame — join it as usual.

    Sizing: ~10 bits/key ≈ 1% FP at n_hashes=3 (the classic Bloom
    trade-off); nbits must be a multiple of 64.
    """
    if nbits % 64 or nbits <= 0:
        raise ValueError(f"bloom_prefilter: nbits must be a positive "
                         f"multiple of 64, got {nbits}")
    if not 1 <= n_hashes <= len(_BLOOM_HASHES):
        raise ValueError(f"bloom_prefilter: n_hashes must be "
                         f"1..{len(_BLOOM_HASHES)}, got {n_hashes}")
    n_words = nbits // 64
    fkey, key = _bloom_key_exprs(fact, fact_col, dim, dim_col)
    # build: per key, per hash -> (word_idx, bit); OR bits per word via
    # a grouped aggregate over at most n_words * 1 rows out
    pos = [ _bloom_pos(key, i, nbits) for i in range(n_hashes) ]
    pairs = dim.select(F.explode(F.array(*[
        F.struct((p / 64).cast("int").alias("w"),
                 F.pmod(p, F.lit(64)).cast("int").alias("b"))
        for p in pos])).alias("pb"))
    words = (pairs.groupBy(F.col("pb.w").alias("w"))
             .agg(F.bit_or(F.expr("shiftleft(1L, pb.b)")).alias("bits"))
             .collect())  # ≤ n_words rows — the filter itself, bounded
    arr = [0] * n_words
    for r in words:
        arr[r["w"]] = r["bits"]
    # one array Literal, not CreateArray(n_words children): Catalyst
    # constant-folds an all-literal CreateArray anyway, but at the
    # default 1<<20 bits the folded form first builds a 16384-child
    # expression tree that the analyzer/optimizer must walk per query.
    # NOTE: F.lit(<python list>) dispatches right back to
    # array(*[lit(..)]) (pyspark builtin source, verified on 4.1.2) —
    # only the 1-D ndarray branch creates a single Literal
    import numpy as np
    lit_arr = F.lit(np.asarray(arr, dtype=np.int64))
    cond = F.lit(True)
    for i in range(n_hashes):
        p = _bloom_pos(fkey, i, nbits)
        word = F.element_at(lit_arr, (p / 64).cast("int") + 1)
        # python-level F.shiftleft only takes a literal count; the SQL
        # function accepts a column — call it directly
        bit = F.call_function("shiftleft", F.lit(1).cast("long"),
                              F.pmod(p, F.lit(64)).cast("int"))
        cond = cond & (word.bitwiseAND(bit) != 0)
    return fact.filter(fkey.isNotNull() & cond)
