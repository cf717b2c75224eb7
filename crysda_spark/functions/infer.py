"""String→type re-inference (reference: src/crysda/utils.cr:275-365).

The reference peeks at the first 20 values and tries
Int32 → Int64 → Float64 → Bool → String. A driver-side peek doesn't
distribute, so we decide the type with ONE aggregate pass per column:
count how many non-null values survive each try_cast and pick the first
type that loses nothing. That keeps the decision exact at any scale
(the reference's 20-value peek can mis-infer; ours cannot) at the cost
of one cheap job per ``convert=True`` call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF
from pyspark.sql import functions as F

# reference inference order (src/crysda/utils.cr:283-291); Int32 and Int64
# collapse to Spark long — reference's 32/64 split is a memory concern that
# Tungsten already handles.
_CASTS = ["bigint", "double", "boolean"]

TRUE_VALUES = ["T", "TRUE"]
FALSE_VALUES = ["F", "FALSE"]


def _clean_num(c: Column) -> Column:
    # reference strips thousands commas before float parse (utils.cr:319)
    return F.regexp_replace(c, ",", "")


def inferred_cast(sdf: SparkDF, name: str,
                  true_values: list[str] | None = None,
                  false_values: list[str] | None = None) -> Column | None:
    """Return a cast expression for column ``name`` or None to keep string."""
    tv = [v.upper() for v in (true_values or TRUE_VALUES)]
    fv = [v.upper() for v in (false_values or FALSE_VALUES)]
    c = F.col(name)
    up = F.upper(c)
    bool_ok = up.isin(tv + fv)
    counts = sdf.agg(
        F.count(c).alias("n"),
        F.count(_clean_num(c).try_cast("bigint")).alias("n_int"),
        F.count(_clean_num(c).try_cast("double")).alias("n_dbl"),
        F.sum(bool_ok.cast("int")).alias("n_bool"),
    ).collect()[0]
    n = counts["n"]
    if n == 0:
        return None
    if counts["n_int"] == n:
        return _clean_num(c).cast("bigint")
    if counts["n_dbl"] == n:
        return _clean_num(c).cast("double")
    if counts["n_bool"] == n:
        return F.when(up.isin(tv), F.lit(True)).when(up.isin(fv), F.lit(False))
    return None


def convert_types(sdf: SparkDF, cols: list[str], **kw) -> SparkDF:
    """Re-infer string columns to bigint/double/boolean where lossless."""
    for name in cols:
        if dict(sdf.dtypes).get(name) != "string":
            continue
        cast = inferred_cast(sdf, name, **kw)
        if cast is not None:
            sdf = sdf.withColumn(name, cast)
    return sdf
