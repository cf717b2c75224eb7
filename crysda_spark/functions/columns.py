"""Column-level helpers mirroring the reference's DataCol methods.

Reference surface (file:line into /root/reference):
- matching          src/crysda/columns.cr:358-361
- concatenate       src/crysda/extension.cr:58-61
- order / rank      src/crysda/columns.cr:143-159
- casts as_s/as_i/… src/crysda/columns.cr:363-400
- map on column     src/crysda/columns.cr:170-182
- string + concat   src/crysda/columns.cr:101-112,469-477

Everything stays a Column expression (JVM-side, codegen'd); the only
Python-executing escape hatch is ``map_values``, which is an
Arrow-batched pandas_udf, never a row-at-a-time UDF.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column, Window as W
from pyspark.sql import functions as F

from ..frame import _c

MISSING_VALUE = "NA"


def matching(col, fn: Callable[[Column], Column],
             missing_as: bool = False) -> Column:
    """NA-aware string predicate: apply ``fn`` to the column, nulls become
    ``missing_as`` (reference default false — NA rows drop under filter)."""
    return F.coalesce(fn(_c(col)), F.lit(missing_as))


def concatenate(a, b, sep: str = " ") -> Column:
    """Zip two columns into strings joined by ``sep``; non-string inputs
    render nulls as "NA" first (reference string-concat semantics,
    src/crysda/columns.cr:101-112)."""
    return F.concat_ws(sep, na_rendered(a), na_rendered(b))


def na_rendered(col) -> Column:
    """Cast to string with nulls rendered as the "NA" sentinel."""
    return F.coalesce(_c(col).cast("string"), F.lit(MISSING_VALUE))


def order(col, na_last: bool = True) -> Column:
    """Argsort: the 0-based position each element would occupy in an
    ascending sort (reference src/crysda/columns.cr:143-150).

    A global order needs a single total ordering; expressed as a
    row_number window WITHOUT partitioning, Spark must single-partition
    — correct but only for driver-adjacent result sets. Inside grouped
    frames the Frame layer partitions the window by the group keys and
    the computation distributes."""
    c = _c(col)
    w = W.orderBy(c.asc_nulls_last() if na_last else c.asc_nulls_first())
    return F.row_number().over(w) - 1


def rank_position(col, na_last: bool = True) -> Column:
    """Reference ``rank``: 0-based position in ascending order with ties
    broken by position — row_number semantics, NOT SQL RANK
    (src/crysda/columns.cr:152-159)."""
    return order(col, na_last)


# ----------------------------------------------------------------- casts
def as_string(col) -> Column:
    return _c(col).cast("string")


def as_int(col, strict: bool = True) -> Column:
    """Checked cast to long (reference as_i/as_i64 raise on non-numeric
    columns; with strict=False invalid values become null like try_cast)."""
    c = _c(col)
    if not strict:
        return c.try_cast("bigint")
    ok = c.isNull() | c.try_cast("bigint").isNotNull()
    guard = F.assert_true(ok, F.lit("as_int: value is not an integer"))
    return F.when(guard.isNull(), c.cast("bigint"))


def as_double(col, strict: bool = True) -> Column:
    c = _c(col)
    if not strict:
        return c.try_cast("double")
    ok = c.isNull() | c.try_cast("double").isNotNull()
    guard = F.assert_true(ok, F.lit("as_double: value is not numeric"))
    return F.when(guard.isNull(), c.cast("double"))


def as_bool(col, true_values: list[str] | None = None,
            false_values: list[str] | None = None) -> Column:
    """Boolean cast honouring the reference's true/false vocabulary
    (["T","TRUE"] / ["F","FALSE"], src/crysda.cr:28-29) plus native
    boolean strings."""
    from .infer import FALSE_VALUES, TRUE_VALUES
    tv = [v.upper() for v in (true_values or TRUE_VALUES)] + ["TRUE"]
    fv = [v.upper() for v in (false_values or FALSE_VALUES)] + ["FALSE"]
    up = F.upper(_c(col).cast("string"))
    return F.when(up.isin(tv), F.lit(True)) \
            .when(up.isin(fv), F.lit(False))


def convert_type(col, true_values: list[str] | None = None,
                 false_values: list[str] | None = None) -> Column:
    """Single-expression string→typed conversion cascade
    (reference Utils.get_col, src/crysda/utils.cr:295-309): try long,
    then double (thousands commas stripped), then bool vocabulary, else
    keep the string. Value-level cascade — for the column-level
    "pick ONE type for the whole column" decision use
    ``infer.convert_types`` (one aggregate pass, exact at any scale)."""
    c = _c(col).cast("string")
    cleaned = F.regexp_replace(c, ",", "")
    return F.coalesce(
        cleaned.try_cast("bigint").cast("string"),
        cleaned.try_cast("double").cast("string"),
        as_bool(c, true_values, false_values).cast("string"),
        c)


# ---------------------------------------------------------------- map escape
def map_values(col, fn: Callable[[Any], Any], return_type: str = "string") -> Column:
    """Per-value Python transform (reference column ``map``,
    src/crysda/columns.cr:170-182). Arrow-batched pandas_udf — the
    sanctioned slow path when no built-in expression exists. Nulls are
    passed through without calling ``fn`` (reference nil-skipping)."""
    from pyspark.sql.pandas.functions import pandas_udf

    def _map(s):
        return s.map(lambda v: None if v is None else fn(v))

    _map.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(return_type)(_map)(_c(col))
