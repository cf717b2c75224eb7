"""Column aggregate functions with the reference's NA semantics.

Reference (src/crysda/columns.cr:196-296, src/crysda/utils.cr:132-147):
``remove_na=false`` (their default) RAISES on any null;
``remove_na=true`` skips nulls. Spark aggregates are null-skipping, so
the skip mode is native; strict mode wraps the aggregate in an
``assert_true`` on "no nulls in this group" which fails the job exactly
when the reference would raise MissingValueException — still one
distributed aggregate pass, no extra action.

``AggFuncs`` mirrors the reference's summarize_at helpers
(src/crysda/columns.cr:34-56): mean, median, sd, n, na.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..frame import _c


def _strict(agg: Column, col: Column, what: str) -> Column:
    ok = F.count(col) == F.count(F.lit(1))
    guard = F.assert_true(ok, F.lit(f"{what}: missing values; use remove_na=True"))
    return F.when(guard.isNull(), agg)


def _wrap(fn, name: str):
    def agg(col, remove_na: bool = False) -> Column:
        c = _c(col)
        a = fn(c)
        return a if remove_na else _strict(a, c, name)
    agg.__name__ = name
    return agg


mean = _wrap(F.avg, "mean")
sum_ = _wrap(F.sum, "sum")
min_ = _wrap(F.min, "min")
max_ = _wrap(F.max, "max")
median = _wrap(F.median, "median")
sd = _wrap(F.stddev_samp, "sd")


def n() -> Column:
    """Group size (reference EC num_row in summarize)."""
    return F.count(F.lit(1))


def na(col) -> Column:
    """Number of nulls in the column."""
    c = _c(col)
    return F.sum(F.isnull(c).cast("long"))


class AggFuncs:
    """summarize_at function set: ``{suffix: fn}`` entries."""

    mean = staticmethod(lambda c: F.avg(c))
    median = staticmethod(lambda c: F.median(c))
    sd = staticmethod(lambda c: F.stddev_samp(c))
    sum = staticmethod(lambda c: F.sum(c))
    min = staticmethod(lambda c: F.min(c))
    max = staticmethod(lambda c: F.max(c))
    n = staticmethod(lambda c: F.count(F.lit(1)))
    na = staticmethod(lambda c: F.sum(F.isnull(c).cast("long")))

    @classmethod
    def set(cls, *names: str) -> dict:
        return {n_: getattr(cls, n_) for n_ in names}
