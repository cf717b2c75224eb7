"""Trailing-window anomaly detection over time series / rollups.

The alerting primitive: flag buckets whose value deviates from the
TRAILING window's distribution by more than ``z`` sample standard
deviations. The trailing frame excludes the current row (an anomaly
must not raise its own baseline) and requires a full window before
flagging (cold-start buckets get NULL zscores, never false alarms).

One window pass per key — runs on rollup OUTPUT (small), not raw
events. Deterministic contract: zscores round to 6 decimals BEFORE
the threshold compare, so flags are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..frame import Frame

__all__ = ["anomaly_flags", "trailing_score"]


def trailing_score(values, x, window: int, z: float):
    """THE scoring contract, stated once for batch and stream (the
    ``interval_join_batch`` pattern): ``values`` are the previous
    ``window`` ROWS' values (None for nulls — positional frame
    semantics), ``x`` the current value. Returns (expected, zscore,
    is_anomaly): expected = trailing mean of non-null values rounded
    to 6 dp (None when all-null); zscore = (x − mean)/sample-stddev
    rounded to 6 dp, only when ALL ``window`` trailing rows are
    non-null, the stddev is > 0, and ``x`` is non-null; is_anomaly =
    |zscore| > z, False on null zscore. ``anomaly_flags`` implements
    the same contract as JVM window expressions; the streaming twin
    calls this directly — equality is pinned by pytest."""
    import math
    present = [v for v in values if v is not None]
    expected = round(sum(present) / len(present), 6) if present else None
    zscore = None
    if len(present) == window and x is not None:
        mean = sum(present) / window
        var = sum((v - mean) ** 2 for v in present) / (window - 1)
        sd = math.sqrt(var)
        if sd > 0:
            zscore = round((x - mean) / sd, 6)
    return expected, zscore, (zscore is not None and abs(zscore) > z)


def anomaly_flags(f: Frame, value_col: str, by: list[str] | str | tuple = (),
                  order_col: str = "bucket", window: int = 7,
                  z: float = 3.0) -> Frame:
    """Append (expected, zscore, is_anomaly) to each row: expected =
    trailing-``window`` mean, zscore = (x − expected)/trailing stddev
    (sample), is_anomaly = |zscore| > ``z``. Rows without a FULL
    trailing window, or with zero trailing variance, get NULL zscore
    and a false flag."""
    if window < 2:
        raise ValueError(f"anomaly_flags: window must be ≥ 2, got {window}")
    keys = [by] if isinstance(by, str) else list(by)
    for c in ("expected", "zscore", "is_anomaly"):
        if c in f.columns:
            raise ValueError(f"anomaly_flags: column {c!r} already exists")
    base = W.partitionBy(*keys).orderBy(order_col) if keys else \
        W.partitionBy().orderBy(order_col)
    trail = base.rowsBetween(-window, -1)
    x = F.col(value_col).cast("double")
    mean = F.avg(x).over(trail)
    sd = F.stddev_samp(x).over(trail)
    n = F.count(x).over(trail)
    zscore = F.when((n == window) & (sd > 0),
                    F.round((x - mean) / sd, 6))
    return Frame(f.sdf
                 .withColumn("expected", F.round(mean, 6))
                 .withColumn("zscore", zscore)
                 .withColumn("is_anomaly",
                             F.coalesce(F.abs(F.col("zscore")) > z,
                                        F.lit(False))))
