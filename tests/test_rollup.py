"""Hypertable-style rollup cascade: fine grain aggregated once, coarser
grains derived by merging partials — merged results must equal direct
aggregation of the raw data at the coarse grain, and HLL sketches must
merge losslessly (union of hourly sketches == daily sketch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.operators import rollup as ru

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from crysda_spark import read_parquet
    return read_parquet(spark, f"{SF_DIR}/events.parquet", nanos_cols={"ts": "ts"})


MEASURES = dict(n="count", total=("sum", "value"),
                vmin=("min", "value"), vmax=("max", "value"),
                users=("hll", "user_id"))


def test_merged_daily_equals_direct_daily(events):
    hourly = ru.time_rollup(events, "ts", "hour", keys=["event_type"], **MEASURES)
    daily_merged = ru.merge_rollup(hourly, "day", keys=["event_type"], from_grain="hour", **MEASURES)
    daily_direct = ru.time_rollup(events, "ts", "day", keys=["event_type"], **MEASURES)

    m = {(r["event_type"], r["bucket"]): r for r in daily_merged.sdf.collect()}
    d = {(r["event_type"], r["bucket"]): r for r in daily_direct.sdf.collect()}
    assert set(m) == set(d) and len(m) > 0
    for k in d:
        assert m[k]["n"] == d[k]["n"]
        assert abs(m[k]["total"] - d[k]["total"]) < 1e-6
        assert m[k]["vmin"] == d[k]["vmin"]
        assert m[k]["vmax"] == d[k]["vmax"]


def test_hll_union_is_lossless_and_estimate_close(events):
    hourly = ru.time_rollup(events, "ts", "hour", **MEASURES)
    daily_merged = ru.merge_rollup(hourly, "day", from_grain="hour", **MEASURES)
    est = daily_merged.sdf.select(
        "bucket", ru.hll_estimate("users").alias("approx"))
    exact = (events.sdf
             .withColumn("bucket", F.date_trunc("day", F.col("ts")))
             .groupBy("bucket")
             .agg(F.countDistinct("user_id").alias("exact")))
    j = {r["bucket"]: (r["approx"], r["exact"])
         for r in est.join(exact, on="bucket").collect()}
    assert len(j) > 0
    for approx, exact_n in j.values():
        assert abs(approx - exact_n) / max(exact_n, 1) < 0.05

    # lossless merge: union of hourly sketches == direct daily sketch
    direct = ru.time_rollup(events, "ts", "day", **MEASURES).sdf.select(
        "bucket", ru.hll_estimate("users").alias("direct"))
    jj = est.join(direct, on="bucket").filter(
        F.col("approx") != F.col("direct")).count()
    assert jj == 0


def test_rollup_validates_kinds_and_grains(events):
    with pytest.raises(ValueError, match="not mergeable"):
        ru.time_rollup(events, "ts", "hour", bad=("avg", "value"))
    with pytest.raises(ValueError, match="unknown grain"):
        ru.time_rollup(events, "ts", "fortnight", n="count")
    with pytest.raises(ValueError, match="needs a column"):
        ru.time_rollup(events, "ts", "hour", s="sum")


def test_merge_rollup_rejects_week_to_month(events):
    weekly = ru.time_rollup(events, "ts", "week", n="count")
    with pytest.raises(ValueError, match="straddle month boundaries"):
        ru.merge_rollup(weekly, "month", from_grain="week", n="count")
    with pytest.raises(ValueError, match="not coarser"):
        ru.merge_rollup(weekly, "day", from_grain="week", n="count")
    # nested merges stay allowed
    ru.merge_rollup(weekly, "year", from_grain="day", n="count")


def test_streaming_batch_rollup_schema_parity(spark, events):
    """tumbling_rollup's output column order must equal time_rollup's so
    batch and stream partials union positionally (lambda architecture)."""
    from crysda_spark.streaming import windows as sw
    measures = dict(n="count", total=("sum", "value"))
    batch = ru.time_rollup(events, "ts", "hour", keys=["event_type"], **measures)
    stream_shape = sw.tumbling_rollup(
        events.sdf, width="1 hour", keys=["event_type"],
        watermark=None, **measures)  # batch df: schema-only check
    assert stream_shape.columns == batch.sdf.columns
