"""Bucketed-table layout (plans/bucketing.py): the write-once-shuffle,
join-forever-free contract, proven on the PLAN — zero Exchange on a
bucketed-bucketed equi-join, and the exchange REAPPEARING when one
side isn't bucketed (the gate has teeth)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _exchanges(df) -> int:
    from crysda_spark.plans.inspect import _explain_str
    return len(re.findall(r"\(\d+\) Exchange",
                          _explain_str(df, "formatted")))


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from crysda_spark.plans.bucketing import write_bucketed
    orders = spark.range(500).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 37).alias("o_custkey"),
        (F.col("id") * 3 % 1000).cast("double").alias("o_total"))
    cust = spark.range(37).select(
        F.col("id").alias("o_custkey"),
        F.concat(F.lit("c"), F.col("id")).alias("name"))
    write_bucketed(orders, "bk_orders", "o_custkey", 8,
                   sort_cols="o_custkey")
    write_bucketed(cust, "bk_cust", "o_custkey", 8, sort_cols="o_custkey")
    yield "bk_orders", "bk_cust"
    for t in ("bk_orders", "bk_cust"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_zero_exchanges(spark, bucketed_tables):
    ta, tb = bucketed_tables
    # bucketed joins need the broadcast path OFF to show the SMJ shape
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table(ta).join(spark.table(tb), on="o_custkey")
        assert _exchanges(j) == 0          # the whole point
        assert j.count() == 500            # and it's still correct
        # teeth: the same join against an UNBUCKETED side shuffles
        plain = spark.table(ta).join(
            spark.table(tb).repartition(5), on="o_custkey")
        assert _exchanges(plain) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)


def test_bucketed_groupby_has_zero_exchanges(spark, bucketed_tables):
    ta, _ = bucketed_tables
    agg = spark.table(ta).groupBy("o_custkey").agg(
        F.sum("o_total").alias("s"))
    assert _exchanges(agg) == 0
    assert agg.count() == 37


def test_bucketed_join_ready_report(spark, bucketed_tables):
    from crysda_spark.plans.bucketing import bucketed_join_ready
    ta, tb = bucketed_tables
    rep = bucketed_join_ready(spark, ta, tb)
    assert rep["shuffle_free"] and rep["n_a"] == rep["n_b"] == 8
    assert rep["bucket_cols_a"] == ["o_custkey"]
    # incompatible count without coalesceBucketsInJoin → not free
    from crysda_spark.plans.bucketing import write_bucketed
    write_bucketed(spark.range(10).select(
        F.col("id").alias("o_custkey")), "bk_tmp5", "o_custkey", 5)
    try:
        assert not bucketed_join_ready(spark, ta, "bk_tmp5")["shuffle_free"]
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_tmp5")


def test_write_bucketed_validation(spark):
    from crysda_spark.plans.bucketing import write_bucketed
    df = spark.range(3)
    with pytest.raises(ValueError, match="positive"):
        write_bucketed(df, "t", "id", 0)
    with pytest.raises(ValueError, match="not in frame"):
        write_bucketed(df, "t", "nope", 4)
