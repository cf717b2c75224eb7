"""Snapshot MERGE / upsert (operators/merge.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.operators.merge import merge_into


@pytest.fixture()
def frames(spark):
    target = Frame(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double"))
    source = Frame(spark.createDataFrame(
        [(2, "b2", 200.0),     # update
         (3, "c2", -1.0),      # matched; delete_condition target
         (9, "i", 90.0)],      # insert
        "k long, name string, v double"))
    return target, source


def _snap(frame):
    return sorted(tuple(r) for r in frame.sdf.collect())


def test_merge_update_insert(frames):
    t, s = frames
    out = _snap(merge_into(t, s, on="k"))
    assert out == [(1, "a", 10.0), (2, "b2", 200.0), (3, "c2", -1.0),
                   (9, "i", 90.0)]


def test_merge_with_delete_condition(frames):
    t, s = frames
    out = _snap(merge_into(t, s, on="k", delete_condition=F.col("v") < 0))
    assert out == [(1, "a", 10.0), (2, "b2", 200.0), (9, "i", 90.0)]


def test_merge_keep_and_ignore(frames):
    t, s = frames
    out = _snap(merge_into(t, s, on="k", when_matched="keep",
                           when_not_matched="ignore"))
    assert out == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]


def test_merge_null_values_survive_presence_tracking(spark):
    """Rows whose VALUE columns are null must not be confused with
    join-miss nulls — presence flags, not value nullness, drive the
    branch."""
    t = Frame(spark.createDataFrame([(1, None), (2, "x")],
                                    "k long, name string"))
    s = Frame(spark.createDataFrame([(2, None), (5, None)],
                                    "k long, name string"))
    out = _snap(merge_into(t, s, on="k"))
    assert out == [(1, None), (2, None), (5, None)]


def test_merge_rejects_mismatched_columns(spark, frames):
    t, _ = frames
    bad = Frame(t.sdf.withColumnRenamed("v", "w"))
    with pytest.raises(ValueError, match="column sets differ"):
        merge_into(t, bad, on="k")


def test_merge_rejects_bad_modes(frames):
    t, s = frames
    with pytest.raises(ValueError, match="when_matched"):
        merge_into(t, s, on="k", when_matched="explode")
    with pytest.raises(ValueError, match="when_not_matched"):
        merge_into(t, s, on="k", when_not_matched="explode")
    with pytest.raises(ValueError, match="not in columns"):
        merge_into(t, s, on="zz")


def test_merge_rejects_duplicate_source_keys(frames, spark):
    t, _ = frames
    dup = Frame(spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], "k long, name string, v double"))
    with pytest.raises(Exception, match="duplicate source key"):
        merge_into(t, dup, on="k").sdf.collect()
    # escape hatch for pre-deduped feeds: no assertion in the plan
    out = merge_into(t, dup, on="k", validate_source_unique=False)
    assert out.sdf.count() == 4  # fan-out happens, caller opted in
