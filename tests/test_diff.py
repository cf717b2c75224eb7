"""Snapshot DIFF (operators/diff.py)."""

from __future__ import annotations

import pytest

from crysda_spark import Frame
from crysda_spark.operators.diff import diff_summary, table_diff


@pytest.fixture()
def snaps(spark):
    old = Frame(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None),
         (4, "d", 40.0), (5, None, 50.0)],
        "k long, name string, v double"))
    new = Frame(spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "b2", 20.0),       # changed (name)
         (3, "c", None),        # unchanged — NULL stayed NULL
         (5, None, 51.0),       # changed (v); NULL name equal both sides
         (9, "i", 90.0)],       # added; 4 removed
        "k long, name string, v double"))
    return old, new


def test_table_diff_classifies_all_four(snaps):
    old, new = snaps
    got = {r["k"]: r["diff"] for r in table_diff(old, new, on="k")
           .sdf.collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "removed", 5: "changed", 9: "added"}


def test_diff_summary_counts(snaps):
    old, new = snaps
    got = {r["diff"]: r["n"] for r in diff_summary(old, new, on="k")
           .sdf.collect()}
    assert got == {"unchanged": 2, "changed": 2, "removed": 1, "added": 1}


def test_diff_compare_subset_and_schema_drift(spark, snaps):
    old, new = snaps
    # comparing only v: row 2's name change no longer counts
    got = {r["k"]: r["diff"]
           for r in table_diff(old, new, on="k", compare=["v"])
           .sdf.collect()}
    assert got[2] == "unchanged" and got[5] == "changed"
    # a column only one side carries is schema drift, not row drift
    wide = Frame(new.sdf.withColumn("extra", new.sdf["v"] * 2))
    got2 = {r["k"]: r["diff"] for r in table_diff(old, wide, on="k")
            .sdf.collect()}
    assert got2 == {r["k"]: r["diff"]
                    for r in table_diff(old, new, on="k").sdf.collect()}
    # compare=[] degenerates to key-presence diff
    got3 = {r["k"]: r["diff"]
            for r in table_diff(old, new, on="k", compare=[]).sdf.collect()}
    assert got3[2] == "unchanged" and got3[9] == "added" \
        and got3[4] == "removed"


def test_diff_multi_key(spark):
    old = Frame(spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "a long, b string, v double"))
    new = Frame(spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 3.0), (2, "x", 9.0)],
        "a long, b string, v double"))
    got = {(r["a"], r["b"]): r["diff"]
           for r in table_diff(old, new, on=["a", "b"]).sdf.collect()}
    assert got == {(1, "x"): "unchanged", (1, "y"): "changed",
                   (2, "x"): "added"}


def test_diff_validation(spark, snaps):
    old, new = snaps
    with pytest.raises(ValueError, match="not in old"):
        table_diff(old, new, on="nope")
    with pytest.raises(ValueError, match="compare column"):
        table_diff(old, new, on="k", compare=["ghost"])
    with pytest.raises(ValueError, match="are key columns"):
        table_diff(old, new, on="k", compare=["k"])
    with pytest.raises(ValueError, match="reserved"):
        table_diff(Frame(old.sdf.withColumnRenamed("k", "diff")),
                   Frame(new.sdf.withColumnRenamed("k", "diff")),
                   on="diff")


def test_changefeed_contents_and_roundtrip(snaps):
    """The derived CDC feed is delta-sized with new values on upserts
    and old values on deletes; replaying it onto the old snapshot
    reproduces the new snapshot EXACTLY."""
    from crysda_spark.operators.diff import apply_changefeed, changefeed
    old, new = snaps
    feed = changefeed(old, new, on="k")
    rows = {r["k"]: (r["op"], r["name"], r["v"])
            for r in feed.sdf.collect()}
    assert rows == {2: ("update", "b2", 20.0),
                    5: ("update", None, 51.0),
                    4: ("delete", "d", 40.0),    # old values
                    9: ("insert", "i", 90.0)}
    replayed = apply_changefeed(old, feed, on="k")
    assert (sorted(tuple(r) for r in replayed.sdf.collect())
            == sorted(tuple(r) for r in new.sdf.collect()))


def test_changefeed_compare_subset_hides_changes(snaps):
    from crysda_spark.operators.diff import changefeed
    old, new = snaps
    feed = changefeed(old, new, on="k", compare=["v"])
    ops = {r["k"]: r["op"] for r in feed.sdf.collect()}
    # row 2 changed only name -> invisible when comparing v alone
    assert 2 not in ops and ops[5] == "update"


def test_apply_changefeed_validation(snaps):
    from crysda_spark.operators.diff import apply_changefeed, changefeed
    old, new = snaps
    with pytest.raises(ValueError, match="no 'op' column"):
        apply_changefeed(old, new, on="k")
    feed = changefeed(old, new, on="k")
    narrow = Frame(old.sdf.drop("v"))
    with pytest.raises(ValueError, match="cannot replay"):
        apply_changefeed(narrow, feed, on="k")


def test_schema_diff(spark, snaps):
    from crysda_spark.operators.diff import schema_diff
    old, new = snaps
    assert schema_diff(old, new) == []
    from pyspark.sql import functions as F
    drifted = Frame(new.sdf.drop("name")
                    .withColumn("v", F.col("v").cast("float"))
                    .withColumn("extra", F.lit(1)))
    got = {d["column"]: d["change"] for d in schema_diff(old, drifted)}
    assert got == {"name": "removed", "v": "type_changed",
                   "extra": "added"}


def test_changefeed_pruned_matches_unpruned(snaps):
    """The bucket-pruned 100 TB path must produce the identical feed:
    digests flag exactly the buckets holding deltas, the full join
    runs only there."""
    from crysda_spark.operators.diff import changefeed
    old, new = snaps
    want = sorted(tuple(r) for r in
                  changefeed(old, new, on="k").sdf.collect())
    for buckets in (1, 8, 64):
        got = sorted(tuple(r) for r in
                     changefeed(old, new, on="k",
                                prune_buckets=buckets).sdf.collect())
        assert got == want, buckets


def test_changefeed_prune_flags_only_delta_buckets(spark):
    from crysda_spark.operators.diff import _changed_buckets, changefeed
    rows = [(i, float(i)) for i in range(200)]
    old = Frame(spark.createDataFrame(rows, "k long, v double"))
    new = Frame(spark.createDataFrame(
        [(k, v + 1.0 if k == 137 else v) for k, v in rows],
        "k long, v double"))
    ch = _changed_buckets(old.sdf, new.sdf, ["k"], ["v"], 64)
    assert ch.count() == 1  # one changed key -> exactly one bucket
    feed = changefeed(old, new, on="k", prune_buckets=64)
    assert [(r["op"], r["k"]) for r in feed.sdf.collect()] \
        == [("update", 137)]


def test_changefeed_prune_null_position_shift(spark):
    """xxhash64 skips NULL columns; the digest appends is-null flags
    so a null-position swap still flags the bucket."""
    from crysda_spark.operators.diff import changefeed
    old = Frame(spark.createDataFrame([(1, "a", None), (2, "b", "c")],
                                      "k long, x string, y string"))
    new = Frame(spark.createDataFrame([(1, None, "a"), (2, "b", "c")],
                                      "k long, x string, y string"))
    for pb in (None, 16):
        feed = changefeed(old, new, on="k", prune_buckets=pb)
        assert [(r["op"], r["k"]) for r in feed.sdf.collect()] \
            == [("update", 1)], pb


def test_changefeed_prune_validation(snaps):
    from crysda_spark.operators.diff import changefeed
    old, new = snaps
    with pytest.raises(ValueError, match="prune_buckets"):
        changefeed(old, new, on="k", prune_buckets=0)
