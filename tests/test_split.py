"""Deterministic leakage-safe splitting (pipeline/split.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.pipeline.split import _A, _B, _BUCKETS, _P, assign_splits


def _py_bucket(k: int, salt: int = 0) -> int:
    return (((k + salt) % _P) * _A + _B) % _P % _BUCKETS


@pytest.fixture()
def docs(spark):
    return Frame(spark.range(2000).select(F.col("id").alias("doc_id")))


def test_assignment_matches_reference_arithmetic(docs):
    out = assign_splits(docs, "doc_id",
                        {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.sdf.collect()
    for r in rows:
        b = _py_bucket(r["doc_id"])
        want = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert r["split"] == want
    # deterministic across calls
    again = {r["doc_id"]: r["split"] for r in assign_splits(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .sdf.collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)


def test_fractions_land_near_target(docs):
    out = assign_splits(docs, "doc_id",
                        {"train": 0.9, "eval": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.sdf.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert set(counts) == {"train", "eval"}
    assert 0.85 < counts["train"] / 2000 < 0.95


def test_salt_derives_independent_assignment(docs):
    a = {r["doc_id"]: r["split"] for r in
         assign_splits(docs, "doc_id", {"a": 0.5, "b": 0.5})
         .sdf.collect()}
    b = {r["doc_id"]: r["split"] for r in
         assign_splits(docs, "doc_id", {"a": 0.5, "b": 0.5}, salt=7)
         .sdf.collect()}
    differ = sum(1 for k in a if a[k] != b[k])
    assert 500 < differ < 1500  # ~half move under an independent hash


def test_group_atomic_split_prevents_leakage(spark):
    """The leakage gate: split on the dedup SURVIVOR id and every
    member of a near-dup cluster must land in one split."""
    rows = [(i, i // 4) for i in range(400)]  # clusters of 4
    f = Frame(spark.createDataFrame(rows, "doc_id long, survivor_id long"))
    out = assign_splits(f, "survivor_id",
                        {"train": 0.5, "test": 0.5})
    bad = (out.sdf.groupBy("survivor_id")
           .agg(F.countDistinct("split").alias("k"))
           .filter(F.col("k") > 1).count())
    assert bad == 0


def test_null_key_gets_null_split(spark):
    f = Frame(spark.createDataFrame([(1,), (None,)], "doc_id long"))
    rows = {r["doc_id"]: r["split"]
            for r in assign_splits(f, "doc_id").sdf.collect()}
    assert rows[1] is not None and rows[None] is None


def test_validation(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(docs, "doc_id", {"a": 0.5})
    with pytest.raises(ValueError, match="quantization"):
        assign_splits(docs, "doc_id", {"a": 0.99999, "b": 0.00001})
    with pytest.raises(ValueError, match="unknown key"):
        assign_splits(docs, "nope")
    with pytest.raises(ValueError, match="already exists"):
        assign_splits(Frame(docs.sdf.withColumn("split", F.lit("x"))),
                      "doc_id")
    with pytest.raises(ValueError, match="> 0"):
        assign_splits(docs, "doc_id", {"a": 1.5, "b": -0.5})


def test_split_is_pure_map_side(docs):
    from crysda_spark.plans.inspect import _explain_str
    txt = _explain_str(assign_splits(docs, "doc_id").sdf, "formatted")
    assert "Exchange" not in txt  # a stamp, not a shuffle
