"""Bitmap distinct/set algebra (operators/bitmap.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.operators import bitmap as bm


def _ids(spark, ids):
    return Frame(spark.createDataFrame([(i,) for i in ids], "id long"))


def test_bitmap_count_exact(spark):
    f = _ids(spark, [1, 2, 3, 64, 65, 128, 1, 2])   # dups collapse
    built = bm.bitmap_build(f, "id")
    assert bm.bitmap_count(built).collect()[0]["n_distinct"] == 6


def test_bitmap_set_algebra(spark):
    a = bm.bitmap_build(_ids(spark, range(0, 100)), "id")
    b = bm.bitmap_build(_ids(spark, range(50, 150)), "id")
    assert bm.bitmap_count(bm.bitmap_and(a, b)).collect()[0][0] == 50
    assert bm.bitmap_count(bm.bitmap_or(a, b)).collect()[0][0] == 150
    assert bm.bitmap_count(bm.bitmap_andnot(a, b)).collect()[0][0] == 50
    assert bm.bitmap_count(bm.bitmap_andnot(b, a)).collect()[0][0] == 50


def test_bitmap_sparse_words_and_nulls(spark):
    f = Frame(_ids(spark, [0, 63, 64, 100000]).sdf.union(
        _ids(spark, [0]).sdf.select(F.lit(None).cast("long").alias("id"))))
    built = bm.bitmap_build(f, "id")
    assert bm.bitmap_count(built).collect()[0][0] == 4
    # word ids are sparse — only occupied words exist
    assert built.sdf.count() == 3        # words 0 (ids 0,63), 1 (64), 1562


def test_bitmap_segmented_build(spark):
    rows = [("a", 1), ("a", 2), ("b", 1), ("b", 1)]
    f = Frame(spark.createDataFrame(rows, "seg string, id long"))
    built = bm.bitmap_build(f, "id", keys="seg")
    per = {r["seg"]: r["n"] for r in
           built.sdf.groupBy("seg").agg(
               F.sum(F.bit_count("bits")).alias("n")).collect()}
    assert per == {"a": 2, "b": 1}


def test_bitmap_empty(spark):
    e = bm.bitmap_build(Frame(_ids(spark, []).sdf), "id")
    assert bm.bitmap_count(e).collect()[0][0] == 0
