"""Manifest-based incremental ingest (sources/incremental.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crysda_spark.sources.incremental import (list_new_files, mark_processed,
                                              read_new_parquet)


def test_incremental_ingest_loop(spark, tmp_path):
    landing = str(tmp_path / "landing")
    manifest = str(tmp_path / "manifest")
    os.makedirs(landing)

    def drop(ids):
        spark.createDataFrame([(i,) for i in ids], "id long") \
            .coalesce(1).write.mode("append").parquet(landing)

    drop([1, 2, 3])
    df, files = read_new_parquet(spark, landing, manifest)
    assert df is not None and len(files) >= 1
    assert sorted(r.id for r in df.collect()) == [1, 2, 3]
    mark_processed(spark, files, manifest)

    # nothing new → no scan
    df2, files2 = read_new_parquet(spark, landing, manifest)
    assert df2 is None and files2 == []

    # second drop → exactly the delta
    drop([4, 5])
    df3, files3 = read_new_parquet(spark, landing, manifest)
    assert sorted(r.id for r in df3.collect()) == [4, 5]
    assert set(files3).isdisjoint(files)
    mark_processed(spark, files3, manifest)
    assert read_new_parquet(spark, landing, manifest)[0] is None


def test_rewritten_file_reprocesses(spark, tmp_path):
    landing = str(tmp_path / "landing")
    manifest = str(tmp_path / "manifest")
    os.makedirs(landing)
    spark.createDataFrame([(1,)], "id long").coalesce(1) \
        .write.mode("append").parquet(landing)
    _, files = read_new_parquet(spark, landing, manifest)
    mark_processed(spark, files, manifest)
    # rewrite the same path with different content (size changes)
    target = [f for f in os.listdir(landing) if f.endswith(".parquet")][0]
    spark.createDataFrame([(7,), (8,), (9,)], "id long").coalesce(1) \
        .write.mode("overwrite").parquet(str(tmp_path / "stage"))
    staged = [f for f in os.listdir(str(tmp_path / "stage"))
              if f.endswith(".parquet")][0]
    os.replace(str(tmp_path / "stage" / staged),
               os.path.join(landing, target))
    new = list_new_files(spark, landing, manifest)
    assert len(new) == 1 and new[0].endswith(target)


def test_non_data_files_ignored(spark, tmp_path):
    landing = str(tmp_path / "landing")
    manifest = str(tmp_path / "manifest")
    os.makedirs(landing)
    spark.createDataFrame([(1,)], "id long").coalesce(1) \
        .write.mode("append").parquet(landing)
    # _SUCCESS / dotfiles / other suffixes never count as data
    open(os.path.join(landing, "notes.txt"), "w").write("x")
    new = list_new_files(spark, landing, manifest)
    assert all(f.endswith(".parquet") for f in new)
    assert not any("_SUCCESS" in f or "notes.txt" in f for f in new)
