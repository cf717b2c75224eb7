"""Sinks (reference write_csv: src/crysda/dataframe.cr:674-692).

Spark writes are distributed (one file per partition). ``single_file``
coalesces to one partition for small-result parity with the reference's
one-file output — only for results that fit an executor.
"""

from __future__ import annotations

from ..frame import Frame

MISSING_VALUE = "NA"


def write_csv(f: Frame, path: str, separator: str = ",", quote_char: str = '"',
              single_file: bool = False, mode: str = "overwrite") -> None:
    sdf = f.sdf.coalesce(1) if single_file else f.sdf
    (sdf.write.mode(mode)
     .option("sep", separator)
     .option("quote", quote_char)
     .option("nullValue", MISSING_VALUE)
     .option("header", True)
     .csv(path))


def write_parquet(f: Frame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = f.sdf.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json(f: Frame, path: str, mode: str = "overwrite") -> None:
    f.sdf.write.mode(mode).json(path)


def write_xml(f: Frame, path: str, row_tag: str = "row",
              root_tag: str = "rows", single_file: bool = False,
              mode: str = "overwrite") -> None:
    """XML sink (Spark 4 built-in source). One ``root_tag`` document per
    partition file with one ``row_tag`` element per row — distributed
    like every other sink; ``single_file`` coalesces for one-document
    parity (small results only)."""
    sdf = f.sdf.coalesce(1) if single_file else f.sdf
    (sdf.write.mode(mode).format("xml")
     .option("rowTag", row_tag).option("rootTag", root_tag).save(path))


def write_parquet_dynamic(f: Frame, path: str,
                          partition_by: list[str] | str) -> None:
    """Dynamic partition overwrite: rewrite ONLY the partitions present
    in ``f``, leaving every other partition untouched — the incremental
    ingest write (daily batch replaces its own day, history stays).
    Plain mode="overwrite" with partitionBy would TRUNCATE the whole
    table first; the static/dynamic distinction is the single most
    destructive default in Spark's write path, so it gets its own verb.
    """
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    spark = f.sdf.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        f.sdf.write.mode("overwrite").partitionBy(*cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_parquet_sized(f: Frame, path: str, target_file_mb: int = 256,
                        mode: str = "overwrite") -> int:
    """Write parquet with output files sized toward ``target_file_mb``
    of INPUT bytes each (compressed size is what both the scheduler
    and the next reader see). Returns the partition count written.

    Spark writes one file per partition, so a frame fresh off a wide
    shuffle writes shuffle-partition-count files — at 100 TB that is
    either millions of small files (metadata storms on every future
    scan/list) or a handful of giants (no read parallelism). Sizing
    from measured bytes instead of partition counts keeps both
    failure modes out."""
    from ..plans.sizing import input_bytes
    if target_file_mb <= 0:
        raise ValueError(f"write_parquet_sized: target must be positive, "
                         f"got {target_file_mb}")
    total = input_bytes(f.sdf)
    n = max(1, int(total // (target_file_mb * 1024 * 1024)) + 1)
    f.sdf.repartition(n).write.mode(mode).parquet(path)
    return n


def compact_parquet(spark, src_path: str, dst_path: str,
                    target_file_mb: int = 256) -> dict:
    """Small-file compaction: rewrite a parquet directory with files
    sized toward ``target_file_mb`` — the table-maintenance pass every
    long-lived ingest needs (streaming sinks and dynamic-partition
    writes accrete small files; scan cost grows with file COUNT via
    listing + footer reads + task scheduling, not just bytes).

    Reads ``src_path``, writes ``dst_path`` (refuses same-path rewrite:
    overwrite-while-reading truncates the source mid-scan). Returns
    {files_before, files_after, bytes, rows}."""
    import os
    if os.path.abspath(src_path) == os.path.abspath(dst_path):
        raise ValueError("compact_parquet: dst must differ from src "
                         "(in-place overwrite truncates the input "
                         "mid-scan)")
    from ..plans.sizing import input_bytes
    sdf = spark.read.parquet(src_path)
    files_before = len(sdf.inputFiles())
    total = input_bytes(sdf)
    n = max(1, int(total // (target_file_mb * 1024 * 1024)) + 1)
    sdf.repartition(n).write.mode("overwrite").parquet(dst_path)
    out = spark.read.parquet(dst_path)
    return {"files_before": files_before,
            "files_after": len(out.inputFiles()),
            "bytes": total, "rows": out.count()}
