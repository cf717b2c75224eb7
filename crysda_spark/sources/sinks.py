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
