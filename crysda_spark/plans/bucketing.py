"""Bucketed tables: the co-located-join layout for 100 TB facts.

A shuffle on the fact table is the single most expensive operation a
100 TB join can do. Hive-style bucketing spends that shuffle ONCE at
write time — rows hash-partitioned into a fixed bucket count by the
join/aggregation key, bucket identity recorded in the metastore — and
every later equi-join or aggregation on that key reads co-located
buckets with ZERO exchange on either bucketed side (Spark's
EnsureRequirements sees HashClusteredDistribution already satisfied).

The batch analog of what the reference cannot express at all: its
single-node tables (/root/reference/src — in-memory frames, no
storage layout) never face a distributed shuffle.

Scale guidance baked into the API:
- bucket count is a LAYOUT CONSTANT for the table's lifetime; joins
  between tables bucketed on the same key only skip the shuffle when
  bucket counts match (or one divides the other with
  spark.sql.bucketing.coalesceBucketsInJoin.enabled) — so
  ``write_bucketed`` takes it explicitly, no silent default.
- sortBy within buckets turns the residual per-bucket join into a
  merge without a sort step.
- a bucketed table written once serves every downstream join on that
  key; tests/test_plans.py proves the join plan carries no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF

__all__ = ["write_bucketed", "bucketed_join_ready"]


def write_bucketed(sdf: SparkDF, table: str, bucket_cols: list[str] | str,
                   n_buckets: int, sort_cols: list[str] | str | None = None,
                   mode: str = "overwrite", path: str | None = None) -> None:
    """Write ``sdf`` as a bucketed (and optionally bucket-sorted)
    managed table. ``bucket_cols`` should be the table's dominant
    join/groupBy key; ``n_buckets`` sizes parallelism for LIFE —
    pick ~(largest expected scan bytes / 128 MB), rounded to a number
    whose divisors match sibling tables so coalesced bucket joins
    stay shuffle-free."""
    if n_buckets <= 0:
        raise ValueError(f"write_bucketed: n_buckets must be positive, "
                         f"got {n_buckets}")
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) \
        else list(bucket_cols)
    missing = [c for c in bucket_cols if c not in sdf.columns]
    if missing:
        raise ValueError(f"write_bucketed: bucket columns not in frame: "
                         f"{missing}")
    if mode == "overwrite":
        # the default catalog is session-scoped (no persistent
        # metastore): a managed-table dir left by a PREVIOUS session is
        # an orphan this session's overwrite cannot see — drop the
        # registration if any, then clear the orphan location
        spark = sdf.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if path is None:
            warehouse = spark.conf.get("spark.sql.warehouse.dir")
            jvm = spark._jvm                              # noqa: SLF001
            loc = jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
            fs = loc.getFileSystem(
                spark._jsc.hadoopConfiguration())         # noqa: SLF001
            if fs.exists(loc):
                fs.delete(loc, True)
    w = sdf.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) \
            else list(sort_cols)
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join_ready(spark, table_a: str, table_b: str) -> dict:
    """Report whether an equi-join between two saved tables can skip
    the shuffle: same bucket columns and compatible bucket counts
    (equal, or divisible when coalesceBucketsInJoin is on). Returns
    {bucket_cols_a/b, n_a, n_b, shuffle_free} — the pre-flight check
    a 100 TB job runs BEFORE submitting, not after the first stage
    spills."""
    def info(table: str) -> tuple[list[str], int]:
        rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        cols: list[str] = []
        n = 0
        for r in rows:
            if r["col_name"] == "Num Buckets":
                n = int(r["data_type"])
            elif r["col_name"] == "Bucket Columns":
                cols = [c.strip(" `")
                        for c in r["data_type"].strip("[]").split(",")]
        return cols, n

    ca, na = info(table_a)
    cb, nb = info(table_b)
    coalesce_on = str(spark.conf.get(
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled",
        "false")).lower() == "true"
    compatible = na > 0 and nb > 0 and ca == cb and (
        na == nb or (coalesce_on and (na % nb == 0 or nb % na == 0)))
    return {"bucket_cols_a": ca, "bucket_cols_b": cb,
            "n_a": na, "n_b": nb, "shuffle_free": compatible}
