"""Shuffle-partition sizing from actual input bytes.

``spark.sql.shuffle.partitions`` is the config most often left at a
default that is wrong in BOTH directions: too few partitions spill
(each reducer's working set exceeds executor memory), too many drown
the job in per-task overhead. AQE coalesces small partitions at
runtime but cannot SPLIT an under-partitioned shuffle that has
already spilled — the initial number still matters at 100 TB.

These helpers read the plan's input file sizes (driver-side listing
through the Hadoop FileSystem — works for any supported scheme, not
just local paths) and recommend a partition count targeting a chosen
per-partition size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF

__all__ = ["input_bytes", "dir_input_bytes", "recommend_shuffle_partitions",
           "apply_recommended_shuffle_partitions"]


def input_bytes(sdf: SparkDF) -> int:
    """Total bytes of the files feeding this DataFrame's scans
    (compressed on-disk size — the scheduler's own unit)."""
    spark = sdf.sparkSession
    jvm = spark._jvm                                     # noqa: SLF001
    hconf = spark._jsc.hadoopConfiguration()             # noqa: SLF001
    total = 0
    for path in sdf.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()
    return total


def recommend_shuffle_partitions(sdf: SparkDF, target_partition_mb: int = 128,
                                 expansion: float = 1.0,
                                 min_partitions: int = 1,
                                 max_partitions: int = 200_000) -> int:
    """Partition count so each shuffle partition lands near
    ``target_partition_mb`` of input data. ``expansion`` scales for
    decompression / join fan-out (parquet→shuffle commonly 2-4×).
    Clamped to [min_partitions, max_partitions]; apply with
    ``spark.conf.set("spark.sql.shuffle.partitions", n)`` before the
    job (AQE will still coalesce downward at runtime)."""
    if target_partition_mb <= 0:
        raise ValueError(f"recommend_shuffle_partitions: target must be "
                         f"positive, got {target_partition_mb}")
    total = input_bytes(sdf) * expansion
    n = int(total // (target_partition_mb * 1024 * 1024)) + 1
    return max(min_partitions, min(n, max_partitions))


def dir_input_bytes(spark, path: str) -> int:
    """Recursive byte total of all files under ``path`` (driver-side
    Hadoop FileSystem listing — any supported scheme). The dataset-level
    counterpart of ``input_bytes`` for sizing a whole session before any
    DataFrame exists."""
    jvm = spark._jvm                                     # noqa: SLF001
    hconf = spark._jsc.hadoopConfiguration()             # noqa: SLF001
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        total += it.next().getLen()
    return total


def apply_recommended_shuffle_partitions(
        spark, path: str, target_partition_mb: int = 128,
        expansion: float = 2.0, floor: int | None = None,
        max_partitions: int = 200_000) -> int:
    """Size ``spark.sql.shuffle.partitions`` from the dataset the
    session is about to process: bytes-under-``path`` × ``expansion``
    (parquet→shuffle decompression fan-out, default 2×) split into
    ~``target_partition_mb`` partitions. Floored at the session's
    default parallelism — below core count the extra partitions cost
    nothing and dropping under it would idle cores. At 100 TB this is
    the config that matters most: AQE coalesces an over-partitioned
    shuffle for free but cannot split one that already spilled.

    Returns the applied count (also set on the session)."""
    if floor is None:
        floor = spark.sparkContext.defaultParallelism
    total = dir_input_bytes(spark, path) * expansion
    n = int(total // (target_partition_mb * 1024 * 1024)) + 1
    n = max(floor, min(n, max_partitions))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n
