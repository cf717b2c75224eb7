"""Z-order (Morton) clustering for multi-dimensional data skipping.

The lakehouse layout trick (Delta OPTIMIZE ZORDER BY, Iceberg
sort-order z-curves): interleave the bits of several columns' scaled
values and range-partition + sort by the combined key, so rows close
in EVERY dimension land close on disk. Parquet min/max footer stats
then prune multi-column predicates, where a single-column sort only
prunes its leading column.

Everything is a codegen'd expression (shiftright/&/shiftleft/sum —
no UDF): ``bits × n_cols`` terms, constant-folded per row. Column
values min-max scale into ``2^bits`` buckets with CLAMPING, so ranges
narrower than the data cost resolution, never correctness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["zorder_key", "zorder_by", "optimize_parquet"]


def _scaled(col: str, lo: float, hi: float, bits: int) -> Column:
    if not hi > lo:
        raise ValueError(f"zorder: need hi > lo for {col!r}, got ({lo}, {hi})")
    maxv = (1 << bits) - 1
    x = (F.col(col).cast("double") - lo) / (hi - lo) * maxv
    return F.least(F.greatest(F.floor(x).cast("long"), F.lit(0)),
                   F.lit(maxv))


def zorder_key(ranges: dict[str, tuple[float, float]], bits: int = 8) -> Column:
    """Morton key over the given columns: column i contributes its
    scaled value's bit b at output position ``b·n_cols + i``. Bit
    fields are disjoint, so the interleave is a plain SUM of shifted
    terms — one whole-stage-codegen expression, reproducible in any
    engine with shift/mask ops (the SQL-oracle contract).

    ``len(ranges)·bits`` must fit a long (≤ 63 bits).
    """
    cols = list(ranges)
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key: need at least one column")
    if n * bits > 63:
        raise ValueError(f"zorder_key: {n} cols × {bits} bits exceeds a long")
    scaled = [_scaled(c, *ranges[c], bits) for c in cols]
    terms = []
    for b in range(bits):
        for i, sc in enumerate(scaled):
            bit = F.shiftright(sc, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * n + i))
    key = terms[0]
    for t in terms[1:]:
        key = key + t
    return key


def zorder_by(f: Frame, ranges: dict[str, tuple[float, float]],
              bits: int = 8, num_partitions: int | None = None,
              out_col: str | None = None) -> Frame:
    """Re-layout the frame along the z-curve: range-partition on the
    Morton key (balanced partitions via range exchange) and sort within
    partitions, which is exactly what a parquet writer needs for tight
    per-file min/max stats on EVERY z-ordered column. Keep the key with
    ``out_col`` for inspection, or drop it (default)."""
    key = zorder_key(ranges, bits)
    sdf = f.sdf.withColumn("__z__", key)
    sdf = (sdf.repartitionByRange(num_partitions, "__z__")
           if num_partitions else sdf.repartitionByRange("__z__"))
    sdf = sdf.sortWithinPartitions("__z__")
    if out_col:
        return Frame(sdf.withColumnRenamed("__z__", out_col))
    return Frame(sdf.drop("__z__"))


def write_zordered(f: Frame, path: str,
                   ranges: dict[str, tuple[float, float]], bits: int = 8,
                   num_partitions: int | None = None) -> None:
    """Z-order and WRITE: one file per range-partition of the Morton
    key, so every parquet footer carries tight min/max stats on ALL
    z-ordered columns — the artifact a min/max-pruning reader
    actually skips on. (repartitionByRange then sortWithinPartitions;
    a plain write after a global sort would re-split arbitrarily.)"""
    zorder_by(f, ranges, bits=bits,
              num_partitions=num_partitions).sdf.write.mode(
        "overwrite").parquet(path)


def optimize_parquet(spark, src_path: str, dst_path: str,
                     zorder: "dict[str, tuple[float, float]] | list[str]",
                     bits: int = 8, target_file_mb: int = 256,
                     num_partitions: int | None = None) -> dict:
    """OPTIMIZE-style table maintenance in ONE pass: compact a
    fragmented parquet directory toward ``target_file_mb`` files AND
    re-cluster the rewrite along the z-curve — the combined verb Delta
    ships as ``OPTIMIZE ... ZORDER BY``. Doing both in one rewrite
    matters operationally: compaction and re-clustering each cost a
    full read+write of the table, and a table big enough to need
    compaction is big enough that you never want to pay that twice.

    ``zorder`` is either explicit ``{col: (lo, hi)}`` ranges (cheap —
    no extra pass) or a bare column list, in which case the ranges are
    derived from the data with one min/max aggregate (a single bounded
    driver-side row; constant columns get a widened range so scaling
    stays defined, costing resolution on that column only, never
    correctness).

    Reads ``src_path``, writes ``dst_path`` (refuses same-path rewrite:
    overwrite-while-reading truncates the source mid-scan — same
    contract as ``compact_parquet``). ``num_partitions`` overrides the
    byte-derived file count (tests / small tables). Returns
    {files_before, files_after, bytes, rows, partitions, ranges}.
    """
    import os
    if os.path.abspath(src_path) == os.path.abspath(dst_path):
        raise ValueError("optimize_parquet: dst must differ from src "
                         "(in-place overwrite truncates the input "
                         "mid-scan)")
    from .sizing import input_bytes
    if target_file_mb <= 0:
        raise ValueError(f"optimize_parquet: target must be positive, "
                         f"got {target_file_mb}")
    sdf = spark.read.parquet(src_path)
    files_before = len(sdf.inputFiles())
    total = input_bytes(sdf)
    if isinstance(zorder, dict):
        ranges = dict(zorder)
    else:
        cols = list(zorder)
        if not cols:
            raise ValueError("optimize_parquet: need at least one "
                             "z-order column")
        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"hi_{c}")]
        row = sdf.agg(*aggs).first()
        ranges = {}
        for c in cols:
            lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
            if lo is None:
                raise ValueError(f"optimize_parquet: column {c!r} is "
                                 f"all-NULL; cannot derive a z-range")
            if not hi > lo:
                hi = lo + 1.0
            ranges[c] = (float(lo), float(hi))
    n = num_partitions or max(
        1, int(total // (target_file_mb * 1024 * 1024)) + 1)
    write_zordered(Frame(sdf), dst_path, ranges, bits=bits,
                   num_partitions=n)
    out = spark.read.parquet(dst_path)
    return {"files_before": files_before,
            "files_after": len(out.inputFiles()),
            "bytes": total, "rows": out.count(),
            "partitions": n, "ranges": ranges}
