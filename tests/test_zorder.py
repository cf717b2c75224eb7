"""Z-order layout (plans/zorder.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.plans.zorder import zorder_by, zorder_key


def _grid(spark, n=16):
    rows = [(i, float(x), float(y)) for i, (x, y) in
            enumerate((x, y) for x in range(n) for y in range(n))]
    return Frame(spark.createDataFrame(rows, "id long, x double, y double"))


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)       # col 0 at even positions
        out |= ((y >> b) & 1) << (2 * b + 1)   # col 1 at odd positions
    return out


def test_zorder_key_matches_python_reference(spark):
    f = _grid(spark, 16)
    # ranges chosen so scaling is the identity on 0..15 at 4 bits
    key = zorder_key({"x": (0.0, 15.0), "y": (0.0, 15.0)}, bits=4)
    rows = f.sdf.select("x", "y", key.alias("z")).collect()
    for r in rows:
        assert r["z"] == _py_morton(int(r["x"]), int(r["y"]), 4)


def test_zorder_clamps_out_of_range(spark):
    f = Frame(_grid(spark, 4).sdf.withColumn("x", F.col("x") * 100 - 50))
    key = zorder_key({"x": (0.0, 15.0), "y": (0.0, 15.0)}, bits=4)
    rows = f.sdf.select(key.alias("z")).collect()
    assert all(0 <= r["z"] < 256 for r in rows)


def test_zorder_validation(spark):
    with pytest.raises(ValueError, match="hi > lo"):
        zorder_key({"x": (5.0, 1.0)}, bits=4)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key({})
    with pytest.raises(ValueError, match="exceeds a long"):
        zorder_key({c: (0.0, 1.0) for c in "abcdefgh"}, bits=8)


def test_zorder_layout_bounds_every_dimension(spark):
    """The data-skipping claim, measured: a single-column sort gives
    partitions spanning the FULL range of every non-leading column
    (min/max pruning on y is useless), while z-curve partitions have
    bounded extent in BOTH dimensions — 128 consecutive Morton codes
    on a 32×32 grid cover at most a 16×8 (or 8×16) rectangle."""
    f = _grid(spark, 32)
    P = 8

    def extents(sdf):
        part = (sdf.withColumn("pid", F.spark_partition_id())
                .groupBy("pid")
                .agg((F.max("x") - F.min("x") + 1).alias("ex"),
                     (F.max("y") - F.min("y") + 1).alias("ey")))
        return [(r["ex"], r["ey"]) for r in part.collect() if r["ex"] is not None]

    z = zorder_by(f, {"x": (0.0, 31.0), "y": (0.0, 31.0)}, bits=5,
                  num_partitions=P)
    x_sorted = Frame(f.sdf.repartitionByRange(P, "x").sortWithinPartitions("x"))
    # x-sort: every partition spans all 32 y values → y-pruning impossible
    assert all(ey == 32 for _, ey in extents(x_sorted.sdf))
    # z-order: BOTH extents bounded well below the full range
    for ex, ey in extents(z.sdf):
        assert ex <= 16 and ey <= 16, (ex, ey)


def test_zorder_by_preserves_rows_and_columns(spark):
    f = _grid(spark, 8)
    z = zorder_by(f, {"x": (0.0, 7.0), "y": (0.0, 7.0)}, bits=3)
    assert z.columns == f.columns
    assert z.sdf.count() == 64
    zk = zorder_by(f, {"x": (0.0, 7.0), "y": (0.0, 7.0)}, bits=3,
                   out_col="zkey")
    assert "zkey" in zk.columns


def test_optimize_parquet_compacts_and_reclusters(spark, tmp_path):
    """The OPTIMIZE verb's combined contract: a fragmented, randomly
    laid-out table comes back (a) in fewer files, (b) with every row
    intact, and (c) with per-file footer min/max bounded in BOTH
    z-ordered dimensions — compaction and re-clustering in one
    rewrite."""
    import glob
    import pyarrow.parquet as pq

    from crysda_spark.plans.zorder import optimize_parquet
    f = _grid(spark, 32)
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "opt")
    # fragment: 16 files, hash-shuffled so each file spans both ranges
    f.sdf.repartition(16, "id").write.parquet(src)
    stats = optimize_parquet(spark, src, dst,
                             {"x": (0.0, 31.0), "y": (0.0, 31.0)},
                             bits=5, num_partitions=8)
    assert stats["files_before"] == 16
    assert stats["files_after"] <= 8 < stats["files_before"]
    assert stats["rows"] == 1024
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) >= 4
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        spans = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in ("x", "y") or col.statistics is None:
                    continue
                lo, hi = col.statistics.min, col.statistics.max
                cur = spans.get(name)
                spans[name] = ((min(cur[0], lo), max(cur[1], hi))
                               if cur else (lo, hi))
        for name in ("x", "y"):
            lo, hi = spans[name]
            assert hi - lo <= 16, (fp, name, lo, hi)


def test_optimize_parquet_derives_ranges(spark, tmp_path):
    from crysda_spark.plans.zorder import optimize_parquet
    f = Frame(_grid(spark, 8).sdf.withColumn("k", F.lit(7.0)))
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    f.sdf.repartition(4).write.parquet(src)
    stats = optimize_parquet(spark, src, dst, ["x", "y", "k"],
                             bits=4, num_partitions=2)
    assert stats["ranges"]["x"] == (0.0, 7.0)
    assert stats["ranges"]["y"] == (0.0, 7.0)
    # constant column: range widened so scaling stays defined
    assert stats["ranges"]["k"] == (7.0, 8.0)
    assert stats["rows"] == 64
    back = spark.read.parquet(dst)
    assert back.count() == 64
    assert set(back.columns) == {"id", "x", "y", "k"}


def test_optimize_parquet_validation(spark, tmp_path):
    from crysda_spark.plans.zorder import optimize_parquet
    src = str(tmp_path / "v")
    _grid(spark, 4).sdf.write.parquet(src)
    with pytest.raises(ValueError, match="dst must differ"):
        optimize_parquet(spark, src, src, ["x"])
    with pytest.raises(ValueError, match="target must be positive"):
        optimize_parquet(spark, src, str(tmp_path / "o"), ["x"],
                         target_file_mb=0)
    with pytest.raises(ValueError, match="at least one"):
        optimize_parquet(spark, src, str(tmp_path / "o"), [])
    allnull = Frame(_grid(spark, 4).sdf.withColumn(
        "x", F.lit(None).cast("double")))
    src2 = str(tmp_path / "vn")
    allnull.sdf.write.parquet(src2)
    with pytest.raises(ValueError, match="all-NULL"):
        optimize_parquet(spark, src2, str(tmp_path / "o2"), ["x"])


def test_write_zordered_footer_stats_prune_both_columns(spark, tmp_path):
    """End-to-end data-skipping proof: read the WRITTEN parquet files'
    footer min/max for both z-ordered columns — every file must span
    far less than the full range in BOTH dimensions, which is exactly
    the property a pruning reader exploits (and which a single-column
    sort cannot deliver for the second column)."""
    import glob
    import pyarrow.parquet as pq

    from crysda_spark.plans.zorder import write_zordered
    f = _grid(spark, 32)
    path = str(tmp_path / "z")
    write_zordered(f, path, {"x": (0.0, 31.0), "y": (0.0, 31.0)},
                   bits=5, num_partitions=8)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) >= 4
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        spans = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in ("x", "y") or col.statistics is None:
                    continue
                lo, hi = col.statistics.min, col.statistics.max
                cur = spans.get(name)
                spans[name] = ((min(cur[0], lo), max(cur[1], hi))
                               if cur else (lo, hi))
        for name in ("x", "y"):
            lo, hi = spans[name]
            assert hi - lo <= 16, (fp, name, lo, hi)
