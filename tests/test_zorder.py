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
