"""Combining tables (reference: src/crysda/dataframe.cr:104-182).

- bind_rows: union by column name over the union of all columns, missing
  columns null-filled, grouping dropped (src/crysda/dataframe.cr:104-160).
  Spark's ``unionByName(allowMissingColumns=True)`` is exactly this and
  stays a metadata-only plan node (no shuffle).
- bind_cols: positional column concat (src/crysda/dataframe.cr:162-182).
  Spark has no positional zip; we join on the hidden per-partition
  ordinal re-ranked to a global row number. The global row_number is a
  single-partition window — bind_cols is inherently order-coupled, use
  joins for anything big (documented divergence at scale).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..frame import ORD, Frame


def bind_rows(*frames: Frame) -> Frame:
    sdfs = [f.sdf for f in frames]
    out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), sdfs)
    return Frame(out)


def bind_cols(left: Frame, right: Frame, rename_duplicates: bool = True) -> Frame:
    lnames = left.columns
    rnames = right.columns
    if rename_duplicates:
        taken = set(lnames)
        m = {}
        for c in rnames:
            if c in taken:
                i = 1
                while f"{c}_{i}" in taken:
                    i += 1
                m[c] = f"{c}_{i}"
                taken.add(f"{c}_{i}")
        rsdf = right.sdf.withColumnsRenamed(m) if m else right.sdf
        rnames = [m.get(c, c) for c in rnames]
    else:
        rsdf = right.sdf

    l = _with_rownum(left.sdf, "__bc_rn__")
    r = _with_rownum(rsdf, "__bc_rn__")
    out = l.join(r, on="__bc_rn__", how="inner").drop("__bc_rn__")
    return Frame(out.select(*lnames, *rnames))


def _with_rownum(sdf, name: str):
    w = W.partitionBy().orderBy(F.col(ORD))
    tmp = sdf.withColumn(ORD, F.monotonically_increasing_id())
    return tmp.withColumn(name, F.row_number().over(w)).drop(ORD)
