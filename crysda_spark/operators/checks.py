"""Declarative data-quality checks (the Deequ/dbt-tests surface).

A check compiles to an aggregate expression counting VIOLATIONS; all
aggregate checks on one frame run in a SINGLE pass over the data (one
scan, one 1-row aggregate — adding a check costs one counter, not one
job). Referential checks need a join and union in as extra plans.

``run_checks`` returns a report Frame (check, violations, total,
passed) — feed it to an alerting sink or assert_empty in CI.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["not_null", "unique", "in_range", "matches", "accepted_values",
           "satisfies", "ref_integrity", "run_checks", "violation_rows"]


@dataclass(frozen=True)
class Check:
    name: str
    kind: str                 # "agg" | "ref" | "window"
    payload: Any              # Column (agg) | (frame, col, ref_col) (ref)
    predicate: Any = None     # row-level violation predicate, when one exists
    cols: tuple = ()          # key columns (unique) — typed, not parsed
                              # back out of the display name


def not_null(col: str) -> Check:
    pred = F.col(col).isNull()
    return Check(f"not_null({col})", "agg",
                 F.sum(pred.cast("long")), pred)


def unique(*cols: str) -> Check:
    """Rows must be unique on ``cols``. Rows with a NULL key component
    count as violations (they cannot be identified), as do all copies
    beyond the first of each duplicated key."""
    name = f"unique({', '.join(cols)})"
    return Check(name, "agg",
                 F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]),
                 cols=tuple(cols))


def in_range(col: str, lo, hi) -> Check:
    """Non-null values must lie in [lo, hi] (nulls are not_null's job)."""
    pred = F.coalesce(~F.col(col).between(lo, hi), F.lit(False))
    return Check(f"in_range({col}, {lo}, {hi})", "agg",
                 F.sum((~F.col(col).between(lo, hi)).cast("long")), pred)


def matches(col: str, pattern: str) -> Check:
    pred = F.coalesce(~F.col(col).rlike(pattern), F.lit(False))
    return Check(f"matches({col})", "agg",
                 F.sum((~F.col(col).rlike(pattern)).cast("long")), pred)


def accepted_values(col: str, values) -> Check:
    pred = F.coalesce(~F.col(col).isin(*values), F.lit(False))
    return Check(f"accepted_values({col})", "agg",
                 F.sum((~F.col(col).isin(*values)).cast("long")), pred)


def satisfies(name: str, predicate: Column) -> Check:
    """Custom row predicate that must hold; violations = rows where it
    is false or NULL (SQL three-valued logic would otherwise let null
    rows slip through a constraint)."""
    ok = F.when(predicate, True).otherwise(False)
    return Check(f"satisfies({name})", "agg", F.sum((~ok).cast("long")), ~ok)


def ref_integrity(col: str, ref: Frame, ref_col: str) -> Check:
    """Every non-null value of ``col`` must exist in ``ref.ref_col``
    (foreign key). Executes as a left-anti join count."""
    return Check(f"ref_integrity({col} -> {ref_col})", "ref",
                 (ref, col, ref_col))


def run_checks(f: Frame, checks: list[Check]) -> Frame:
    """Evaluate checks against ``f``: one aggregate pass for all "agg"
    checks + one anti-join per referential check, unioned into a report
    Frame (check, violations, total, passed)."""
    if not checks:
        raise ValueError("run_checks: no checks given")
    sdf = f.sdf
    spark = sdf.sparkSession
    parts = []
    agg_checks = [c for c in checks if c.kind == "agg"]
    if agg_checks:
        row = sdf.agg(F.count(F.lit(1)).alias("_total"),
                      *[F.coalesce(c.payload, F.lit(0)).alias(f"_v{i}")
                        for i, c in enumerate(agg_checks)])
        # typed literals, not a string-interpolated stack(): check names
        # survive quotes/backslashes verbatim, so report keys always
        # equal Check.name. The explode runs over the 1-row aggregate —
        # still a single pass over the data.
        pairs = F.array(*[
            F.struct(F.lit(c.name).alias("check"),
                     F.col(f"_v{i}").cast("long").alias("violations"))
            for i, c in enumerate(agg_checks)])
        parts.append(row.select(F.explode(pairs).alias("_p"),
                                F.col("_total").alias("total"))
                     .select("_p.check", "_p.violations", "total"))
    for c in checks:
        if c.kind != "ref":
            continue
        ref, col, ref_col = c.payload
        bad = (sdf.select(F.col(col)).filter(F.col(col).isNotNull())
               .join(ref.sdf.select(F.col(ref_col).alias(col)).distinct(),
                     on=col, how="left_anti"))
        parts.append(bad.agg(F.count(F.lit(1)).alias("violations"))
                     .crossJoin(sdf.agg(F.count(F.lit(1)).alias("total")))
                     .select(F.lit(c.name).alias("check"), "violations",
                             "total"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return Frame(out.select("check", F.col("violations").cast("long").alias("violations"),
                            F.col("total").cast("long").alias("total"),
                            (F.col("violations") == 0).alias("passed")))


def violation_rows(f: Frame, check: Check, limit: int | None = None) -> Frame:
    """The OFFENDING rows for a check — counts say a table is dirty,
    these say WHERE (the triage step after a red report).

    - predicate-backed checks (not_null/in_range/matches/
      accepted_values/satisfies) filter in one map-side pass;
    - ``unique`` returns every row of each duplicated-or-null key
      (a per-key window count);
    - ``ref_integrity`` returns the left-anti rows.
    """
    sdf = f.sdf
    if check.kind == "ref":
        ref, col, ref_col = check.payload
        out = (sdf.filter(F.col(col).isNotNull())
               .join(ref.sdf.select(F.col(ref_col).alias(col)).distinct(),
                     on=col, how="left_anti"))
    elif check.predicate is not None:
        out = sdf.filter(check.predicate)
    elif check.cols:
        from pyspark.sql.window import Window as _W
        cols = list(check.cols)
        cnt = F.count(F.lit(1)).over(_W.partitionBy(*cols))
        any_null = None
        for c in cols:
            n = F.col(c).isNull()
            any_null = n if any_null is None else (any_null | n)
        out = (sdf.withColumn("_kc", cnt)
               .filter((F.col("_kc") > 1) | any_null).drop("_kc"))
    else:
        raise ValueError(
            f"violation_rows: check {check.name!r} has no row-level form")
    if limit is not None:
        out = out.limit(limit)
    return Frame(out.withColumn("check", F.lit(check.name)))
