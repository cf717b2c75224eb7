"""Snapshot DIFF — reconcile two versions of a table.

The verb every snapshot-based pipeline (the ``merge_into`` /
``scd2_apply`` family, any object-store table without a changelog)
eventually needs: given an OLD and a NEW snapshot and a key, classify
every row as added / removed / changed / unchanged — the data-diff /
CDF-reconstruction primitive, used for migration validation ("does the
rewritten pipeline produce the same table?"), CDC backfill (derive the
change feed two snapshots imply), and drift audits.

Scale shape: ONE full-outer join on the key (both sides are
table-sized, so at scale this is an SMJ on one key shuffle each — the
honest floor for comparing two tables; AQE broadcasts when one side is
small). Row classification is a null-safe STRUCT comparison — pure
codegen, exact on every type Spark can compare (no hashing, no
collision caveat), evaluated map-side after the join. Column pruning
still applies: pass ``compare`` to diff a subset and the scan reads
only key + compared columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["table_diff", "diff_summary"]


def _diff_plan(old: Frame, new: Frame, on, compare):
    keys = [on] if isinstance(on, str) else list(on)
    reserved = {"_in_old", "_in_new", "_vo", "_vn", "diff"}
    bad = [k for k in keys if k in reserved]
    if bad:
        raise ValueError(f"table_diff: key column(s) {bad} collide with "
                         f"reserved output names {sorted(reserved)}")
    o = old.sdf if hasattr(old, "sdf") else old
    n = new.sdf if hasattr(new, "sdf") else new
    for side, sdf in (("old", o), ("new", n)):
        missing = [k for k in keys if k not in sdf.columns]
        if missing:
            raise ValueError(f"table_diff: key column(s) {missing} not in "
                             f"{side} frame")
    if compare is None:
        compare = [c for c in o.columns if c not in keys and c in n.columns]
    else:
        compare = list(compare)
        for side, sdf in (("old", o), ("new", n)):
            missing = [c for c in compare if c not in sdf.columns]
            if missing:
                raise ValueError(f"table_diff: compare column(s) {missing} "
                                 f"not in {side} frame")
        overlap = [c for c in compare if c in keys]
        if overlap:
            raise ValueError(f"table_diff: compare column(s) {overlap} are "
                             f"key columns")
    lo = o.select(*keys, F.lit(True).alias("_in_old"),
                  F.struct(*[F.col(c) for c in compare]).alias("_vo")
                  if compare else F.lit(True).alias("_vo"))
    ln = n.select(*keys, F.lit(True).alias("_in_new"),
                  F.struct(*[F.col(c) for c in compare]).alias("_vn")
                  if compare else F.lit(True).alias("_vn"))
    j = lo.join(ln, on=keys, how="full_outer")
    diff = (F.when(F.col("_in_old").isNull(), F.lit("added"))
            .when(F.col("_in_new").isNull(), F.lit("removed"))
            .when(F.col("_vo").eqNullSafe(F.col("_vn")),
                  F.lit("unchanged"))
            .otherwise(F.lit("changed")))
    return j, keys, compare, diff


def table_diff(old: Frame, new: Frame, on,
               compare: list[str] | None = None) -> Frame:
    """Per-row reconciliation of two snapshots: returns the key
    column(s) plus ``diff`` in {'added', 'removed', 'changed',
    'unchanged'}. ``on`` must identify a row in each snapshot
    (duplicate keys fan out through the join, exactly as a MERGE
    would); ``compare`` limits which non-key columns define "changed"
    (default: every non-key column present in BOTH frames — columns
    only one side carries are ignored, they describe schema drift, not
    row drift). NULL==NULL counts as equal (``eqNullSafe`` — a NULL
    that stays NULL did not change)."""
    j, keys, _, diff = _diff_plan(old, new, on, compare)
    return Frame(j.select(*keys, diff.alias("diff")))


def diff_summary(old: Frame, new: Frame, on,
                 compare: list[str] | None = None) -> Frame:
    """The four reconciliation counts in one aggregate — one row per
    class actually present: ``(diff, n)``. Same join as
    :func:`table_diff`; the counts reduce map-side."""
    j, _, _, diff = _diff_plan(old, new, on, compare)
    return Frame(j.select(diff.alias("diff")).groupBy("diff")
                 .agg(F.count(F.lit(1)).alias("n")))
