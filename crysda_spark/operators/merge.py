"""Snapshot MERGE (upsert) — the CDC/table-maintenance verb.

Spark core has no MERGE INTO without a table format (Delta/Iceberg);
the relational rewrite is a single full-outer join on the merge keys,
which is exactly how those formats execute the non-conflict path. At
scale this is one key shuffle (AQE broadcasts a small changeset), and
the output is a NEW snapshot frame — write it wherever the previous
snapshot lived (immutable-snapshot discipline instead of in-place
mutation, which object stores want anyway).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["merge_into"]


def merge_into(target: Frame, source: Frame, on,
               when_matched: str = "update",
               when_not_matched: str = "insert",
               delete_condition: Column | None = None,
               validate_source_unique: bool = True) -> Frame:
    """SQL ``MERGE INTO`` subset as a pure snapshot transform.

    - ``on``: merge key column(s), present in both frames; source keys
      must be UNIQUE — duplicate source keys would silently fan out
      matched target rows, so by default the plan carries a lazy
      per-row assertion that FAILS THE JOB on a duplicate source key
      (one window pass over the source — cheap next to the join;
      ``validate_source_unique=False`` drops it for pre-deduped CDC
      feeds).
    - ``when_matched``: ``"update"`` (source row wins) or ``"keep"``
      (target row wins).
    - ``when_not_matched``: ``"insert"`` (source-only rows append) or
      ``"ignore"``.
    - ``delete_condition``: optional predicate over SOURCE columns;
      matched rows satisfying it are deleted instead of updated.
    - target-only rows always survive.

    Both frames must have identical column sets (align with select/
    rename first); returns the new snapshot with target's column order.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"merge_into: column sets differ — target has "
            f"{sorted(set(target.columns) - set(source.columns))} extra, "
            f"source has {sorted(set(source.columns) - set(target.columns))}")
    for k in keys:
        if k not in target.columns:
            raise ValueError(f"merge_into: key {k!r} not in columns")
    if when_matched not in ("update", "keep"):
        raise ValueError(f"merge_into: when_matched must be update|keep, "
                         f"got {when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(f"merge_into: when_not_matched must be "
                         f"insert|ignore, got {when_not_matched!r}")

    vals = [c for c in target.columns if c not in keys]
    t = target.sdf.withColumn("_t_present", F.lit(True))
    s = source.sdf
    present = F.lit(True)
    if validate_source_unique:
        from pyspark.sql.window import Window as _W
        kc = F.count(F.lit(1)).over(_W.partitionBy(*keys))
        s = s.withColumn("_kc", kc)
        # fold the assertion into the PRESENCE flag the join logic
        # reads — a free-standing asserted column would be pruned by
        # Catalyst and never evaluated (assert_true yields NULL on
        # success, so the when() collapses to lit(True))
        chk = F.assert_true(
            F.col("_kc") == 1,
            F.concat(F.lit("merge_into: duplicate source key "),
                     F.concat_ws("|", *[F.col(k).cast("string")
                                        for k in keys])))
        present = F.when(chk.isNull(), F.lit(True))
    if delete_condition is not None:
        s = s.withColumn("_s_del", delete_condition)
    else:
        s = s.withColumn("_s_del", F.lit(False))
    s = (s.select(*[F.col(k) for k in keys],
                  *[F.col(c).alias(f"_s_{c}") for c in vals], "_s_del",
                  present.alias("_s_present")))

    j = t.join(s, on=keys, how="full_outer")
    matched = F.col("_t_present").isNotNull() & F.col("_s_present").isNotNull()
    t_only = F.col("_s_present").isNull()
    s_only = F.col("_t_present").isNull()

    keep = t_only | (matched & ~F.col("_s_del"))
    if when_not_matched == "insert":
        keep = keep | s_only
    out = j.filter(keep)

    cols = []
    for c in target.columns:
        if c in keys:
            cols.append(F.col(c))
            continue
        sv, tv = F.col(f"_s_{c}"), F.col(c)
        if when_matched == "update":
            # matched rows and inserts take the source value;
            # target-only rows keep the target value
            expr = F.when(t_only, tv).otherwise(sv)
        else:
            # target wins wherever it exists; only inserts use source
            expr = F.when(s_only, sv).otherwise(tv)
        cols.append(expr.alias(c))
    return Frame(out.select(*cols))
