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

__all__ = ["merge_into", "scd2_apply"]


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


def scd2_apply(dim: Frame, changes: Frame, on,
               batch_ts, valid_from: str = "valid_from",
               valid_to: str = "valid_to",
               current_col: str = "is_current",
               validate_changes_unique: bool = True) -> Frame:
    """Slowly-changing-dimension type 2: apply a change batch to a
    versioned dimension, returning the NEW history snapshot.

    ``dim`` carries key column(s) ``on``, the tracked attributes, and
    the SCD bookkeeping (``valid_from`` timestamp, ``valid_to``
    timestamp NULL-while-open, ``current_col`` boolean). ``changes``
    carries the keys plus the same attributes — the state observed at
    ``batch_ts``. Semantics per key:

    - attribute change (NULL-safe comparison on every tracked column):
      the current version CLOSES (``valid_to`` = batch_ts, flag off)
      and a new open version inserts at ``batch_ts``;
    - no change: history passes through untouched (idempotent replay);
    - unseen key: a first open version inserts;
    - keys absent from the batch, and all already-closed versions:
      untouched. Deletions are modeled upstream as a change to a
      tombstone attribute, keeping this transform append-only.

    One full-outer join of the CURRENT slice against the batch (one
    key shuffle; AQE broadcasts small batches) unioned with the
    untouched history; duplicate change keys fail the job lazily
    unless ``validate_changes_unique=False`` (same guard as
    ``merge_into`` — a duplicate key would fork two open versions).
    """
    keys = [on] if isinstance(on, str) else list(on)
    scd_cols = {valid_from, valid_to, current_col}
    for c in scd_cols:
        if c not in dim.columns:
            raise ValueError(f"scd2_apply: dimension lacks SCD column {c!r}")
        if c in changes.columns:
            raise ValueError(f"scd2_apply: changes must not carry SCD "
                             f"column {c!r}")
    tracked = [c for c in changes.columns if c not in keys]
    want = set(keys) | set(tracked) | scd_cols
    if set(dim.columns) != want:
        raise ValueError(
            f"scd2_apply: dimension columns {sorted(dim.columns)} != keys "
            f"+ tracked + SCD {sorted(want)} (align schemas first)")
    ts = F.lit(batch_ts).cast("timestamp")

    hist = dim.sdf.filter(~F.col(current_col))
    cur = dim.sdf.filter(F.col(current_col)) \
        .withColumn("_t_present", F.lit(True))
    s = changes.sdf
    present = F.lit(True)
    if validate_changes_unique:
        from pyspark.sql.window import Window as _W
        s = s.withColumn("_kc", F.count(F.lit(1)).over(_W.partitionBy(*keys)))
        chk = F.assert_true(
            F.col("_kc") == 1,
            F.concat(F.lit("scd2_apply: duplicate change key "),
                     F.concat_ws("|", *[F.col(k).cast("string")
                                        for k in keys])))
        present = F.when(chk.isNull(), F.lit(True))
    s = s.select(*keys, *[F.col(c).alias(f"_s_{c}") for c in tracked],
                 present.alias("_s_present"))
    j = cur.join(s, on=keys, how="full_outer")
    matched = F.col("_t_present").isNotNull() & F.col("_s_present").isNotNull()
    t_only = F.col("_s_present").isNull()
    s_only = F.col("_t_present").isNull()
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(c).eqNullSafe(F.col(f"_s_{c}"))

    order = [*keys, *tracked, valid_from, valid_to, current_col]

    untouched = j.filter(t_only | (matched & same)).select(
        *keys, *tracked, F.col(valid_from), F.col(valid_to),
        F.col(current_col))
    closed = j.filter(matched & ~same).select(
        *keys, *tracked, F.col(valid_from), ts.alias(valid_to),
        F.lit(False).alias(current_col))
    opened = j.filter(s_only | (matched & ~same)).select(
        *keys, *[F.col(f"_s_{c}").alias(c) for c in tracked],
        ts.alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
        F.lit(True).alias(current_col))
    out = (hist.select(*order)
           .unionByName(untouched)
           .unionByName(closed)
           .unionByName(opened))
    return Frame(out)
