"""Temporal joins (beyond-reference; the reference has no as-of/range
join — SURVEY §2.7 notes them absent). Spark lacks them as primitives
too, so these are compositions of built-in ops chosen for scale.

- asof_join: union + partitioned-window merge — ONE shuffle on the key,
  no join blow-up, no per-key materialization. The classic alternative
  (join on key then filter+argmax over right rows per left row)
  multiplies rows by the per-key right count before collapsing;
  the union-merge never inflates.
- range_join: equi-join on overlapping fixed-width bins + exact filter,
  so Spark executes a shuffle-hash/SMJ join on (keys, bin) instead of a
  broadcast-nested-loop over an inequality predicate. Bin width trades
  replication (intervals spanning many bins) against bucket selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF, Window as W
from pyspark.sql import functions as F

from ..frame import Frame


def asof_join(left: Frame, right: Frame, on: str = "ts",
              by: list[str] | str | None = None,
              value_cols: list[str] | None = None,
              direction: str = "backward",
              suffix: str = "_right") -> Frame:
    """For each left row, attach the most recent right row at-or-before
    its ``on`` time (direction="backward"; "forward" = earliest
    at-or-after; "nearest" = whichever of the two is closer in time,
    backward winning ties), matching within ``by`` keys.

    Implementation: tag both sides, union, and run
    ``last(value, ignorenulls)`` over a window partitioned by ``by``
    and ordered by (time, side) — right rows sort before left rows at
    equal timestamps, so ties match (SQL ASOF >= semantics). Output has
    all left columns plus ``value_cols`` suffixed, plus
    ``{on}{suffix}`` (the matched right timestamp, null if no match).
    "nearest" runs both passes over the SAME union (still one shuffle
    on the keys — the second window reuses the partitioning) and picks
    per row by absolute time distance.
    """
    if direction == "nearest":
        return _asof_nearest(left, right, on, by, value_cols, suffix)
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward|nearest")
    keys = [by] if isinstance(by, str) else list(by or [])
    l_sdf, r_sdf = left.sdf, right.sdf
    value_cols = value_cols or [c for c in r_sdf.columns
                                if c not in keys and c != on]

    l_tag = l_sdf.select(
        *[F.col(c) for c in l_sdf.columns],
        F.lit(1).alias("__side__"),
        *[F.lit(None).cast(r_sdf.schema[c].dataType).alias(f"{c}{suffix}")
          for c in value_cols],
        F.lit(None).cast(r_sdf.schema[on].dataType).alias(f"{on}{suffix}"))
    r_tag = r_sdf.select(
        *[F.col(k) for k in keys],
        F.col(on),
        *[F.lit(None).cast(l_sdf.schema[c].dataType).alias(c)
          for c in l_sdf.columns if c not in keys and c != on],
        F.lit(0).alias("__side__"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(on).alias(f"{on}{suffix}"))

    both = l_tag.unionByName(r_tag)
    t = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (W.partitionBy(*keys) if keys else W.partitionBy()) \
        .orderBy(t, F.col("__side__").asc()) \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    filled = both.select(
        *[c for c in both.columns if not c.endswith(suffix)],
        *[F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
          for c in value_cols + [on]])
    out = (filled.filter(F.col("__side__") == 1)
           .drop("__side__"))
    return Frame(out)


def _asof_nearest(left: Frame, right: Frame, on: str, by,
                  value_cols, suffix: str) -> Frame:
    """nearest = backward fill AND forward fill over one union, then a
    per-row pick by |Δt| (backward wins ties). Two window passes but
    the second reuses the first's hash partitioning — still one
    shuffle."""
    keys = [by] if isinstance(by, str) else list(by or [])
    r_sdf = right.sdf
    value_cols = value_cols or [c for c in r_sdf.columns
                                if c not in keys and c != on]
    # unique row id so duplicate left rows can't cross-multiply in the
    # pick join; localCheckpoint freezes the assignment for both
    # direction passes (persist would pin executor storage until an
    # explicit unpersist — checkpoint blocks release on GC)
    l2 = Frame(left.sdf.withColumn("__aid__", F.monotonically_increasing_id())
               .localCheckpoint())
    back = asof_join(l2, right, on, by, value_cols, "backward", "_bk")
    fwd = asof_join(l2, right, on, by, value_cols, "forward", "_fw")
    # backtick everything: value_cols may carry dots (join suffixes .x/.y)
    bt = lambda c: F.col(f"`{c}`")  # noqa: E731
    j = back.sdf.join(
        fwd.sdf.select("__aid__", *[bt(f"{c}_fw") for c in value_cols + [on]]),
        on="__aid__", how="inner")
    d_back = F.abs(bt(on).cast("double") - bt(f"{on}_bk").cast("double"))
    d_fwd = F.abs(bt(f"{on}_fw").cast("double") - bt(on).cast("double"))
    use_back = bt(f"{on}_bk").isNotNull() & \
        (bt(f"{on}_fw").isNull() | (d_back <= d_fwd))
    picked = [F.when(use_back, bt(f"{c}_bk")).otherwise(bt(f"{c}_fw"))
              .alias(f"{c}{suffix}") for c in value_cols + [on]]
    out = j.select(*[bt(c) for c in left.sdf.columns], *picked)
    return Frame(out)


def range_join(left: Frame, right: Frame, left_on: str,
               right_lo: str, right_hi: str,
               by: list[str] | None = None,
               bin_width: float | int | None = None,
               how: str = "inner") -> Frame:
    """Join left rows to right intervals containing them:
    ``right_lo <= left_on <= right_hi`` (plus optional ``by`` equality).

    Without binning Spark plans an inequality join as broadcast-nested-
    loop — O(|L|·|R|) compared pairs. With ``bin_width`` both sides get
    bin ids (intervals explode over the bins they span), the join is an
    equi-join on (by, bin), and only same-bin pairs are tested exactly.
    Pick bin_width ≈ typical interval length: replication stays ~2×
    while each bucket holds only nearby intervals.

    ``how``: inner | left | right | full. Outer variants are computed
    as matched-inner ∪ null-extended unmatched rows (found by an
    anti-join on a per-row id) — the range predicate can never sit as a
    post-join filter, which would silently drop the null-extended rows
    and revert to inner semantics. NOTE: outer modes EAGERLY materialize
    the id-tagged side(s) via localCheckpoint at call time — the only
    way to freeze nondeterministic row ids across the matched and
    anti-join branches. Inner mode (the default and the scale path)
    stays fully lazy."""
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"range_join: how must be inner|left|right|full, got {how!r}")
    keys = list(by or [])
    l_sdf, r_sdf = left.sdf, right.sdf
    need_l, need_r = how in ("left", "full"), how in ("right", "full")
    # the row ids MUST be frozen before both the matched join and the
    # anti-join read them: monotonically_increasing_id is evaluated per
    # plan branch, and post-shuffle row order is not stable across
    # re-evaluations — localCheckpoint materializes the assignment once
    # (and, unlike persist, is released when the DataFrame is GC'd)
    if need_l:
        l_sdf = l_sdf.withColumn("__lid__", F.monotonically_increasing_id()) \
            .localCheckpoint()
    if need_r:
        r_sdf = r_sdf.withColumn("__rid__", F.monotonically_increasing_id()) \
            .localCheckpoint()
    exact = (F.col(right_lo) <= F.col(left_on)) & (F.col(left_on) <= F.col(right_hi))

    if bin_width is None:
        joined = l_sdf.join(r_sdf, on=keys, how="inner") if keys else l_sdf.crossJoin(r_sdf)
        matched = joined.filter(exact)
    else:
        lb = l_sdf.withColumn("__bin__", F.floor(F.col(left_on) / bin_width))
        rb = r_sdf.withColumn(
            "__bin__",
            F.explode(F.sequence(F.floor(F.col(right_lo) / bin_width),
                                 F.floor(F.col(right_hi) / bin_width))))
        # no pair dedup needed: each left row carries exactly ONE bin id,
        # so an (l, r) pair can only meet in that bin even when the
        # interval spans many bins
        matched = (lb.join(rb, on=keys + ["__bin__"], how="inner")
                   .filter(exact).drop("__bin__"))

    out = matched
    if need_l:
        null_r = [F.lit(None).cast(r_sdf.schema[c].dataType).alias(c)
                  for c in r_sdf.columns if c not in keys]
        un_l = (l_sdf.join(matched.select("__lid__").dropDuplicates(),
                           on="__lid__", how="left_anti")
                .select(*[F.col(c) for c in l_sdf.columns], *null_r))
        out = out.unionByName(un_l)
    if need_r:
        null_l = [F.lit(None).cast(l_sdf.schema[c].dataType).alias(c)
                  for c in l_sdf.columns if c not in keys]
        un_r = (r_sdf.join(matched.select("__rid__").dropDuplicates(),
                           on="__rid__", how="left_anti")
                .select(*[F.col(k) for k in keys], *null_l,
                        *[F.col(c) for c in r_sdf.columns if c not in keys]))
        out = out.unionByName(un_r)
    return Frame(out.drop("__lid__", "__rid__"))


def sessionize(f: Frame, ts_col: str, by, gap_seconds: float,
               out_col: str = "session_seq") -> Frame:
    """Batch sessionization (gaps-and-islands): within each ``by`` key,
    rows ordered by ``ts_col`` start a new session whenever the gap to
    the previous row EXCEEDS ``gap_seconds``; each row gets the key-
    scoped session ordinal (1-based) in ``out_col``.

    The batch twin of streaming ``session_window`` aggregation — but
    row-preserving (you keep event granularity and can aggregate
    however you like afterwards). One shuffle (the per-key window).
    Rows tied on ``ts_col`` always land in the same session, so
    per-session aggregates are deterministic even though intra-tie
    ordering is not.
    """
    keys = [by] if isinstance(by, str) else list(by)
    if out_col in f.columns:
        raise ValueError(f"sessionize: column {out_col!r} already exists")
    w = W.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (prev.isNull()
                | (F.col(ts_col).cast("double") - prev.cast("double")
                   > gap_seconds)).cast("long")
    seq = F.sum(new_sess).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return Frame(f.sdf.withColumn(out_col, seq))
