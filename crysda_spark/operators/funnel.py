"""Event-analytics operators: ordered funnels and retention cohorts.

The product-analytics surface (Amplitude/Mixpanel-shaped) expressed
relationally:

- ``funnel``: how many users completed step1 → step2 → … IN ORDER,
  each step within ``within_seconds`` of the previous completion.
  Step k's timestamp is the EARLIEST qualifying event after step k−1
  (the standard greedy funnel semantics — earliest-completion chains
  maximize conversion counts for fixed windows). One aggregate per
  step over the per-user event set: step counts are small constants,
  so the plan is k sequential joins of (user, t_{k-1}) back onto the
  user's events — each a key-partitioned aggregate, never a window
  over raw history.
- ``retention_cohorts``: users cohorted by FIRST-seen bucket; the
  matrix counts distinct users active at each bucket offset from
  their cohort. Two aggregates (first-seen, distinct activity) and a
  join — the corpus is never crossed with a calendar.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["funnel", "retention_cohorts", "funnel_advance"]


def funnel(f: Frame, steps: list[str], user_col: str = "user_id",
           ts_col: str = "ts", event_col: str = "event_type",
           within_seconds: float | None = None) -> Frame:
    """Per-step completion counts: (step, event, n_users, conversion)
    — conversion is vs the FIRST step's cohort. Greedy semantics:
    each step binds to the earliest event strictly AFTER the previous
    step's time (and within ``within_seconds`` of it, when set)."""
    if len(steps) < 1:
        raise ValueError("funnel: need at least one step")
    ev = f.sdf.select(F.col(user_col).alias("_u"),
                      F.col(ts_col).cast("timestamp").alias("_ts"),
                      F.col(event_col).alias("_e"))
    # step 1: earliest occurrence per user
    cur = (ev.filter(F.col("_e") == steps[0])
           .groupBy("_u").agg(F.min("_ts").alias("_t")))
    step_counts = [cur.agg(F.count(F.lit(1)).alias("_n"))]
    for step in steps[1:]:
        nxt = (ev.filter(F.col("_e") == step)
               .join(cur, on="_u")
               .filter(F.col("_ts") > F.col("_t")))
        if within_seconds is not None:
            nxt = nxt.filter(
                F.col("_ts").cast("double") - F.col("_t").cast("double")
                <= within_seconds)
        cur = nxt.groupBy("_u").agg(F.min("_ts").alias("_t"))
        step_counts.append(cur.agg(F.count(F.lit(1)).alias("_n")))
    # fully LAZY: each step count is a 1-row aggregate; the base
    # cohort's count broadcast-cross-joins in for the conversion ratio
    base = step_counts[0].select(F.col("_n").alias("_base"))
    parts = []
    for i, (step, cnt) in enumerate(zip(steps, step_counts)):
        parts.append(cnt.crossJoin(F.broadcast(base)).select(
            F.lit(i + 1).alias("step"), F.lit(step).alias("event"),
            F.col("_n").alias("n_users"),
            F.when(F.col("_base") > 0,
                   F.round(F.col("_n") / F.col("_base"), 6))
             .otherwise(0.0).alias("conversion")))
    out = parts[0]
    for prt in parts[1:]:
        out = out.unionByName(prt)
    return Frame(out)


def retention_cohorts(f: Frame, user_col: str = "user_id",
                      ts_col: str = "ts", grain: str = "week",
                      max_offset: int | None = None) -> Frame:
    """Cohort retention matrix: (cohort, offset, n_active, retention).
    cohort = the user's first-seen ``grain`` bucket; offset counts
    grain periods since the cohort bucket; retention is vs the
    cohort's size (offset 0 row = the cohort itself, retention 1.0).
    """
    if grain not in ("day", "week", "month"):
        raise ValueError(f"retention_cohorts: grain must be day|week|month, "
                         f"got {grain!r}")
    act = (f.sdf.select(F.col(user_col).alias("_u"),
                        F.date_trunc(grain, F.col(ts_col)).alias("_b"))
           .distinct())
    first = act.groupBy("_u").agg(F.min("_b").alias("_cohort"))
    if grain == "month":
        offset = (F.months_between(F.col("_b"), F.col("_cohort"))
                  .cast("int"))
    else:
        days = {"day": 1, "week": 7}[grain]
        offset = (F.datediff(F.col("_b"), F.col("_cohort")) / days).cast("int")
    j = (act.join(first, on="_u")
         .select("_u", F.col("_cohort").alias("cohort"),
                 offset.alias("offset")))
    if max_offset is not None:
        j = j.filter(F.col("offset") <= max_offset)
    sizes = (j.filter(F.col("offset") == 0)
             .groupBy("cohort").agg(F.count(F.lit(1)).alias("_size")))
    out = (j.groupBy("cohort", "offset")
           .agg(F.count_distinct("_u").alias("n_active"))
           .join(sizes, on="cohort")
           .select("cohort", "offset", "n_active",
                   F.round(F.col("n_active") / F.col("_size"), 6)
                    .alias("retention")))
    return Frame(out)


def funnel_advance(step_idx: int, last_t, event, ts, steps,
                   within_seconds=None):
    """THE greedy funnel transition, stated once for batch and stream
    (the ``trailing_score`` pattern): a user at ``(step_idx, last_t)``
    advances iff ``event`` is the NEXT step and — past step one —
    strictly after ``last_t`` and within the window. Processing a
    user's events in time order through this rule reproduces the
    batch operator's earliest-completion chains exactly (step one
    binds to the first occurrence; each later step to the earliest
    qualifying event). Returns the new ``(step_idx, last_t)``."""
    if step_idx >= len(steps) or event != steps[step_idx]:
        return step_idx, last_t
    if step_idx > 0:
        if not ts > last_t:
            return step_idx, last_t
        if within_seconds is not None and ts - last_t > within_seconds:
            return step_idx, last_t
    return step_idx + 1, ts
