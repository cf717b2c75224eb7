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
- ``event_transitions``: the first-order Markov transition matrix
  over each user's time-ordered event sequence — P(next | current)
  with counts. One LEAD window partitioned by user (the only
  corpus-sized shuffle) and two aggregates over |alphabet|² rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["funnel", "retention_cohorts", "funnel_advance",
           "event_transitions"]


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


def event_transitions(f: Frame, event_col: str = "event_type",
                      user_col: str = "user_id", ts_col: str = "ts",
                      tiebreak_col: str | None = None,
                      include_end: bool = False,
                      end_label: str = "__end__",
                      round_to: int | None = 6) -> Frame:
    """First-order transition matrix over each user's time-ordered
    event sequence: ``(from_event, to_event, n, p)`` where ``n``
    counts adjacent pairs across the whole corpus and ``p`` is the
    row-normalized probability P(to | from), rounded to ``round_to``
    places (``None`` emits the RAW IEEE quotient of the two exact
    counts — one correctly-rounded divide, bit-identical on every
    engine, which is what a cross-engine value oracle should compare;
    ROUND of a near-tie double is engine-implementation-sensitive).

    ``tiebreak_col`` orders simultaneous events deterministically
    (pass the event id — REQUIRED for a value-stable result when
    timestamps can collide). ``include_end`` appends each user's
    terminal event as a transition to ``end_label``, making every
    row's outgoing probabilities sum to 1 over the extended alphabet.

    Scale shape: ONE window shuffle partitioned by user (bounded by
    the user's own history — no skew beyond a hot user), then
    aggregates over at most |alphabet|² + 1 rows. Nothing else
    touches the corpus; at 100 TB this is a single
    shuffle-and-count."""
    from pyspark.sql import Window
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(user_col).orderBy(*order)
    nxt = F.lead(event_col).over(w)
    if include_end:
        nxt = F.coalesce(nxt, F.lit(end_label))
    cols = [user_col, event_col, ts_col]
    if tiebreak_col is not None:
        cols.append(tiebreak_col)
    pairs = (f.sdf.select(*[F.col(c) for c in cols])
             .select(F.col(event_col).alias("from_event"),
                     nxt.alias("to_event"))
             .filter(F.col("to_event").isNotNull()))
    counts = (pairs.groupBy("from_event", "to_event")
              .agg(F.count(F.lit(1)).alias("n")))
    tot = counts.groupBy("from_event").agg(F.sum("n").alias("_tn"))
    p = F.col("n") / F.col("_tn")
    if round_to is not None:
        p = F.round(p, round_to)
    out = (counts.join(tot, on="from_event")
           .select("from_event", "to_event", "n", p.alias("p")))
    return Frame(out)
