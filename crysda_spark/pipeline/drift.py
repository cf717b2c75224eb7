"""Distribution-drift checks between two table snapshots.

The training-data-pipeline question "did this week's corpus move?"
answered as two single-pass aggregates: bin both snapshots on a shared
fixed grid, then compare the normalized histograms —

- PSI (population stability index, the scorecard-monitoring classic):
  Σ (p_i − q_i) · ln(p_i / q_i) with ε-floored bins; < 0.1 stable,
  0.1-0.25 moderate, > 0.25 action.
- KS statistic: max |CDF_p − CDF_q| over the bin grid (the binned
  Kolmogorov-Smirnov distance — exact for the grid resolution, no
  all-pairs sort).

Scale shape: each snapshot reduces to ``nbins`` rows via one
codegen'd width-bucket aggregate (map-side combine, shuffle carries
bin ids); the compare is a broadcast join of two tiny histograms.
Both metrics round to 6 decimals so drift reports hash-compare across
engines (the DuckDB oracle replays the same arithmetic).

Reference: no drift surface exists in /root/reference/src — this is
beyond-parity pipeline tooling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF
from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["bin_counts", "psi", "drift_report",
           "drift_report_from_counts", "streaming_bin_counts"]

_EPS = 1e-6


def _bucket(col: Column, lo: float, hi: float, nbins: int) -> Column:
    """Fixed-grid bin id in [0, nbins): values clamp into the edge
    bins (out-of-range mass must be VISIBLE in the edge bins, not
    silently dropped — new outliers ARE drift)."""
    w = (hi - lo) / nbins
    raw = F.floor((col.cast("double") - F.lit(lo)) / F.lit(w)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1))


def bin_counts(sdf: SparkDF, col: str, lo: float, hi: float,
               nbins: int) -> SparkDF:
    """(bin, n) over the fixed [lo, hi) grid — one aggregate pass;
    nulls are excluded (count them with a not_null check, not a bin)."""
    if nbins < 2:
        raise ValueError(f"bin_counts: nbins must be ≥ 2, got {nbins}")
    if not hi > lo:
        raise ValueError(f"bin_counts: need hi > lo, got [{lo}, {hi})")
    c = F.col(col)
    return (sdf.filter(c.isNotNull())
            .groupBy(_bucket(c, lo, hi, nbins).alias("bin"))
            .agg(F.count(F.lit(1)).alias("n")))


def psi(base: SparkDF, current: SparkDF, col: str, lo: float, hi: float,
        nbins: int = 10) -> SparkDF:
    """One-row (psi, ks, n_base, n_current) drift summary of ``col``
    between two snapshots. ε-floors empty bins (the standard PSI
    guard: ln(p/0) would explode on any newly-populated bin)."""
    rep = drift_report(base, current, col, lo, hi, nbins)
    return (rep.agg(
        F.round(F.sum("psi_term"), 6).alias("psi"),
        F.round(F.max(F.abs(F.col("cdf_base") - F.col("cdf_current"))),
                6).alias("ks"),
        F.sum("n_base").alias("n_base"),
        F.sum("n_current").alias("n_current")))


def drift_report(base: SparkDF, current: SparkDF, col: str, lo: float,
                 hi: float, nbins: int = 10) -> SparkDF:
    """Per-bin drift detail: (bin, n_base, n_current, p_base,
    p_current, psi_term, cdf_base, cdf_current), bins dense 0..nbins-1
    so the report always has ``nbins`` rows. The full-outer join of
    the two tiny histograms happens against a literal bin spine —
    every shuffle in the plan carries at most ``nbins`` rows."""
    return drift_report_from_counts(
        bin_counts(base, col, lo, hi, nbins),
        bin_counts(current, col, lo, hi, nbins), nbins)


def drift_report_from_counts(base_counts: SparkDF,
                             current_counts: SparkDF,
                             nbins: int) -> SparkDF:
    """``drift_report`` from PRE-BINNED (bin, n) frames — the entry
    point for histograms that already exist: a completed
    ``streaming_bin_counts`` window, a stored rollup, yesterday's
    baseline table. Same output contract as ``drift_report``."""
    from pyspark.sql.window import Window as W

    spark = base_counts.sparkSession
    spine = spark.range(nbins).select(F.col("id").alias("bin"))
    b = base_counts.select("bin", F.col("n").alias("n_base"))
    c = current_counts.select("bin", F.col("n").alias("n_current"))
    j = (spine.join(F.broadcast(b), on="bin", how="left")
         .join(F.broadcast(c), on="bin", how="left")
         .select("bin",
                 F.coalesce("n_base", F.lit(0)).alias("n_base"),
                 F.coalesce("n_current", F.lit(0)).alias("n_current")))
    tb = F.sum("n_base").over(W.partitionBy())
    tc = F.sum("n_current").over(W.partitionBy())
    p = F.greatest(F.col("n_base") / tb, F.lit(_EPS))
    q = F.greatest(F.col("n_current") / tc, F.lit(_EPS))
    ordered = W.partitionBy().orderBy("bin") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    # CDFs from the RAW proportions (exact integer cumsums / total) —
    # the ε floor is a PSI-only guard and would skew the KS distance
    return (j.withColumn("p_base", F.round(p, 6))
            .withColumn("p_current", F.round(q, 6))
            .withColumn("psi_term", F.round((q - p) * F.log(q / p), 6))
            .withColumn("cdf_base",
                        F.round(F.sum("n_base").over(ordered) / tb, 6))
            .withColumn("cdf_current",
                        F.round(F.sum("n_current").over(ordered) / tc, 6)))


def streaming_bin_counts(stream, col: str, lo: float, hi: float,
                         nbins: int, width: str = "1 hour",
                         ts_col: str = "ts",
                         watermark: str | None = "30 minutes"):
    """Streaming companion of ``bin_counts``: per tumbling window, the
    fixed-grid histogram of ``col`` — the live side of a drift
    monitor. Shares ``_bucket`` (the SAME binning expression as the
    batch/baseline side), so ``psi``-style compares between a window's
    counts and a baseline snapshot are apples-to-apples. Pure built-in
    aggregation (watermark + window + groupBy) — no Python state.

    Returns (window_start, bin, n); feed a completed window into
    ``drift_report_from_counts`` against the baseline's counts."""
    from pyspark.sql import functions as F
    if nbins < 2:
        raise ValueError(f"streaming_bin_counts: nbins must be ≥ 2, "
                         f"got {nbins}")
    if not hi > lo:
        raise ValueError(f"streaming_bin_counts: need hi > lo, "
                         f"got [{lo}, {hi})")
    s = stream
    if watermark:
        s = s.withWatermark(ts_col, watermark)
    return (s.filter(F.col(col).isNotNull())
            .groupBy(F.window(ts_col, width).alias("_w"),
                     _bucket(F.col(col), lo, hi, nbins).alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("_w.start").alias("window_start"), "bin", "n"))
