"""Distribution-drift checks (pipeline/drift.py) vs plain-Python
reference implementations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


def _ref_psi_ks(base, cur, lo, hi, nbins, eps=1e-6):
    def binned(vals):
        n = [0] * nbins
        w = (hi - lo) / nbins
        for v in vals:
            b = min(max(int((v - lo) // w), 0), nbins - 1)
            n[b] += 1
        return n
    nb, nc = binned(base), binned(cur)
    tb, tc = sum(nb), sum(nc)
    psi = 0.0
    ks = 0.0
    cb = cc = 0
    for i in range(nbins):
        p = max(nb[i] / tb, eps)
        q = max(nc[i] / tc, eps)
        psi += round((q - p) * math.log(q / p), 6)
        cb += nb[i]
        cc += nc[i]
        ks = max(ks, abs(round(cb / tb, 6) - round(cc / tc, 6)))
    return round(psi, 6), ks


def test_psi_zero_on_identical_snapshots(spark):
    from crysda_spark.pipeline.drift import psi
    vals = [i % 10 for i in range(200)]
    row = psi(_df(spark, vals), _df(spark, vals), "x", 0.0, 10.0,
              nbins=10).collect()[0]
    assert row["psi"] == 0.0 and row["ks"] == 0.0
    assert row["n_base"] == row["n_current"] == 200


def test_psi_matches_reference_on_shifted_distribution(spark):
    from crysda_spark.pipeline.drift import psi
    import random
    rnd = random.Random(5)
    base = [rnd.gauss(5.0, 1.5) for _ in range(400)]
    cur = [rnd.gauss(6.0, 1.5) for _ in range(300)]  # mean shift = drift
    row = psi(_df(spark, base), _df(spark, cur), "x", 0.0, 10.0,
              nbins=10).collect()[0]
    want_psi, want_ks = _ref_psi_ks(base, cur, 0.0, 10.0, 10)
    assert row["psi"] == pytest.approx(want_psi, abs=2e-6)
    assert row["ks"] == pytest.approx(want_ks, abs=2e-6)
    assert row["psi"] > 0.25  # a full-σ mean shift is actionable drift


def test_drift_report_dense_bins_and_edge_clamp(spark):
    from crysda_spark.pipeline.drift import drift_report
    base = _df(spark, [0.5, 1.5, 2.5])
    cur = _df(spark, [-99.0, 999.0])  # out-of-range mass → edge bins
    rep = {r["bin"]: r for r in drift_report(
        base, cur, "x", 0.0, 4.0, nbins=4).collect()}
    assert sorted(rep) == [0, 1, 2, 3]          # dense even when empty
    assert rep[0]["n_current"] == 1             # clamped low outlier
    assert rep[3]["n_current"] == 1             # clamped high outlier
    assert rep[3]["n_base"] == 0
    assert rep[3]["cdf_base"] == 1.0 and rep[3]["cdf_current"] == 1.0


def test_bin_counts_excludes_nulls_and_validates(spark):
    from crysda_spark.pipeline.drift import bin_counts
    df = spark.createDataFrame([(1.0,), (None,)], "x double")
    assert bin_counts(df, "x", 0.0, 2.0, 2).agg(
        F.sum("n")).collect()[0][0] == 1
    with pytest.raises(ValueError, match="nbins"):
        bin_counts(df, "x", 0.0, 2.0, 1)
    with pytest.raises(ValueError, match="hi > lo"):
        bin_counts(df, "x", 2.0, 2.0, 4)


def test_drift_plan_is_two_aggregates_no_wide_shuffle(spark):
    """Scale shape: each snapshot reduces map-side to ≤ nbins rows;
    the report plan joins two broadcast histograms — no shuffle ever
    carries data proportional to the snapshots."""
    from crysda_spark.pipeline.drift import drift_report
    from crysda_spark.plans.inspect import _explain_str
    base = spark.range(1000).select((F.col("id") % 7).cast("double").alias("x"))
    cur = spark.range(1000).select((F.col("id") % 5).cast("double").alias("x"))
    txt = _explain_str(drift_report(base, cur, "x", 0.0, 10.0, 10),
                      "formatted")
    assert "SortMergeJoin" not in txt
    assert "BroadcastHashJoin" in txt or "BroadcastNestedLoopJoin" not in txt
