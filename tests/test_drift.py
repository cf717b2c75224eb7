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


def test_streaming_bin_counts_match_batch(spark, tmp_path):
    """The live drift monitor's windowed histograms must equal batch
    bin_counts per window — same _bucket expression, same clamping."""
    from crysda_spark.pipeline.drift import bin_counts, streaming_bin_counts
    d = str(tmp_path / "drift_ev")
    rows = [(f"2024-01-01 {h:02d}:{m:02d}:00", float(v))
            for h in range(2) for m, v in
            enumerate([1.0, 4.5, 9.9, -3.0, 15.0, 7.2])]
    df = spark.createDataFrame(rows, "ts string, x double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(df.schema).parquet(d)
    out = streaming_bin_counts(stream, "x", 0.0, 10.0, 5,
                               width="1 hour", watermark=None)
    q = (out.writeStream.format("memory").queryName("drift_stream")
         .outputMode("complete").start())
    q.processAllAvailable()
    got = {(str(r["window_start"]), r["bin"]): r["n"]
           for r in spark.table("drift_stream").collect()}
    q.stop()
    batch = spark.read.parquet(d)
    want = {}
    for h in ("2024-01-01 00:00:00", "2024-01-01 01:00:00"):
        hour = batch.filter(F.date_trunc("hour", "ts") == h)
        for r in bin_counts(hour, "x", 0.0, 10.0, 5).collect():
            want[(h, r["bin"])] = r["n"]
    assert got == want
    # clamping visible: -3.0 → bin 0, 15.0 → bin 4, each hour
    assert got[("2024-01-01 00:00:00", 0)] >= 2
    assert got[("2024-01-01 00:00:00", 4)] >= 2


def test_streaming_bin_counts_validation(spark, tmp_path):
    from crysda_spark.pipeline.drift import streaming_bin_counts
    df = spark.createDataFrame([("2024-01-01 00:00:00", 1.0)],
                               "ts string, x double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "v")
    df.write.parquet(d)
    s = spark.readStream.schema(df.schema).parquet(d)
    import pytest
    with pytest.raises(ValueError, match="nbins"):
        streaming_bin_counts(s, "x", 0.0, 1.0, 1)
    with pytest.raises(ValueError, match="hi > lo"):
        streaming_bin_counts(s, "x", 1.0, 1.0, 4)


def test_drift_report_from_counts_composes_with_streaming(spark, tmp_path):
    """The advertised composition: a completed streaming window's
    counts vs a baseline's bin_counts through
    drift_report_from_counts — equal to running drift_report on the
    raw slices directly."""
    from crysda_spark.pipeline.drift import (bin_counts, drift_report,
                                             drift_report_from_counts,
                                             streaming_bin_counts)
    d = str(tmp_path / "ev")
    rows = [(f"2024-01-01 {h:02d}:{m:02d}:00", float(v))
            for h in range(2) for m, v in
            enumerate([1.0, 2.5, 6.0, 8.5, 3.0 + h * 4])]
    df = spark.createDataFrame(rows, "ts string, x double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(df.schema).parquet(d)
    out = streaming_bin_counts(stream, "x", 0.0, 10.0, 5,
                               width="1 hour", watermark=None)
    q = (out.writeStream.format("memory").queryName("compose_stream")
         .outputMode("complete").start())
    q.processAllAvailable()
    win = spark.table("compose_stream")
    q.stop()
    hour1_counts = win.filter(
        F.col("window_start") == "2024-01-01 01:00:00").select("bin", "n")
    batch = spark.read.parquet(d)
    base_slice = batch.filter(F.date_trunc("hour", "ts")
                              == "2024-01-01 00:00:00")
    cur_slice = batch.filter(F.date_trunc("hour", "ts")
                             == "2024-01-01 01:00:00")
    via_counts = {r["bin"]: (r["n_base"], r["n_current"], r["psi_term"])
                  for r in drift_report_from_counts(
                      bin_counts(base_slice, "x", 0.0, 10.0, 5),
                      hour1_counts, 5).collect()}
    direct = {r["bin"]: (r["n_base"], r["n_current"], r["psi_term"])
              for r in drift_report(base_slice, cur_slice, "x",
                                    0.0, 10.0, 5).collect()}
    assert via_counts == direct and len(via_counts) == 5
