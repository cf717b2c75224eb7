"""Property-based null-edge fuzzing (SURVEY §7 M8): engine semantics
vs plain-Python reference models on randomized small frames. Each
example runs real Spark jobs, so example counts stay small — the value
is the null-placement edge cases hypothesis finds, not volume."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ints_with_nulls = st.lists(st.one_of(st.none(), st.integers(-50, 50)),
                           min_size=1, max_size=12)

SLOW = settings(max_examples=5, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.too_slow])


def _frame(spark, vals, extra=None):
    from crysda_spark import from_records
    rows = [{"i": idx, "x": v, **({"g": extra[idx]} if extra else {})}
            for idx, v in enumerate(vals)]
    return from_records(spark, rows,
                        order=["i", "x"] + (["g"] if extra else []))


@SLOW
@given(vals=ints_with_nulls, threshold=st.integers(-50, 50))
@example(vals=[None], threshold=0)
@example(vals=[-50, None, 50], threshold=-50)
def test_filter_null_is_false(spark, vals, threshold):
    f = _frame(spark, vals)
    got = sorted(f.filter(F.col("x") > threshold).to_h()["i"])
    want = sorted(i for i, v in enumerate(vals)
                  if v is not None and v > threshold)
    assert got == want


@SLOW
@given(vals=ints_with_nulls)
@example(vals=[None, 0, None, -1])
def test_sort_nulls_last(spark, vals):
    f = _frame(spark, vals)
    got = f.sort_by("x").to_h()["x"]
    nn = sorted(v for v in vals if v is not None)
    assert got == nn + [None] * (len(vals) - len(nn))


@SLOW
@given(vals=ints_with_nulls)
@example(vals=[None, 1, 2])
@example(vals=[1, None, 2, None])
def test_cumsum_poisons_after_first_null(spark, vals):
    f = _frame(spark, vals)
    got = f.add_column("c", lambda e: e.cumsum("x", order_by=["i"])) \
        .sort_by("i").to_h()["c"]
    run, want, poisoned = 0, [], False
    for v in vals:
        poisoned = poisoned or v is None
        if poisoned:
            want.append(None)
        else:
            run += v
            want.append(run)
    assert got == want


@SLOW
@given(vals=ints_with_nulls)
@example(vals=[None, None, 1])
def test_distinct_counts_null_as_value(spark, vals):
    f = _frame(spark, vals)
    assert f.select("x").distinct().num_row == len(set(vals))


@SLOW
@given(left=ints_with_nulls, right=ints_with_nulls)
@example(left=[None, 1, 1], right=[1, 1, None])
@example(left=[None], right=[None])
def test_inner_join_multiplicity(spark, left, right):
    """Join cardinality = sum over keys of count_l*count_r; null keys
    never match (SQL semantics both engines)."""
    from crysda_spark import from_records
    lf = from_records(spark, [{"k": v, "l": i} for i, v in enumerate(left)],
                      order=["k", "l"])
    rf = from_records(spark, [{"k": v, "r": i} for i, v in enumerate(right)],
                      order=["k", "r"])
    lc = Counter(v for v in left if v is not None)
    rc = Counter(v for v in right if v is not None)
    want = sum(lc[k] * rc.get(k, 0) for k in lc)
    assert lf.inner_join(rf, by="k").num_row == want


@SLOW
@given(sizes=st.lists(st.integers(0, 300), min_size=1, max_size=20),
       budget=st.integers(50, 400))
@example(sizes=[300, 0, 300], budget=50)   # oversized singletons + zero-size
@example(sizes=[50, 50, 50], budget=50)     # exact-fit boundary
def test_pack_sequences_budget_property(spark, sizes, budget):
    """Every bin holds <= budget unless it contains a single oversized
    doc; every doc lands in exactly one bin."""
    from crysda_spark import from_records
    from crysda_spark.pipeline import packing as pk
    f = from_records(spark, [{"id": i, "sz": s} for i, s in enumerate(sizes)],
                     order=["id", "sz"])
    rows = pk.pack_sequences(f, "id", "sz", budget=budget).sdf.collect()
    assert sorted(r["id"] for r in rows) == list(range(len(sizes)))
    per_bin = Counter()
    mx = {}
    for r in rows:
        per_bin[r["bin_id"]] += r["size"]
        mx[r["bin_id"]] = max(mx.get(r["bin_id"], 0), r["size"])
    for b, tot in per_bin.items():
        assert tot <= budget or mx[b] > budget


@SLOW
@given(radius=st.integers(0, 12), flips=st.integers(0, 12))
@example(radius=0, flips=0)
@example(radius=3, flips=4)   # just past the radius
@example(radius=12, flips=12)
def test_simhash_pairs_pigeonhole_property(spark, radius, flips):
    """A planted pair at hamming distance `flips` is recovered IFF
    flips <= radius — the Manku multi-block guarantee at any radius,
    any bit placement (adversarial: bits spread evenly)."""
    import random
    rnd = random.Random(radius * 31 + flips)
    base = rnd.getrandbits(62)
    flip_bits = rnd.sample(range(64), flips)
    flipped = base
    for b in flip_bits:
        flipped ^= (1 << b)
    flipped &= (1 << 63) - 1
    from crysda_spark.pipeline import dedup as dd
    sig = spark.createDataFrame([{"id": 1, "sh": base}, {"id": 2, "sh": flipped}])
    got = {(r.id_a, r.id_b) for r in dd.simhash_pairs(sig, "id", radius).collect()}
    # actual hamming can differ from `flips` only via the 63-bit mask
    actual = bin(base ^ flipped).count("1")
    assert ((1, 2) in got) == (actual <= radius)


@SLOW
@given(vals=st.lists(st.one_of(st.none(), st.floats(-1e6, 1e6,
                                                    allow_nan=False)),
                     min_size=1, max_size=12))
@example(vals=[None])
@example(vals=[0.0, None])
def test_mean_strict_vs_skip(spark, vals):
    from crysda_spark.functions import aggregates as agg
    f = _frame(spark, vals)
    has_null = any(v is None for v in vals)
    nn = [v for v in vals if v is not None]
    if nn:
        got = f.summarize(m=agg.mean("x", remove_na=True)).to_h()["m"][0]
        assert got == pytest.approx(sum(nn) / len(nn))
    if has_null:
        with pytest.raises(Exception):
            f.summarize(m=agg.mean("x")).sdf.collect()


# ------------------------------------------------- sketch-family fuzzing
@given(vals=st.lists(st.floats(min_value=0.0, max_value=100.0,
                               allow_nan=False), min_size=1, max_size=40),
       q=st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]),
       nbins=st.sampled_from([4, 10, 25]))
@SLOW
@example(vals=[0.0, 100.0], q=1.0, nbins=4)   # range-edge bins
@example(vals=[25.0] * 5, q=0.0, nbins=4)     # single-value pile
@example(vals=[49.0, 98.0], q=0.5, nbins=25)  # wide gap, narrow bins
def test_hist_quantile_within_bin_width_fuzz(spark, vals, q, nbins):
    """hist_quantile must stay within one bin width of the EMPIRICAL-CDF
    inverse (numpy method='inverted_cdf') for ANY data/bins/q: the found
    bin contains that order statistic, so both values share a bin. (The
    bound does NOT hold vs numpy's default order-statistic interpolation
    on tiny samples — two points 49 apart interpolate across the gap,
    which no histogram can track.)"""
    import numpy as np
    from crysda_spark import Frame
    from crysda_spark.operators.rollup import hist_quantile, time_rollup
    f = Frame(spark.createDataFrame(
        [("2024-01-01 00:00:00", float(v)) for v in vals],
        "ts string, v double").withColumn("ts", F.col("ts").cast("timestamp")))
    daily = time_rollup(f, "ts", "day", h=("hist", "v", 0.0, 100.0, nbins))
    got = daily.sdf.select(
        hist_quantile("h", q, 0.0, 100.0, nbins).alias("p")).collect()[0]["p"]
    exact = float(np.quantile(np.array(vals), q, method="inverted_cdf"))
    width = 100.0 / nbins
    assert abs(got - exact) <= width + 1e-9, (got, exact, width)


@given(vals=st.lists(st.floats(min_value=-1000.0, max_value=1000.0,
                               allow_nan=False), min_size=2, max_size=40))
# r7's falsifying example: 0.0625² = 0.00390625 needs 8 dp; the old
# decimal(28,8)² state collapsed to decimal(38,6) and stored 0.003906.
@example(vals=[0.0, 0.0625])
@example(vals=[0.0001, 0.0625, -999.9999])  # 4-dp boundary magnitudes
@SLOW
def test_moments_match_numpy_fuzz(spark, vals):
    import numpy as np
    from crysda_spark import Frame
    from crysda_spark.operators.rollup import (moments_mean, moments_stddev,
                                               time_rollup)
    # decimal(28,8) state: quantize inputs to 4 decimals so the exact-sum
    # contract is about ACCUMULATION, not input rounding
    vals = [round(v, 4) for v in vals]
    f = Frame(spark.createDataFrame(
        [("2024-01-01 00:00:00", float(v)) for v in vals],
        "ts string, v double").withColumn("ts", F.col("ts").cast("timestamp")))
    daily = time_rollup(f, "ts", "day", m=("moments", "v"))
    got = daily.sdf.select(moments_mean("m").alias("mu"),
                           moments_stddev("m").alias("sd")).collect()[0]
    a = np.array(vals)
    assert got["mu"] == pytest.approx(a.mean(), rel=1e-9, abs=1e-9)
    assert got["sd"] == pytest.approx(a.std(ddof=1), rel=1e-7, abs=1e-9)
