"""Reshape tests — modeled on the reference's spec/reshape_spec.cr."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import from_records


@pytest.fixture(scope="module")
def climate(spark):
    return from_records(spark, [
        {"city": "berlin", "year": 2020, "temp": 10.3},
        {"city": "berlin", "year": 2021, "temp": 10.9},
        {"city": "oslo", "year": 2020, "temp": 5.1},
        {"city": "oslo", "year": 2021, "temp": 5.7},
    ], order=["city", "year", "temp"])


def test_spread_gather_roundtrip(climate):
    wide = climate.spread("year", "temp")
    assert set(wide.columns) == {"city", "2020", "2021"}
    assert wide.num_row == 2
    long = wide.gather("year", "temp", columns=["2020", "2021"], convert=True)
    assert long.num_row == 4
    assert dict(long.sdf.dtypes)["year"] == "bigint"  # convert re-infers


def test_spread_fill(spark):
    sparse = from_records(spark, [
        {"k": "a", "year": 2020, "v": 1.0},
        {"k": "b", "year": 2021, "v": 2.0},
    ], order=["k", "year", "v"])
    wide = sparse.spread("year", "v", fill=0.0)
    h = {r["k"]: (r["2020"], r["2021"]) for r in wide.collect()}
    assert h["a"] == (1.0, 0.0) and h["b"] == (0.0, 2.0)


def test_gather_mixed_types_unify(spark):
    mixed = from_records(spark, [
        {"id": 1, "a": 1, "b": 2.5},
    ], order=["id", "a", "b"])
    long = mixed.gather("key", "value", columns=["a", "b"])
    assert dict(long.sdf.dtypes)["value"] == "double"
    assert long.num_row == 2


def test_unite_separate_roundtrip(spark):
    df = from_records(spark, [
        {"first": "max", "last": "smith"},
        {"first": "eva", "last": None},
    ], order=["first", "last"])
    united = df.unite("full", ["first", "last"], sep="_")
    assert united.columns == ["full"]
    vals = sorted(united.to_h()["full"])
    assert vals == ["eva_NA", "max_smith"]

    back = united.separate("full", ["first", "last"], sep="_")
    h = {r["first"]: r["last"] for r in back.collect()}
    assert h["eva"] is None and h["max"] == "smith"


def test_separate_convert(spark):
    df = from_records(spark, [{"pair": "1_2.5"}, {"pair": "3_4.5"}], order=["pair"])
    out = df.separate("pair", ["a", "b"], sep="_", convert=True)
    types = dict(out.sdf.dtypes)
    assert types["a"] == "bigint" and types["b"] == "double"


def test_nest_unnest_roundtrip(climate):
    nested = climate.group_by("city").nest()
    assert set(nested.columns) == {"city", "data"}
    assert nested.num_row == 2
    flat = nested.unnest("data")
    assert set(flat.columns) == {"city", "year", "temp"}
    assert flat.num_row == 4


def test_unnest_array_column(spark):
    df = from_records(spark, [{"id": 1, "xs": [1, 2, 3]}, {"id": 2, "xs": None}],
                      order=["id", "xs"])
    out = df.unnest("xs")
    assert out.num_row == 4  # null entry -> one null row


def test_expand_complete(climate):
    missing = climate.filter(~((F.col("city") == "oslo") & (F.col("year") == 2021)))
    exp = missing.expand("city", "year")
    assert exp.num_row == 4
    comp = missing.complete("city", "year")
    assert comp.num_row == 4
    h = {(r["city"], r["year"]): r["temp"] for r in comp.collect()}
    assert h[("oslo", 2021)] is None


def test_window_vector_fns(climate):
    g = climate.group_by("city")
    out = g.add_column("prev", lambda e: e.lag("temp", order_by=["year"]))
    h = {(r["city"], r["year"]): r["prev"] for r in out.collect()}
    assert h[("berlin", 2020)] is None
    assert h[("berlin", 2021)] == 10.3

    pct = g.add_column("pc", lambda e: e.pct_change("temp", order_by=["year"]))
    h2 = {(r["city"], r["year"]): r["pc"] for r in pct.collect()}
    assert abs(h2[("oslo", 2021)] - (5.7 / 5.1 - 1)) < 1e-9


def test_cumsum_na_poison(spark):
    df = from_records(spark, [
        {"i": 1, "x": 1.0}, {"i": 2, "x": 2.0}, {"i": 3, "x": None}, {"i": 4, "x": 4.0},
    ], order=["i", "x"])
    out = df.add_column("cs", lambda e: e.cumsum("x", order_by=["i"]))
    vals = {r["i"]: r["cs"] for r in out.collect()}
    assert vals[1] == 1.0 and vals[2] == 3.0
    assert vals[3] is None and vals[4] is None  # poisoned after first NA


def test_rank_ties_by_position(spark):
    df = from_records(spark, [
        {"i": 1, "x": 5.0}, {"i": 2, "x": 1.0}, {"i": 3, "x": 5.0}, {"i": 4, "x": None},
    ], order=["i", "x"])
    out = df._with_ord().add_column("r", lambda e: e.rank("x"))
    vals = {r["i"]: r["r"] for r in out.collect()}
    assert vals[2] == 0
    assert vals[4] == 3  # NA last
    assert {vals[1], vals[3]} == {1, 2}  # ties broken by position
