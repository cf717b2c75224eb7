"""Column helpers: matching, concatenate, order/rank, casts,
convert_type, map_values; grouped-map transform_groups / groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark.functions import columns as C


def test_matching_na_is_false(sleep_df):
    out = sleep_df.filter(C.matching("vore", lambda c: c.startswith("ins")))
    assert out.num_row == 2  # the two bats; NA vore row excluded


def test_matching_missing_as_true(sleep_df):
    out = sleep_df.filter(C.matching("vore", lambda c: c.startswith("ins"),
                                     missing_as=True))
    assert out.num_row == 3  # + Vesper mouse (NA vore)


def test_concatenate_renders_na(sleep_df):
    got = sleep_df.add_column("cat", C.concatenate("name", "sleep_rem")) \
        .filter(F.col("name") == "Cheetah").to_h()["cat"]
    assert got == ["Cheetah NA"]


def test_order_argsort(sleep_df):
    f = sleep_df.select("sleep_total").add_column("ord", C.order("sleep_total"))
    h = f.sort_by("ord").to_h()
    assert h["sleep_total"] == sorted(h["sleep_total"])
    assert h["ord"] == list(range(12))


def test_rank_no_tie_sharing(spark):
    from crysda_spark import from_records
    f = from_records(spark, [{"x": 5}, {"x": 5}, {"x": 1}])
    ranks = sorted(f.add_column("r", C.rank_position("x")).to_h()["r"])
    assert ranks == [0, 1, 2]  # ties broken by position, not SQL RANK


def test_as_int_strict_raises(spark):
    from crysda_spark import from_records
    f = from_records(spark, [{"s": "12"}, {"s": "x"}])
    with pytest.raises(Exception):
        f.add_column("i", C.as_int("s")).sdf.collect()
    ok = from_records(spark, [{"s": "12"}, {"s": None}])
    assert ok.add_column("i", C.as_int("s")).to_h()["i"] == [12, None]


def test_as_int_lenient(spark):
    from crysda_spark import from_records
    f = from_records(spark, [{"s": "12"}, {"s": "x"}])
    assert sorted(f.add_column("i", C.as_int("s", strict=False)).to_h()["i"],
                  key=lambda v: (v is None, v)) == [12, None]


def test_as_bool_vocab(spark):
    from crysda_spark import from_records
    f = from_records(spark, [{"s": "T"}, {"s": "FALSE"}, {"s": "yes"}])
    assert f.add_column("b", C.as_bool("s")).to_h()["b"] == [True, False, None]


def test_convert_type_cascade(spark):
    from crysda_spark import from_records
    f = from_records(spark, [{"s": "1,234"}, {"s": "2.5"}, {"s": "T"}, {"s": "word"}])
    got = f.add_column("t", C.convert_type("s")).to_h()["t"]
    assert got == ["1234", "2.5", "true", "word"]


def test_map_values_pandas_udf(sleep_df):
    out = sleep_df.add_column("u", C.map_values("vore", str.upper))
    h = out.filter(F.col("name").isin("Cheetah", "Vesper mouse")).to_h()
    assert set(h["u"]) == {"CARNI", None}  # nulls skipped, not passed to fn


def test_transform_groups_applyinpandas(sleep_df):
    def top1(pdf):
        return pdf.nlargest(1, "sleep_total")

    out = sleep_df.group_by("vore").transform_groups(top1)
    h = out.ungroup().sort_by("vore").to_h()
    assert h["name"] == ["Vesper mouse", "Cheetah", "Mountain beaver",
                         "Little brown bat", "Owl monkey"] or len(h["name"]) == 5


def test_transform_groups_requires_groups(sleep_df):
    with pytest.raises(ValueError):
        sleep_df.transform_groups(lambda p: p)


def test_groups_accessor(sleep_df):
    gs = sleep_df.group_by("vore").group_frames()
    assert len(gs) == 5  # carni/omni/herbi/insecti/NA
    assert sum(g.num_row for g in gs) == 12
