"""Set operations (SURVEY §2.9): union / intersect / exceptAll
multiset semantics, bind_cols duplicate-name resolution."""

from __future__ import annotations

from crysda_spark import Frame, bind_cols, from_records


def _f(spark, vals):
    return from_records(spark, [{"x": v} for v in vals])


def test_union_keeps_duplicates(spark):
    a, b = _f(spark, [1, 1, 2]), _f(spark, [2, 3])
    assert sorted(a.union(b).to_h()["x"]) == [1, 1, 2, 2, 3]


def test_intersect_distinct_semantics(spark):
    a, b = _f(spark, [1, 1, 2, 3]), _f(spark, [1, 1, 1, 3, 4])
    assert sorted(a.intersect(b).to_h()["x"]) == [1, 3]


def test_except_all_multiset(spark):
    a, b = _f(spark, [1, 1, 1, 2]), _f(spark, [1])
    assert sorted(a.except_rows(b).to_h()["x"]) == [1, 1, 2]


def test_bind_cols_renames_duplicates(spark):
    a = from_records(spark, [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}])
    b = from_records(spark, [{"x": 10, "z": True}, {"x": 20, "z": False}])
    out = bind_cols(a, b)
    assert out.columns == ["x", "y", "x_1", "z"]
    h = out.sort_by("x").to_h()
    assert h["x"] == [1, 2] and h["x_1"] == [10, 20]
