"""Data-quality checks (operators/checks.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.operators import checks as ck


@pytest.fixture()
def dirty(spark):
    rows = [
        (1, "a@x.com", 10.0, "gold"),
        (2, None, 20.0, "gold"),          # null email
        (2, "b@x.com", -5.0, "silver"),   # dup id, out-of-range v
        (4, "not-an-email", 30.0, "tin"), # bad format, bad tier
    ]
    return Frame(spark.createDataFrame(rows, "id long, email string, v double, tier string"))


def test_run_checks_single_pass_report(dirty, spark):
    ref = Frame(spark.createDataFrame([(1,), (2,)], "id long"))
    report = ck.run_checks(dirty, [
        ck.not_null("email"),
        ck.unique("id"),
        ck.in_range("v", 0.0, 100.0),
        ck.matches("email", r"^[^@]+@[^@]+\.[a-z]+$"),
        ck.accepted_values("tier", ["gold", "silver"]),
        ck.satisfies("positive_when_gold", (F.col("tier") != "gold") | (F.col("v") > 0)),
        ck.ref_integrity("id", ref, "id"),
    ])
    got = {r["check"]: (r["violations"], r["total"], r["passed"])
           for r in report.sdf.collect()}
    assert got["not_null(email)"] == (1, 4, False)
    assert got["unique(id)"] == (1, 4, False)
    assert got["in_range(v, 0.0, 100.0)"] == (1, 4, False)
    assert got["matches(email)"][0] == 1          # null row not a format violation
    assert got["accepted_values(tier)"] == (1, 4, False)
    assert got["satisfies(positive_when_gold)"] == (0, 4, True)
    assert got["ref_integrity(id -> id)"] == (1, 4, False)   # id 4 unmatched


def test_run_checks_clean_frame_passes(spark):
    f = Frame(spark.createDataFrame([(1, 5.0), (2, 6.0)], "id long, v double"))
    report = ck.run_checks(f, [ck.not_null("v"), ck.unique("id"),
                               ck.in_range("v", 0.0, 10.0)])
    assert all(r["passed"] for r in report.sdf.collect())


def test_run_checks_agg_checks_are_one_pass(dirty):
    from crysda_spark.plans.inspect import scan_health
    report = ck.run_checks(dirty, [ck.not_null("email"), ck.unique("id"),
                                   ck.in_range("v", 0.0, 100.0)])
    # all aggregate checks share ONE scan of the frame
    assert len(scan_health(report.sdf)) <= 1


def test_run_checks_requires_checks(dirty):
    with pytest.raises(ValueError, match="no checks"):
        ck.run_checks(dirty, [])


def test_violation_rows_predicate_checks(dirty):
    rows = ck.violation_rows(dirty, ck.not_null("email")).sdf.collect()
    assert len(rows) == 1 and rows[0]["id"] == 2 and rows[0]["check"] == "not_null(email)"
    rows = ck.violation_rows(dirty, ck.in_range("v", 0.0, 100.0)).sdf.collect()
    assert [r["v"] for r in rows] == [-5.0]
    rows = ck.violation_rows(dirty, ck.accepted_values("tier", ["gold", "silver"])).sdf.collect()
    assert [r["tier"] for r in rows] == ["tin"]


def test_violation_rows_unique_returns_all_copies(dirty):
    rows = ck.violation_rows(dirty, ck.unique("id")).sdf.collect()
    assert sorted(r["id"] for r in rows) == [2, 2]


def test_violation_rows_ref_integrity(dirty, spark):
    ref = Frame(spark.createDataFrame([(1,), (2,)], "id long"))
    rows = ck.violation_rows(dirty, ck.ref_integrity("id", ref, "id")).sdf.collect()
    assert sorted(r["id"] for r in rows) == [4]


def test_violation_rows_limit(dirty):
    rows = ck.violation_rows(dirty, ck.unique("id"), limit=1).sdf.collect()
    assert len(rows) == 1


def test_check_names_survive_quotes_verbatim(dirty):
    """r8 regression (ADVICE): report keys must equal Check.name even
    for names carrying quotes/backslashes — the old stack() string
    interpolation stripped single quotes (and backslashes could corrupt
    the expression)."""
    name = r"it's a \"weird\" name \ with backslash"
    c = ck.satisfies(name, F.col("v") > -100)
    report = ck.run_checks(dirty, [c])
    got = report.sdf.collect()
    assert len(got) == 1 and got[0]["check"] == c.name
    assert got[0]["passed"]


def test_unique_key_columns_are_typed_not_parsed(spark):
    """unique()'s key list rides in Check.cols; a column name
    containing a comma must not be split into two bogus columns by
    violation_rows."""
    f = Frame(spark.createDataFrame(
        [(1, "x"), (1, "y")], ["weird, name", "other"]))
    c = ck.unique("weird, name")
    assert c.cols == ("weird, name",)
    rows = ck.violation_rows(f, c).sdf.collect()
    assert len(rows) == 2  # both copies of the duplicated key
