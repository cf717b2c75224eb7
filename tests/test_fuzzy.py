"""Fuzzy edit-distance join (operators/fuzzy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.operators.fuzzy import fuzzy_join


@pytest.fixture()
def names(spark):
    clean = Frame(spark.createDataFrame(
        [(1, "alice"), (2, "robert"), (3, "eve")], "id long, name string"))
    dirty = Frame(spark.createDataFrame(
        [(10, "alcie"),      # transposition: distance 2 from alice
         (11, "robrt"),      # deletion: distance 1 from robert
         (12, "zzzzzz")],    # matches nothing
        "id long, name string"))
    return clean, dirty


def test_fuzzy_join_inner(names):
    clean, dirty = names
    out = fuzzy_join(dirty, clean, "name", "name", max_distance=2)
    got = {(r["id.x"], r["id.y"]): r["edit_distance"]
           for r in out.sdf.collect()}
    assert got == {(10, 1): 2, (11, 2): 1}


def test_fuzzy_join_left_keeps_unmatched(names):
    clean, dirty = names
    out = fuzzy_join(dirty, clean, "name", "name", max_distance=2, how="left")
    rows = out.sdf.collect()
    unmatched = [r for r in rows if r["id.x"] == 12]
    assert len(unmatched) == 1 and unmatched[0]["id.y"] is None
    assert unmatched[0]["edit_distance"] is None
    assert len(rows) == 3


def test_fuzzy_join_left_null_payload_not_duplicated(spark):
    """r8 regression (ADVICE): a MATCHED left row carrying a NULL in a
    non-key column must not ALSO come back through the unmatched-
    recovery anti-join (NULL never equals NULL in join equality, so a
    column-wise anti-join kept it and emitted a duplicate)."""
    dirty = Frame(spark.createDataFrame(
        [(10, "alcie", None), (12, "zzzzzz", "x")],
        "id long, name string, note string"))
    clean = Frame(spark.createDataFrame(
        [(1, "alice")], "id long, nm string"))
    out = fuzzy_join(dirty, clean, "name", "nm", max_distance=2, how="left")
    rows = out.sdf.collect()
    assert len(rows) == 2
    matched = [r for r in rows if r["id.x"] == 10]
    assert len(matched) == 1 and matched[0]["id.y"] == 1
    unmatched = [r for r in rows if r["id.x"] == 12]
    assert len(unmatched) == 1 and unmatched[0]["id.y"] is None
    assert "__lid__" not in out.columns


def test_fuzzy_join_zero_distance_is_exact(names):
    clean, _ = names
    out = fuzzy_join(clean, clean, "name", "name", max_distance=0)
    assert out.sdf.filter("`id.x` <> `id.y`").count() == 0
    assert out.sdf.count() == 3


def test_fuzzy_join_is_equi_banded_not_nested_loop(names):
    clean, dirty = names
    out = fuzzy_join(dirty, clean, "name", "name", max_distance=2)
    from crysda_spark.plans.inspect import _explain_str
    txt = _explain_str(out.sdf, "formatted")
    assert "BroadcastNestedLoopJoin" not in txt
    assert "CartesianProduct" not in txt


def test_fuzzy_join_block_on(spark):
    l = Frame(spark.createDataFrame([(1, "us", "jon")], "id long, cc string, n string"))
    r = Frame(spark.createDataFrame(
        [(2, "us", "john"), (3, "de", "john")], "id long, cc string, n string"))
    out = fuzzy_join(l, r, "n", "n", max_distance=1,
                     block_on=[("cc", "cc")])
    rows = out.sdf.collect()
    assert len(rows) == 1 and rows[0]["id.y"] == 2


def test_fuzzy_join_validation(names):
    clean, dirty = names
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_join(dirty, clean, "name", "name", max_distance=-1)
    with pytest.raises(ValueError, match="inner|left"):
        fuzzy_join(dirty, clean, "name", "name", how="outer")
