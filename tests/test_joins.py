"""Join tests — modeled on the reference's spec/joins_spec.cr."""

from __future__ import annotations

import pytest

from crysda_spark import from_records


@pytest.fixture(scope="module")
def persons(spark):
    return from_records(spark, [
        {"first_name": "max", "last_name": "smith", "age": 53},
        {"first_name": "tom", "last_name": "doe", "age": 30},
        {"first_name": "eva", "last_name": "miller", "age": 23},
    ], order=["first_name", "last_name", "age"])


@pytest.fixture(scope="module")
def weights(spark):
    return from_records(spark, [
        {"first": "max", "weight": 78.9},
        {"first": "tom", "weight": 67.1},
        {"first": "anna", "weight": 55.2},
    ], order=["first", "weight"])


@pytest.fixture(scope="module")
def salaries(spark):
    return from_records(spark, [
        {"first_name": "max", "salary": 100},
        {"first_name": "tom", "salary": 200},
        {"first_name": "anna", "salary": 300},
    ], order=["first_name", "salary"])


def test_natural_inner_join(persons, salaries):
    out = persons.inner_join(salaries)
    assert out.num_row == 2
    assert out.columns[0] == "first_name"  # keys first
    assert set(out.to_h()["first_name"]) == {"max", "tom"}


def test_left_join_nulls(persons, salaries):
    out = persons.left_join(salaries)
    h = {r["first_name"]: r["salary"] for r in out.collect()}
    assert h["eva"] is None and h["max"] == 100
    assert out.num_row == 3


def test_right_join(persons, salaries):
    out = persons.right_join(salaries)
    assert out.num_row == 3
    h = {r["first_name"]: r["age"] for r in out.collect()}
    assert h["anna"] is None


def test_outer_join(persons, salaries):
    out = persons.outer_join(salaries)
    assert out.num_row == 4
    assert set(out.to_h()["first_name"]) == {"max", "tom", "eva", "anna"}


def test_semi_join(persons, salaries):
    out = persons.semi_join(salaries)
    assert out.num_row == 2
    assert out.columns == persons.columns  # no right columns


def test_anti_join(persons, salaries):
    out = persons.anti_join(salaries)
    assert out.to_h()["first_name"] == ["eva"]


def test_unequal_by(persons, weights):
    out = persons.inner_join(weights, by=[("first_name", "first")])
    assert out.num_row == 2
    assert "weight" in out.columns


def test_unequal_by_bare_dict(persons, weights):
    # {"lcol": "rcol"} directly (not wrapped in a list) must map
    # left→right keys, not silently join lcol=lcol
    out = persons.inner_join(weights, by={"first_name": "first"})
    assert out.num_row == 2
    assert "weight" in out.columns


def test_suffixing(persons, spark):
    other = from_records(spark, [
        {"first_name": "max", "age": 99},
        {"first_name": "eva", "age": 11},
    ], order=["first_name", "age"])
    out = persons.inner_join(other, by="first_name")
    assert "age.x" in out.columns and "age.y" in out.columns
    h = {r["first_name"]: (r["age.x"], r["age.y"]) for r in out.collect()}
    assert h["max"] == (53, 99)


def test_cross_join(persons, weights):
    out = persons.inner_join(weights, by=[])
    assert out.num_row == 9
    assert out.num_col == 5


def test_cross_join_shared_cols_suffixed(persons):
    out = persons.inner_join(persons, by=[])
    assert out.num_row == 9
    assert "first_name.x" in out.columns and "first_name.y" in out.columns


def test_empty_right_join(persons, salaries):
    empty = salaries.filter(lambda e: e["salary"] > 10_000)
    out = persons.inner_join(empty)
    assert out.num_row == 0
    assert "salary" in out.columns  # 0-row result keeps columns


def test_tpch_join_chain(lineitem, orders, customer, nation, region):
    """Multi-table star join on the TPC-H-ish tables."""
    out = (customer
           .inner_join(nation, by=[("c_nationkey", "n_nationkey")])
           .inner_join(region, by=[("n_regionkey", "r_regionkey")]))
    assert out.num_row == customer.num_row
    assert "r_name" in out.columns
