"""Entity resolution (pipeline/entity.py): deletion-neighborhood
blocking recall, scoring threshold, transitive clustering, and the
no-all-pairs plan guarantee."""

import random

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame, from_records
from crysda_spark.pipeline import entity as er


def _resolve(spark, rows, threshold=0.9):
    f = from_records(spark, rows)
    out = er.resolve_entities(f, "id", "name", threshold=threshold)
    return {r.id: r.entity_id for r in out.sdf.collect()}


def test_deletion_keys_exact_neighborhood(spark):
    rows = from_records(spark, [{"id": 1, "name": "abc"}])
    got = rows.sdf.select(
        er.deletion_keys(er.normalize_entity(F.col("name"))).alias("k")) \
        .collect()[0].k
    assert sorted(got) == ["ab", "abc", "ac", "bc"]


def test_deletion_keys_empty_name_single_key(spark):
    # sequence(1, 0) would count DOWN in Spark; the greatest() floor
    # must leave exactly the '' key so empty names still block together
    rows = from_records(spark, [{"id": 1, "name": "!!"}])
    got = rows.sdf.select(
        er.deletion_keys(er.normalize_entity(F.col("name"))).alias("k")) \
        .collect()[0].k
    assert got == [""]


def test_radius1_recall_all_edit_kinds(spark):
    """The SymSpell guarantee: ANY single edit (substitution, insertion,
    deletion, at any position) must link variant to base."""
    base = "quarterly revenue report"
    rng = random.Random(42)
    rows = [{"id": 0, "name": base}]
    expected = {0: 0}
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for i in range(1, 13):
        pos = rng.randrange(len(base))
        kind = i % 3
        if kind == 0:       # substitution
            v = base[:pos] + rng.choice(alpha) + base[pos + 1:]
        elif kind == 1:     # insertion
            v = base[:pos] + rng.choice(alpha) + base[pos:]
        else:               # deletion
            v = base[:pos] + base[pos + 1:]
        rows.append({"id": i, "name": v})
        expected[i] = 0
    # distant decoys must stay singletons
    rows += [{"id": 100, "name": "completely different thing"},
             {"id": 101, "name": "zebra xylophone gardens"}]
    expected[100] = 100
    expected[101] = 101
    assert _resolve(spark, rows, threshold=0.9) == expected


def test_transitive_chain_merges_beyond_radius(spark):
    # a—b lev 1, b—c lev 1, a—c lev 2: one entity via components
    rows = [{"id": 1, "name": "alpha beta gamma"},
            {"id": 2, "name": "alpha beta gammax"},
            {"id": 3, "name": "alpha beta gammaxy"}]
    assert _resolve(spark, rows) == {1: 1, 2: 1, 3: 1}


def test_below_threshold_pairs_stay_apart(spark):
    # lev 3 on 10 chars → sim 0.7 < 0.9 even though a deletion key
    # might collide: scoring must gate what blocking admits
    rows = [{"id": 1, "name": "abcdefghij"},
            {"id": 2, "name": "abcdefgxyz"}]
    assert _resolve(spark, rows) == {1: 1, 2: 2}


def test_exact_duplicates_and_singletons(spark):
    rows = [{"id": 5, "name": "Same Name"}, {"id": 9, "name": "same name!"},
            {"id": 7, "name": "a lonely record"}]
    # normalization folds case/punctuation → 5 and 9 are sim 1.0
    assert _resolve(spark, rows) == {5: 5, 9: 5, 7: 7}


def test_no_cartesian_in_plan(spark):
    """Blocking must be an equi-join on deletion keys — an all-pairs
    CartesianProduct would be a 100 TB scale-killer."""
    f = from_records(spark, [{"id": i, "name": f"name {i}"}
                             for i in range(10)])
    plan = er.er_scored_pairs(f, "id", "name") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
