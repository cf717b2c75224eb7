"""Guard the driver's correctness-gate roster.

The driver checks the FIRST 50 registrations of ``queries()`` only
(CORRECTNESS_r01/r02 each cover exactly registrations 1-50), so
registration order IS the gate roster.  Round 2 silently evicted 12
driver-checked queries by inserting new ones early; this test turns
window eviction from silent into red.
"""

import importlib.util
from pathlib import Path

import pytest

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"

# The PERMANENT CORE: every SURVEY §2 operator family keeps a row in the
# driver gate (positions 1-50) across rotations. Since r11 the remaining
# ~27 slots ROTATE each round toward queries with no prior driver-green
# CORRECTNESS_rN row (the r10 judge directive) — rotated-out queries keep
# their accumulated driver-green history plus pytest + check_oracle
# coverage, so the core here is intentionally the floor, not the roster.
MUST_BE_IN_WINDOW = {
    # §2.4 grouping / aggregation (plain agg + the applyInPandas path)
    "q1_pricing_summary", "transform_groups_zscore",
    # §2.2 projection / builder
    "project_rename", "literal_builder_values",
    # §2.3 filters / distinct
    "filter_compound", "distinct_pairs",
    # §2.5 window
    "window_topn_per_group",
    # §2.6 column functions
    "map_values_upper",
    # §2.7 joins incl. temporal
    "join_left_nulls", "join_outer", "asof_click_error",
    "range_join_value_bins", "q5_local_supplier",
    # §2.8 reshape
    "spread_pivot", "nest_unnest_roundtrip",
    # §2.9 set ops
    "bind_rows_union", "bind_cols_zip",
    # streaming-equivalent + plan rewrites
    "events_tumbling_hourly", "salted_join_revenue",
    # LLM-pipeline anchors
    "rollup_cascade_daily", "dedup_exact_docs", "embed_topk_cosine",
    "ngram_jaccard_docs",
}


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location("spark_entry_roster", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_window_is_exactly_the_curated_gate(entry_mod):
    first50 = list(entry_mod.queries())[:50]
    assert first50 == entry_mod._GATE_ORDER, (
        "queries() positions 1-50 drifted from _GATE_ORDER — the driver "
        "gate roster changed"
    )


def test_every_required_operator_query_sits_in_window(entry_mod):
    first50 = set(list(entry_mod.queries())[:50])
    evicted = MUST_BE_IN_WINDOW - first50
    assert not evicted, f"gate-required queries evicted from first 50: {sorted(evicted)}"


def test_window_queries_carry_oracles_or_declared_rows_only(entry_mod):
    # r14 policy: with the SQL-oracled union complete, gate slots may
    # hold rows-only queries — but ONLY those explicitly declared in
    # _GATE_ROWS_ONLY (each carries an in-query planted-truth gate);
    # an oracle-less query can never slip in unintentionally, and a
    # declared rows-only query must not secretly lack registration
    oracles = entry_mod.oracle_sql()
    first50 = list(entry_mod.queries())[:50]
    missing = [n for n in first50 if n not in oracles]
    undeclared = [n for n in missing if n not in entry_mod._GATE_ROWS_ONLY]
    assert not undeclared, (
        f"gate slots hold UNDECLARED oracle-less queries: {undeclared}"
    )
    # and the declaration itself stays honest: everything declared is
    # actually registered and actually oracle-less
    for n in entry_mod._GATE_ROWS_ONLY:
        assert n in entry_mod.queries(), f"declared but unregistered: {n}"
        assert n not in oracles, (
            f"{n} gained a SQL oracle — remove it from _GATE_ROWS_ONLY "
            "so the stronger check is recorded")


def test_planted_truth_recall_gate_raises(entry_mod, spark):
    """_assert_recall must FAIL a query when planted truth is missed —
    the mechanism behind the rows-only near-dup/ANN self-checks."""
    from pyspark.sql import functions as F
    df = spark.range(5)
    with pytest.raises(AssertionError, match="planted-truth"):
        entry_mod._assert_recall(df, F.col("id") > 100, 1, "unreachable")
    ok = entry_mod._assert_recall(df, F.col("id") >= 0, 5, "all rows")
    assert ok.count() == 5
    ok.unpersist()


def test_no_registration_lost_or_duplicated(entry_mod):
    names = list(entry_mod.queries())
    assert len(names) == len(set(names))
    assert set(entry_mod._GATE_ORDER) <= set(names)
    # every oracle belongs to a registered query
    assert set(entry_mod.oracle_sql()) <= set(names)
