"""PageRank (pipeline/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.pipeline.graph import out_degrees, pagerank


def _edges(spark, pairs):
    return Frame(spark.createDataFrame(pairs, "src long, dst long"))


def _reference_pagerank(pairs, damping=0.85, iters=10):
    """Plain-python power iteration with uniform dangling
    redistribution — the spec the distributed operator must match."""
    edges = sorted(set(pairs))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in out)
        nxt = {v: (1 - damping) / n + damping * dang / n for v in nodes}
        for a, b in edges:
            nxt[b] += damping * r[a] / out[a]
        r = nxt
    return r


def test_pagerank_matches_reference_power_iteration(spark):
    pairs = [(1, 2), (2, 1), (1, 3), (3, 1), (4, 1), (5, 4), (1, 6)]
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges(spark, pairs), max_iter=10).sdf.collect()}
    want = _reference_pagerank(pairs, iters=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_mass_conserved_with_dangling(spark):
    # 6 is a pure sink; 5→4→1 chain feeds the hub
    pairs = [(1, 6), (2, 6), (3, 6), (4, 1), (5, 4)]
    got = pagerank(_edges(spark, pairs), max_iter=6).sdf.collect()
    assert abs(sum(r["rank"] for r in got) - 1.0) < 1e-9


def test_pagerank_duplicate_edges_count_once(spark):
    a = pagerank(_edges(spark, [(1, 2), (1, 2), (2, 1)]), max_iter=5)
    b = pagerank(_edges(spark, [(1, 2), (2, 1)]), max_iter=5)
    ra = {r["node"]: r["rank"] for r in a.sdf.collect()}
    rb = {r["node"]: r["rank"] for r in b.sdf.collect()}
    assert ra == rb


def test_pagerank_tol_early_stop_matches_converged(spark):
    pairs = [(1, 2), (2, 3), (3, 1)]  # 3-cycle converges to uniform instantly
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges(spark, pairs), max_iter=50,
                             tol=1e-12).sdf.collect()}
    for v in (1, 2, 3):
        assert abs(got[v] - 1.0 / 3) < 1e-9


def test_pagerank_rejects_reserved_columns(spark):
    e = Frame(_edges(spark, [(1, 2)]).sdf.withColumnRenamed("src", "_src"))
    with pytest.raises(ValueError, match="collides"):
        pagerank(e, src="_src")


def test_pagerank_empty_graph(spark):
    e = Frame(_edges(spark, [(1, 2)]).sdf.filter(F.lit(False)))
    assert pagerank(e, max_iter=2).sdf.count() == 0


def test_out_degrees(spark):
    got = {r["node"]: r["out_deg"] for r in
           out_degrees(_edges(spark, [(1, 2), (1, 3), (2, 3)])).sdf.collect()}
    assert got == {1: 2, 2: 1}
