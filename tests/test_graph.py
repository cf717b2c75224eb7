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


# ------------------------------------------------------- triangle census
def _py_triangles(pairs):
    """Brute-force reference: set-based triangle count + wedge count."""
    from collections import defaultdict
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    tris = 0
    nodes = sorted(adj)
    for u in nodes:
        for v in adj[u]:
            if v <= u:
                continue
            tris += sum(1 for w in adj[u] & adj[v] if w > v)
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    return tris, wedges


def test_triangle_stats_matches_bruteforce(spark):
    import random
    from crysda_spark import Frame
    from crysda_spark.pipeline.graph import triangle_stats
    rnd = random.Random(13)
    pairs = {(rnd.randrange(30), rnd.randrange(30)) for _ in range(120)}
    f = Frame(spark.createDataFrame([(a, b) for a, b in pairs],
                                    "id_a long, id_b long"))
    got = triangle_stats(f).sdf.collect()[0]
    tris, wedges = _py_triangles(pairs)
    assert got["n_triangles"] == tris
    assert got["n_wedges"] == wedges
    want_cc = round(3.0 * tris / wedges, 6) if wedges else 0.0
    assert got["global_clustering"] == want_cc


def test_triangle_stats_normalizes_input(spark):
    """Self-loops, duplicates, and reversed duplicates must not count."""
    from crysda_spark import Frame
    from crysda_spark.pipeline.graph import triangle_stats
    f = Frame(spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)],
        "id_a long, id_b long"))
    got = triangle_stats(f).sdf.collect()[0]
    assert got["n_triangles"] == 1
    assert got["n_wedges"] == 3            # each vertex has degree 2
    assert got["global_clustering"] == 1.0  # a pure triangle


def test_triangle_stats_hub_graph_exact(spark):
    """A star (hub of degree 50) has zero triangles but many wedges —
    the degree-ordered orientation must not blow up or miscount."""
    from pyspark.sql import functions as F
    from crysda_spark import Frame
    from crysda_spark.pipeline.graph import triangle_stats
    star = spark.range(1, 51).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b"))
    got = triangle_stats(Frame(star)).sdf.collect()[0]
    assert got["n_triangles"] == 0
    assert got["n_wedges"] == 50 * 49 // 2
    assert got["global_clustering"] == 0.0
