"""Semantic dedup / k-means clustering (pipeline/clustering.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.pipeline import clustering as cl
from crysda_spark.plans.inspect import shuffle_count

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return Frame(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))


def _vec_frame(spark, vecs, start_id=0):
    rows = [(start_id + i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return Frame(spark.createDataFrame(rows, "vec_id long, embedding array<double>"))


def test_assign_cells_matches_declarative_expr(emb):
    """The numpy broadcast kernel and the pure-JVM nearest_centroid_expr
    must agree on every row for a fixed centroid set (real data, margins
    far from the rounding boundary)."""
    cents = [list(map(float, r[0])) for r in
             emb.sdf.filter("vec_id < 6").orderBy("vec_id")
             .select("embedding").collect()]
    kernel = cl.assign_cells(emb, np.array(cents), out_col="cell")
    expr = emb.sdf.select("vec_id",
                          cl.nearest_centroid_expr("embedding", cents).alias("cell"))
    merged = (kernel.sdf.select("vec_id", F.col("cell").alias("k"))
              .join(expr.withColumnRenamed("cell", "e"), "vec_id"))
    assert merged.filter("k <> e").count() == 0


def test_assign_cells_is_map_side_only(emb):
    """Assignment must add ZERO shuffles — broadcast centroids, one
    matmul per Arrow batch."""
    out = cl.assign_cells(emb, np.zeros((4, 64)) + np.eye(4, 64), out_col="cell")
    assert shuffle_count(out.sdf) == 0


def test_assign_cells_rejects_column_clash(emb):
    with pytest.raises(ValueError, match="already exists"):
        cl.assign_cells(emb, np.zeros((2, 64)), out_col="label")


def test_semantic_dedup_rejects_bad_keep(emb):
    with pytest.raises(ValueError, match="far|near"):
        cl.semantic_dedup(emb, keep="middle")


def test_semantic_dedup_collapses_planted_groups(spark, emb):
    """Identical and direction-identical (scaled) copies must collapse
    to one survivor per planted group; everything else is untouched
    at a 0.999 threshold on random-ish vectors."""
    base = emb.sdf.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    v = F.col("embedding")

    def clone(src, new_id, scale=None):
        e = F.transform(v, lambda x: x * F.lit(float(scale))) if scale else v
        return (base.filter(F.col("vec_id") == src)
                .select(F.lit(new_id).cast("long").alias("vec_id"), e.alias("embedding")))

    corpus = Frame(base.unionByName(clone(7, 100007))
                   .unionByName(clone(7, 200007, scale=1.5))
                   .unionByName(clone(11, 100011)))
    marks = cl.semantic_dedup(corpus, n_cells=8, threshold=0.999).sdf.cache()
    n_base = base.count()
    assert marks.count() == n_base + 3

    g1 = {r["id"]: r for r in marks.filter(F.col("id").isin(7, 100007, 200007)).collect()}
    assert len(g1) == 3
    assert sum(r["is_survivor"] for r in g1.values()) == 1
    assert len({r["survivor_id"] for r in g1.values()}) == 1

    g2 = {r["id"]: r for r in marks.filter(F.col("id").isin(11, 100011)).collect()}
    assert sum(r["is_survivor"] for r in g2.values()) == 1
    assert len({r["survivor_id"] for r in g2.values()}) == 1
    marks.unpersist()


def test_semantic_dedup_greedy_invariants(emb):
    """Exact-mode structural invariants: duplicates point at a kept row
    in the SAME cell with cosine ≥ threshold; kept rows in a cell are
    pairwise below threshold (greedy exactness)."""
    marks = cl.semantic_dedup(emb, n_cells=4, threshold=0.9)
    rows = marks.sdf.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.sdf.collect()}
    for k in vecs:
        vecs[k] = vecs[k] / np.linalg.norm(vecs[k])
    by_id = {r["id"]: r for r in rows}
    kept_by_cell: dict[int, list[int]] = {}
    for r in rows:
        if r["is_survivor"]:
            assert r["survivor_id"] == r["id"]
            kept_by_cell.setdefault(r["cell"], []).append(r["id"])
        else:
            s = by_id[r["survivor_id"]]
            assert s["is_survivor"]
            assert s["cell"] == r["cell"]
            sim = float(vecs[r["id"]] @ vecs[r["survivor_id"]])
            assert sim >= 0.9 - 1e-9
            assert abs(sim - r["sim_to_survivor"]) < 1e-9
    for cell, ids in kept_by_cell.items():
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                assert float(vecs[a] @ vecs[b]) < 0.9 + 1e-9


def test_semantic_dedup_lsh_path_catches_identical(spark):
    """Force the LSH fallback (max_exact_cell=2) in a single-cell corpus:
    identical vectors always share every bucket, so the planted group
    still collapses even on the bounded-candidate path."""
    rng = np.random.default_rng(7)
    vecs = list(rng.standard_normal((20, 16)))
    vecs += [vecs[3], vecs[3]]            # ids 20, 21 duplicate id 3
    corpus = _vec_frame(spark, vecs)
    marks = cl.semantic_dedup(corpus, n_cells=1, threshold=0.999,
                              max_exact_cell=2, lsh_tables=4, lsh_bits=4)
    got = {r["id"]: r for r in marks.sdf.filter(F.col("id").isin(3, 20, 21)).collect()}
    assert sum(r["is_survivor"] for r in got.values()) == 1
    assert len({r["survivor_id"] for r in got.values()}) == 1


def test_semantic_dedup_is_deterministic(emb):
    a = cl.semantic_dedup(emb, n_cells=4, threshold=0.95).sdf.orderBy("id").collect()
    b = cl.semantic_dedup(emb, n_cells=4, threshold=0.95).sdf.orderBy("id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_semantic_survivors_keeps_payload(emb):
    surv = cl.semantic_survivors(emb, n_cells=4, threshold=0.999)
    assert surv.columns == emb.columns
    assert 0 < surv.sdf.count() <= emb.sdf.count()
