"""Product quantization (pipeline/pq.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.pipeline import pq
from crysda_spark.pipeline.similarity import brute_force_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return Frame(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))


def test_pq_train_shapes_and_errors(emb):
    cb = pq.pq_train(emb, m=8, nbits=4, sample_limit=500)
    assert cb.shape == (8, 16, 8)
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train(emb, m=7)
    with pytest.raises(ValueError, match="centroids"):
        pq.pq_train(emb, m=8, nbits=12, sample_limit=100)


def test_pq_encode_zero_shuffle_and_codes_in_range(emb):
    from crysda_spark.plans.inspect import shuffle_count
    cb = pq.pq_train(emb, m=8, nbits=4, sample_limit=500)
    enc = pq.pq_encode(emb, cb)
    assert shuffle_count(enc.sdf) == 0
    rows = enc.sdf.limit(20).collect()
    for r in rows:
        assert len(r["pq_code"]) == 8
        assert all(0 <= c < 16 for c in r["pq_code"])


def test_pq_adc_finds_planted_exact_copy(emb, spark):
    """An exact copy shares every sub-code with its original, so ADC
    gives it the minimal distance; negative planted ids win the
    tie-break against any same-code competitor."""
    base = emb.sdf.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    copies = (base.filter(F.col("vec_id") < 10)
              .select((-F.col("vec_id") - 1).alias("vec_id"), "embedding"))
    corpus = Frame(base.unionByName(copies))
    cb = pq.pq_train(Frame(base), m=8, nbits=4, sample_limit=500)
    enc = pq.pq_encode(corpus, cb)
    queries = Frame(base.filter(F.col("vec_id") < 10))
    top = pq.pq_topk(enc, queries, cb, k=3)
    r1 = {r["query_id"]: r["match_id"]
          for r in top.sdf.filter("rank = 1").collect()}
    for q in range(10):
        assert r1[q] == -q - 1


def test_pq_recall_against_brute_force(emb):
    """ADC recall@10 vs exact cosine on L2-normalized data — sanity
    floor, not a tuning claim."""
    norm = emb.sdf.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    nrm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    normed = Frame(norm.select(
        "vec_id", F.transform("v", lambda x: x / nrm).alias("embedding")))
    cb = pq.pq_train(normed, m=8, nbits=4, sample_limit=500)
    enc = pq.pq_encode(normed, cb)
    queries = Frame(normed.sdf.filter("vec_id < 15"))
    approx = pq.pq_topk(enc, queries, cb, k=10).sdf.collect()
    exact = brute_force_topk(normed, queries, k=10).sdf.collect()
    a, e = {}, {}
    for r in approx:
        a.setdefault(r["query_id"], set()).add(r["match_id"])
    for r in exact:
        e.setdefault(r["query_id"], set()).add(r["match_id"])
    recalls = [len(a[q] & e[q]) / 10 for q in e]
    assert sum(recalls) / len(recalls) > 0.3


def test_pq_empty_queries(emb):
    cb = pq.pq_train(emb, m=8, nbits=4, sample_limit=500)
    enc = pq.pq_encode(emb, cb)
    out = pq.pq_topk(enc, Frame(emb.sdf.filter(F.lit(False))), cb)
    assert out.sdf.count() == 0


# --------------------------------------------------------------- IVF-PQ
def test_ivfpq_finds_planted_exact_copy(emb, spark):
    base = emb.sdf.select("vec_id",
                          F.col("embedding").cast("array<double>").alias("embedding"))
    copies = (base.filter(F.col("vec_id") < 8)
              .select((-F.col("vec_id") - 1).alias("vec_id"), "embedding"))
    corpus = Frame(base.unionByName(copies))
    enc, cents, cb = pq.ivfpq_build(corpus, n_cells=8, m=8, nbits=4,
                                    sample_limit=600)
    queries = Frame(base.filter(F.col("vec_id") < 8))
    top = pq.ivfpq_topk(enc, cents, cb, queries, k=3, n_probe=2)
    r1 = {r["query_id"]: r["match_id"]
          for r in top.sdf.filter("rank = 1").collect()}
    # an exact copy shares cell + residual codes → minimal ADC distance;
    # the query's own cell is always its nearest, so probe-1 suffices
    for q in range(8):
        assert r1[q] == -q - 1


def test_ivfpq_encoded_is_compact_and_cell_tagged(emb):
    enc, cents, cb = pq.ivfpq_build(emb, n_cells=4, m=8, nbits=4,
                                    sample_limit=600)
    assert cents.shape == (4, 64) and cb.shape == (8, 16, 8)
    rows = enc.sdf.limit(10).collect()
    for r in rows:
        assert 0 <= r["cell"] < 4 and len(r["pq_code"]) == 8


def test_ivfpq_recall_not_worse_than_flat_pq(emb):
    """Residual quantization should at least match flat PQ recall on
    the same budget (usually beats it — centroids absorb the coarse
    structure)."""
    norm = emb.sdf.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    nrm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    normed = Frame(norm.select("vec_id",
                               F.transform("v", lambda x: x / nrm).alias("embedding")))
    queries = Frame(normed.sdf.filter("vec_id < 12"))
    exact = brute_force_topk(normed, queries, k=10).sdf.collect()
    e = {}
    for r in exact:
        e.setdefault(r["query_id"], set()).add(r["match_id"])

    cb_flat = pq.pq_train(normed, m=8, nbits=4, sample_limit=600)
    flat = pq.pq_topk(pq.pq_encode(normed, cb_flat), queries, cb_flat, k=10)
    enc, cents, cb = pq.ivfpq_build(normed, n_cells=4, m=8, nbits=4,
                                    sample_limit=600)
    ivf = pq.ivfpq_topk(enc, cents, cb, queries, k=10, n_probe=4)

    def recall(df):
        a = {}
        for r in df.sdf.collect():
            a.setdefault(r["query_id"], set()).add(r["match_id"])
        return sum(len(a.get(q, set()) & e[q]) / 10 for q in e) / len(e)

    r_flat, r_ivf = recall(flat), recall(ivf)
    # n_probe == n_cells → no candidate loss; residual coding should
    # not be materially worse (allow small slack for tie noise)
    assert r_ivf >= r_flat - 0.1, (r_ivf, r_flat)


def test_pq_rerank_exact_when_candidates_cover(emb):
    """Re-rank correctness: with candidates = the WHOLE corpus the
    refined result must equal brute force row for row — any deviation
    is a scoring bug, not a recall artifact."""
    norm = emb.sdf.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    nrm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    normed = Frame(norm.select("vec_id",
                               F.transform("v", lambda x: x / nrm).alias("embedding")))
    queries = Frame(normed.sdf.filter("vec_id < 6"))
    all_cand = Frame(queries.sdf.select(F.col("vec_id").alias("query_id"))
                     .crossJoin(normed.sdf.select(F.col("vec_id").alias("match_id")))
                     .filter("query_id <> match_id"))
    refined = pq.pq_rerank(all_cand, normed, queries, k=5)
    exact = brute_force_topk(normed, queries, k=5)
    got = sorted((r["query_id"], r["rank"], r["match_id"])
                 for r in refined.sdf.collect())
    want = sorted((r["query_id"], r["rank"], r["match_id"])
                  for r in exact.sdf.collect())
    assert got == want


def test_pq_rerank_improves_adc_recall(emb):
    """Two-stage (generous ADC candidates -> exact re-rank) must not
    recall WORSE than single-stage ADC top-k at the same final k."""
    norm = emb.sdf.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    nrm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    normed = Frame(norm.select("vec_id",
                               F.transform("v", lambda x: x / nrm).alias("embedding")))
    cb = pq.pq_train(normed, m=8, nbits=4, sample_limit=500)
    enc = pq.pq_encode(normed, cb)
    queries = Frame(normed.sdf.filter("vec_id < 10"))
    exact = brute_force_topk(normed, queries, k=5)
    e = {}
    for r in exact.sdf.collect():
        e.setdefault(r["query_id"], set()).add(r["match_id"])

    def recall(df):
        a = {}
        for r in df.sdf.collect():
            a.setdefault(r["query_id"], set()).add(r["match_id"])
        return sum(len(a.get(q, set()) & e[q]) / 5 for q in e) / len(e)

    single = recall(pq.pq_topk(enc, queries, cb, k=5))
    cand = pq.pq_topk(enc, queries, cb, k=60)
    two_stage = recall(pq.pq_rerank(cand, normed, queries, k=5))
    assert two_stage >= single - 1e-9, (two_stage, single)
