"""Multinomial naive Bayes (pipeline/classify.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.pipeline import classify as cls


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spam buy cheap pills now", "spam"),
        (2, "cheap pills cheap deals", "spam"),
        (3, "meeting notes for the team", "ham"),
        (4, "team lunch notes today", "ham"),
        (5, "the quarterly team meeting", "ham"),
    ]
    return Frame(spark.createDataFrame(rows, "doc_id long, text string, label string"))


def test_nb_fit_weights_match_hand_computation(corpus):
    model = cls.nb_fit(corpus, "text", "doc_id", "label", alpha=1.0)
    w = {(r["label"], r["_tok"]): r["_logp"]
         for r in model["weights"].sdf.collect()}
    labels = {r["label"]: r for r in model["labels"].sdf.collect()}
    # spam corpus: 9 tokens total; 'cheap' appears 3x; vocab = distinct
    # tokens across BOTH classes
    vocab = len({t for (_, t) in w})
    assert math.isclose(w[("spam", "cheap")],
                        math.log((3 + 1) / (9 + vocab)), rel_tol=1e-12)
    assert math.isclose(labels["spam"]["_prior"], math.log(2 / 5), rel_tol=1e-12)
    assert math.isclose(labels["spam"]["_floor"],
                        math.log(1 / (9 + vocab)), rel_tol=1e-12)


def test_nb_predict_separates_classes(corpus):
    model = cls.nb_fit(corpus, "text", "doc_id", "label")
    pred = cls.nb_predict(corpus, model, "text", "doc_id").sdf.collect()
    got = {r["doc_id"]: r["predicted"] for r in pred}
    assert got == {1: "spam", 2: "spam", 3: "ham", 4: "ham", 5: "ham"}


def test_nb_predict_handles_unseen_tokens(corpus, spark):
    model = cls.nb_fit(corpus, "text", "doc_id", "label")
    new = Frame(spark.createDataFrame(
        [(10, "cheap unknownword pills")], "doc_id long, text string"))
    rows = cls.nb_predict(new, model, "text", "doc_id").sdf.collect()
    assert len(rows) == 1 and rows[0]["predicted"] == "spam"


def test_nb_predict_is_deterministic(corpus):
    model = cls.nb_fit(corpus, "text", "doc_id", "label")
    a = sorted(map(tuple, cls.nb_predict(corpus, model, "text", "doc_id").sdf.collect()))
    b = sorted(map(tuple, cls.nb_predict(corpus, model, "text", "doc_id").sdf.collect()))
    assert a == b


def test_nb_fit_rejects_reserved_columns(corpus):
    bad = Frame(corpus.sdf.withColumnRenamed("label", "_tot"))
    with pytest.raises(ValueError, match="collides"):
        cls.nb_fit(bad, "text", "doc_id", "_tot")


def test_nb_predict_rejects_bad_out_col(corpus):
    model = cls.nb_fit(corpus, "text", "doc_id", "label")
    with pytest.raises(ValueError, match="out_col"):
        cls.nb_predict(corpus, model, "text", "doc_id", out_col="text")


def test_nb_model_roundtrips_through_parquet(corpus, tmp_path):
    """The model IS a pair of tables — write/read must preserve scoring."""
    model = cls.nb_fit(corpus, "text", "doc_id", "label")
    wp, lp = str(tmp_path / "w"), str(tmp_path / "l")
    model["weights"].sdf.write.parquet(wp)
    model["labels"].sdf.write.parquet(lp)
    spark = corpus.sdf.sparkSession
    loaded = {"weights": Frame(spark.read.parquet(wp)),
              "labels": Frame(spark.read.parquet(lp))}
    a = sorted(map(tuple, cls.nb_predict(corpus, model, "text", "doc_id").sdf.collect()))
    b = sorted(map(tuple, cls.nb_predict(corpus, loaded, "text", "doc_id").sdf.collect()))
    assert a == b


# ---------------------------------------------------- linear model (GD)
def test_logreg_gd_separates_planted_classes(spark):
    """A linearly separable planted problem must train to near-perfect
    scores in a few full-batch iterations."""
    import random
    from crysda_spark.pipeline.classify import (logreg_gd_fit,
                                                logreg_gd_predict)
    rng = random.Random(3)
    rows = []
    for i in range(200):
        y = i % 2
        center = 0.8 if y else -0.8
        vec = [center + rng.gauss(0, 0.2) for _ in range(4)]
        rows.append((vec, float(y)))
    sdf = spark.createDataFrame(rows, "embedding array<double>, y double")
    w = logreg_gd_fit(sdf, "embedding", "y", dims=4, iters=8, lr=2.0)
    scored = sdf.select("y", logreg_gd_predict(sdf, "embedding", w))
    acc = scored.selectExpr(
        "avg(CASE WHEN (score >= 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0 END) a"
    ).collect()[0].a
    assert acc >= 0.97


def test_logreg_gd_bit_reproducible(spark):
    """The determinism contract: two runs over differently-partitioned
    copies of the same data produce IDENTICAL weight doubles (the
    decimal-quantized gradient sums are partition-order-free)."""
    from crysda_spark.pipeline.classify import logreg_gd_fit
    rows = [([float(i % 7) / 7, float(i % 3) / 3], float(i % 2))
            for i in range(100)]
    a = spark.createDataFrame(rows, "embedding array<double>, y double")
    b = spark.createDataFrame(rows, "embedding array<double>, y double") \
        .repartition(13)
    wa = logreg_gd_fit(a, "embedding", "y", dims=2, iters=4, lr=0.7)
    wb = logreg_gd_fit(b, "embedding", "y", dims=2, iters=4, lr=0.7)
    assert wa == wb
