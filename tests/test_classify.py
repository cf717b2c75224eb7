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
