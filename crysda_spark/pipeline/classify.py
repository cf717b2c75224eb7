"""Distributed text classification: multinomial naive Bayes.

The fasttext-shaped step of a training-data pipeline — score/route
documents with a lightweight linear model — expressed entirely in
JVM-side relational algebra, so both training and inference run as
codegen'd joins/aggregations (no parameter server, no UDF):

- TRAIN: one shuffle keyed by (label, token) builds per-class token
  counts; class totals and priors are label-cardinality-sized.
- PREDICT: per-document token counts cross-join the label list
  (|labels| map-side expansion, 5-20 in practice), left-join the
  weight table on (token, label) — unseen tokens fall back to the
  Laplace floor — and one aggregate per (doc, label) sums the
  log-likelihood. The weight table shuffles by token; at corpus scale
  it is vocabulary-sized, far below the corpus, so AQE typically
  broadcasts it.

Scores are ROUNDED (6 decimals) before the argmax and ties break
toward the lexicographically smaller label, making predictions
reproducible across engines (raw float argmax is not a contract).
Smoothing follows the standard multinomial NB with Laplace α
(Manning, Raghavan & Schütze, "Introduction to IR", §13.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..frame import Frame
from .text import normalize

__all__ = ["nb_fit", "nb_predict"]

_RESERVED = {"_tok", "_n", "_c", "_tot", "_prior", "_logp", "_floor",
             "_score", "_rn", "_ndl", "_nd"}


def _tokens(sdf, text_col: str, id_col: str, label_col: str | None):
    cols = [F.col(id_col)] + ([F.col(label_col)] if label_col else [])
    return (sdf.select(*cols,
                       F.explode(F.split(normalize(F.col(text_col)), " "))
                        .alias("_tok"))
            .filter(F.length("_tok") > 0))


def nb_fit(f: Frame, text_col: str, id_col: str, label_col: str,
           alpha: float = 1.0) -> dict[str, Frame]:
    """Train multinomial NB. Returns the model as two Frames:

    - ``weights``: (label, _tok, _logp) — ln P(token | label), Laplace-
      smoothed over the GLOBAL vocabulary;
    - ``labels``: (label, _prior, _floor) — ln P(label) and the unseen-
      token log-probability ln(α / (T_label + α·V)).

    Both are plain DataFrames: persist them, write them to parquet, or
    feed them straight to ``nb_predict`` — the model IS a table, which
    is what makes batch scoring a join instead of a UDF.
    """
    for c in (text_col, id_col, label_col):
        if c in _RESERVED:
            raise ValueError(f"nb_fit: column {c!r} collides with internal "
                             f"working columns {sorted(_RESERVED)}")
    tok = _tokens(f.sdf, text_col, id_col, label_col)
    cnt = tok.groupBy(label_col, "_tok").agg(F.count(F.lit(1)).alias("_c"))
    vocab = cnt.select("_tok").distinct().count()       # scalar, 1 job
    tot = cnt.groupBy(label_col).agg(F.sum("_c").alias("_tot"))
    n_docs = f.sdf.select(id_col).distinct().count()
    docs_per = (f.sdf.groupBy(label_col)
                .agg(F.count_distinct(id_col).alias("_ndl")))
    labels = (docs_per.join(tot, on=label_col)
              .select(label_col,
                      F.log(F.col("_ndl") / F.lit(float(n_docs))).alias("_prior"),
                      F.log(F.lit(alpha) / (F.col("_tot") + alpha * vocab))
                       .alias("_floor")))
    weights = (cnt.join(tot, on=label_col)
               .select(label_col, "_tok",
                       F.log((F.col("_c") + alpha)
                             / (F.col("_tot") + alpha * vocab)).alias("_logp")))
    return {"weights": Frame(weights), "labels": Frame(labels)}


def nb_predict(f: Frame, model: dict[str, Frame], text_col: str, id_col: str,
               label_col: str = "label", out_col: str = "predicted",
               round_decimals: int = 6) -> Frame:
    """Score every document against every label and keep the argmax.

    Returns (id, ``out_col``, score) with score = rounded total log-
    likelihood of the winning label. Deterministic: rounded scores,
    label-ascending tie-break.
    """
    if out_col in f.columns or out_col in _RESERVED:
        raise ValueError(f"nb_predict: bad out_col {out_col!r}")
    tok = (_tokens(f.sdf, text_col, id_col, None)
           .groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_n")))
    labels = F.broadcast(model["labels"].sdf)
    grid = tok.crossJoin(labels.select(label_col, "_floor"))
    scored = (grid.join(model["weights"].sdf, on=[label_col, "_tok"], how="left")
              .select(id_col, label_col, "_n",
                      F.coalesce(F.col("_logp"), F.col("_floor")).alias("_logp")))
    per_label = (scored.groupBy(id_col, label_col)
                 .agg(F.sum(F.col("_n") * F.col("_logp")).alias("_score")))
    per_label = (per_label.join(labels.select(label_col, "_prior"), on=label_col)
                 .select(id_col, label_col,
                         F.round(F.col("_score") + F.col("_prior"),
                                 round_decimals).alias("_score")))
    rn = F.row_number().over(
        W.partitionBy(id_col).orderBy(F.col("_score").desc(), F.col(label_col)))
    out = (per_label.withColumn("_rn", rn).filter(F.col("_rn") == 1)
           .select(id_col, F.col(label_col).alias(out_col),
                   F.col("_score").alias("score")))
    return Frame(out)


# ---------------------------------------------------- linear model (GD)
def algebraic_sigmoid(z: "F.Column") -> "F.Column":
    """0.5 + 0.5·z/(1+|z|) — a rational squashing link (the 'fast
    sigmoid'). Chosen over exp-based σ deliberately: transcendental
    functions are NOT bit-identical across engines (libm vs libstdc++
    last-ulp differences), while +,−,×,÷,abs are IEEE-exact everywhere,
    so a training run under this link is reproducible bit-for-bit on
    any engine — the property the cross-engine oracle checks."""
    return F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))


def logreg_gd_fit(sdf, features_col: str, label_col: str, dims: int,
                  iters: int = 3, lr: float = 0.5,
                  quant: str = "decimal(28,14)") -> list[float]:
    """Full-batch gradient descent for a binary linear classifier over a
    fixed-width array feature column. Returns ``[bias, w1..w_dims]``.

    Execution shape (the point at 100 TB): each iteration is ONE
    map-side-combined aggregate over the fact table — weights travel
    INTO the plan as literals (broadcast by the closure, no parameter
    server, no Python in the row path) and ``dims+2`` partial-aggregated
    sums come back to the driver. The driver loop is bounded by
    ``iters`` exactly like PageRank's rounds.

    Determinism contract: per-row gradient terms are DOUBLE products
    (bit-identical given identical weights) quantized to ``quant``
    decimals BEFORE summation, so the cross-row sum is exact decimal —
    independent of partition order — and every derived weight is the
    same double on every engine and cluster layout. The mean gradient
    divides by the row count in double (exact: one correctly-rounded
    op), and the update w −= lr·mean runs in plain IEEE doubles."""
    y = F.col(label_col).cast("double")
    feats = F.transform(F.slice(F.col(features_col), 1, dims),
                        lambda v: v.cast("double"))
    w = [0.0] * dims
    b = 0.0
    for _ in range(iters):
        # Dot product as a left fold SEEDED WITH b — exactly the
        # ((b + x1·w1) + x2·w2)… association the SQL oracle writes, so
        # the IEEE rounding path is identical. A dims-wide unrolled
        # expression tree here cost more in Catalyst planning + Janino
        # compile than the whole scan (first cut: 17 s for 3 iterations
        # at dims=64); the fold + explode below keep every plan O(1)
        # in dims.
        w_arr = F.array(*[F.lit(float(v)) for v in w])
        z = F.aggregate(F.zip_with(feats, w_arr, lambda a, c: a * c),
                        F.lit(float(b)), lambda acc, v: acc + v)
        err = (algebraic_sigmoid(z) - y).alias("_err")
        # gradient via posexplode + 65-key groupBy: one tiny map-side-
        # combined shuffle; pos `dims` is the appended bias slot (x=1)
        exploded = sdf.select(
            err, F.posexplode(F.concat(feats, F.array(F.lit(1.0))))
            .alias("_pos", "_x"))
        rows = (exploded.groupBy("_pos")
                .agg(F.sum((F.col("_x") * F.col("_err")).cast(quant))
                     .alias("g"),
                     F.count(F.lit(1)).alias("n"))
                .collect())
        grads = {r["_pos"]: r for r in rows}
        n = grads[dims]["n"]
        b = b - lr * (float(grads[dims]["g"]) / n)
        w = [w[j] - lr * (float(grads[j]["g"]) / n) for j in range(dims)]
    return [b] + w


def logreg_gd_predict(sdf, features_col: str, weights: list[float],
                      out_col: str = "score") -> "F.Column":
    """Score column for a trained ``logreg_gd_fit`` weight vector —
    same literal-broadcast shape as training."""
    z = F.lit(weights[0])
    for j, wj in enumerate(weights[1:]):
        z = z + F.element_at(F.col(features_col), j + 1).cast("double") \
            * F.lit(wj)
    return algebraic_sigmoid(z).alias(out_col)
