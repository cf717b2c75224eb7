"""Similarity search over embedding columns (array<float>).

Two paths:

- brute_force_topk: exact cosine top-k. The dot product is a single
  codegen'd ``F.zip_with`` + ``F.aggregate`` expression (no UDF, no
  Python). Query set × corpus is a broadcast nested-loop join — correct
  baseline, O(|Q|·N); use when |Q| is small.
- lsh_topk: random-hyperplane LSH. Each vector gets a sign-bit bucket
  from ``n_planes`` fixed pseudo-random hyperplanes (deterministic,
  seeded); candidates = same bucket (multi-probe: hamming<=1 neighbor
  buckets), then exact cosine re-rank. The bucket join is an equi-join
  → shuffle on bucket id, linear in corpus size: the 100 TB path.

Embedding-cosine near-dup detection reuses the same machinery
(pairs with cosine >= threshold).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, Window as W, functions as F

from ..frame import Frame


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(corpus: Frame, queries: Frame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> Frame:
    """Exact cosine top-k of each query against the corpus.
    Output: (query_id, match_id, cos) with rank<=k; ties broken by
    match_id for determinism. The query side is broadcast."""
    # float32 embeddings are upcast to double BEFORE any arithmetic so the
    # result is bit-identical to engines that compute in double (oracle parity)
    q = queries.sdf.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).cast("array<double>").alias("q_vec"))
    c = corpus.sdf.select(F.col(id_col).alias("match_id"),
                          F.col(vec_col).cast("array<double>").alias("c_vec"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("query_id") != F.col("match_id"))
              .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec"))))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("match_id"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "match_id", "cos", "rank"))
    return Frame(out)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def bucket_expr(vec_col, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from fixed hyperplanes — one int per vector."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        proj = dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(corpus: Frame, queries: Frame, k: int = 5, dim: int = 64,
             n_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", multiprobe: bool = True,
             seed: int = 42) -> Frame:
    """Approximate cosine top-k: hyperplane-LSH bucket join + exact
    re-rank inside buckets. multiprobe=True also probes all buckets at
    hamming distance 1, trading 9× candidate volume for recall."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.sdf.select(F.col(id_col).alias("match_id"),
                          F.col(vec_col).cast("array<double>").alias("c_vec")) \
        .withColumn("bucket", bucket_expr("c_vec", planes))
    q = queries.sdf.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).cast("array<double>").alias("q_vec")) \
        .withColumn("bucket0", bucket_expr("q_vec", planes))
    if multiprobe:
        probes = F.array(F.col("bucket0"),
                         *[F.col("bucket0").bitwiseXOR(F.lit(1 << i))
                           for i in range(n_planes)])
        q = q.withColumn("bucket", F.explode(probes))
    else:
        q = q.withColumn("bucket", F.col("bucket0"))
    scored = (q.join(c, on="bucket", how="inner")
              .filter(F.col("query_id") != F.col("match_id"))
              .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec"))))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("match_id"))
    out = (scored.dropDuplicates(["query_id", "match_id"])
           .withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "match_id", "cos", "rank"))
    return Frame(out)


def ivf_topk(corpus: Frame, queries: Frame, k: int = 5, n_cells: int = 16,
             n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 42,
             sample_fraction: float = 1.0) -> Frame:
    """Approximate cosine top-k via an IVF (inverted-file) index:
    k-means cells + probe-nearest-cells search.

    Scale architecture:
    - TRAIN on a sample (``sample_fraction``) with pyspark.ml KMeans —
      training cost is decoupled from corpus size.
    - ASSIGN each corpus vector to its nearest centroid: the centroid
      table (n_cells × dim floats) is broadcast, assignment is one
      map-side pass, and the corpus shuffles ONCE on cell_id.
    - SEARCH: each query probes its ``n_probe`` nearest cells, then
      exact cosine re-ranks only those cells' vectors — an equi-join on
      cell_id instead of a full cross join, cutting scanned vectors to
      ~n_probe/n_cells of the corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.sdf.select(F.col(id_col).alias("match_id"),
                          F.col(vec_col).cast("array<double>").alias("c_vec"))
    train = c.sample(fraction=sample_fraction, seed=seed) if sample_fraction < 1.0 else c
    km = KMeans(k=n_cells, seed=seed, featuresCol="_feat", predictionCol="cell_id")
    model = km.fit(train.select(array_to_vector("c_vec").alias("_feat")))

    centroids = [[float(x) for x in ctr] for ctr in model.clusterCenters()]
    spark = corpus.sdf.sparkSession
    cent_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(centroids)], "cell_id int, centroid array<double>")

    # corpus assignment: broadcast NL join against the tiny centroid table,
    # argmin by euclidean — one shuffle-free pass over the corpus
    def _l2(a: Column, b: Column) -> Column:
        return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                           F.lit(0.0), lambda acc, v: acc + v)

    w_c = W.partitionBy("match_id").orderBy(F.col("_d").asc(), F.col("cell_id"))
    assigned = (c.crossJoin(F.broadcast(cent_df))
                .withColumn("_d", _l2(F.col("c_vec"), F.col("centroid")))
                .withColumn("_r", F.row_number().over(w_c))
                .filter(F.col("_r") == 1)
                .select("cell_id", "match_id", "c_vec"))

    q = queries.sdf.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).cast("array<double>").alias("q_vec"))
    w_q = W.partitionBy("query_id").orderBy(F.col("_d").asc(), F.col("cell_id"))
    probed = (q.crossJoin(F.broadcast(cent_df))
              .withColumn("_d", _l2(F.col("q_vec"), F.col("centroid")))
              .withColumn("_r", F.row_number().over(w_q))
              .filter(F.col("_r") <= n_probe)
              .select("query_id", "q_vec", "cell_id"))

    scored = (probed.join(assigned, on="cell_id", how="inner")
              .filter(F.col("query_id") != F.col("match_id"))
              .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec"))))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("match_id"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "match_id", "cos", "rank"))
    return Frame(out)


def embedding_near_dups(corpus: Frame, threshold: float = 0.95, dim: int = 64,
                        n_planes: int = 12, id_col: str = "vec_id",
                        vec_col: str = "embedding", seed: int = 42) -> Frame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold), LSH-bucketed
    so the pair generation is linear, then exactly verified."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = corpus.sdf.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")) \
        .withColumn("bucket", bucket_expr("v", planes))
    a, b = v.alias("a"), v.alias("b")
    pairs = (a.join(b, on="bucket", how="inner")
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .withColumn("cos", cosine(F.col("a.v"), F.col("b.v")))
             .filter(F.col("cos") >= threshold)
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"), "cos")
             .dropDuplicates(["id_a", "id_b"]))
    return Frame(pairs)
