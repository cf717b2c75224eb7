"""Similarity search over embedding columns (array<float>).

Paths, slow→fast→approximate:

- Column-expression dot/cosine (``F.zip_with`` + ``F.aggregate``): no
  Python, but higher-order lambdas evaluate interpreted per element —
  fine for one-off scoring, wrong for N×M scoring loops.
- Arrow-vectorized kernels (``mapInPandas`` + numpy): each partition's
  vectors become ONE matrix and all queries/planes/centroids are
  scored with a single BLAS matmul. This is the sanctioned Python path
  (batched columnar transfer, no per-row overhead) and what
  brute_force_topk / lsh buckets / ivf assignment use.
- lsh_topk / ivf_topk: sublinear candidate generation (bucket equi-join
  / probed cells), exact re-rank inside candidates — the 100 TB path.

Scale shape of brute_force_topk: queries broadcast to every partition
(small |Q| by contract), each partition emits only its LOCAL top-k per
query (k·|Q| rows per partition), and one tiny shuffle merges global
top-k. The corpus is never shuffled.

Embedding-cosine near-dup detection reuses the LSH machinery
(pairs with cosine >= threshold).
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
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
    match_id for determinism.

    Execution: queries (small by contract) are collected and broadcast;
    each corpus partition scores ALL queries with one numpy matmul
    inside mapInPandas and emits only its local top-k rows per query,
    so the merge shuffle carries ≤ k·|Q| rows per partition no matter
    the corpus size."""
    q_rows = queries.sdf.select(F.col(id_col).alias("qid"),
                                F.col(vec_col).cast("array<double>").alias("v")) \
        .collect()
    if not q_rows:
        spark = corpus.sdf.sparkSession
        return Frame(spark.createDataFrame(
            [], "query_id bigint, match_id bigint, cos double, rank int"))
    q_ids = np.array([r.qid for r in q_rows])
    q_mat = np.array([r.v for r in q_rows], dtype=np.float64)        # |Q| × dim
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = np.inf  # zero query vector → cos 0 everywhere
    sc = corpus.sdf.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat, q_norm, k))

    def local_topk(batches):
        ids, mat, norms, kk = bq.value
        for pdf in batches:
            c_mat = np.array(pdf["c_vec"].tolist(), dtype=np.float64)  # B × dim
            c_norm = np.linalg.norm(c_mat, axis=1)
            c_norm[c_norm == 0] = np.inf
            sims = (c_mat @ mat.T) / np.outer(c_norm, norms)           # B × |Q|
            out = []
            match_ids = pdf["match_id"].to_numpy()
            for qi, qid in enumerate(ids):
                col = sims[:, qi]
                mask = match_ids != qid
                cand = np.nonzero(mask)[0]
                if len(cand) == 0:
                    continue
                take = min(kk, len(cand))
                top = cand[np.argpartition(-col[cand], take - 1)[:take]]
                out.append(pd.DataFrame({
                    "query_id": qid, "match_id": match_ids[top],
                    "cos": col[top]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    c = corpus.sdf.select(F.col(id_col).alias("match_id"),
                          F.col(vec_col).cast("array<double>").alias("c_vec"))
    local = c.mapInPandas(local_topk,
                          schema="query_id bigint, match_id bigint, cos double")
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("match_id"))
    out = (local.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "match_id", "cos", "rank"))
    return Frame(out)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def bucket_expr(vec_col, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from fixed hyperplanes — one int per vector.
    Column-expression form for ad-hoc use; pipelines use the
    Arrow-vectorized ``with_buckets`` (one matmul per batch)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        proj = dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def with_buckets(sdf, vec_col: str, planes: list[list[float]],
                 out_col: str = "bucket"):
    """Append the hyperplane sign-bit bucket id, computed per Arrow batch
    as one ``batch @ planes.T`` matmul (numpy) — identical bits to
    ``bucket_expr`` at a fraction of the cost. Projections exactly on a
    hyperplane (proj == 0) count as sign 0, matching ``proj > 0``."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    plane_mat = np.array(planes, dtype=np.float64)              # P × dim
    weights = (1 << np.arange(len(planes))).astype(np.int64)
    # copy: StructType.add mutates the DataFrame's cached schema in place
    schema = StructType(sdf.schema.fields + [StructField(out_col, IntegerType())])
    cols = list(sdf.columns)

    def kernel(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            proj = mat @ plane_mat.T                            # B × P
            pdf = pdf[cols].copy()
            pdf[out_col] = ((proj > 0).astype(np.int64) @ weights).astype("int32")
            yield pdf

    return sdf.mapInPandas(kernel, schema=schema)


def lsh_topk(corpus: Frame, queries: Frame, k: int = 5, dim: int = 64,
             n_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", multiprobe: bool = True,
             seed: int = 42) -> Frame:
    """Approximate cosine top-k: hyperplane-LSH bucket join + exact
    re-rank inside buckets. multiprobe=True also probes all buckets at
    hamming distance 1, trading 9× candidate volume for recall."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = with_buckets(
        corpus.sdf.select(F.col(id_col).alias("match_id"),
                          F.col(vec_col).cast("array<double>").alias("c_vec")),
        "c_vec", planes)
    q = with_buckets(
        queries.sdf.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).cast("array<double>").alias("q_vec")),
        "q_vec", planes, out_col="bucket0")
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
             sample_fraction: float = 1.0, max_iter: int = 8) -> Frame:
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
    # an ANN index only needs rough cells — capped iterations (default 8
    # vs ml's 20): recall comes from n_probe + exact re-rank, not from
    # fully-converged centroids
    km = KMeans(k=n_cells, seed=seed, maxIter=max_iter,
                featuresCol="_feat", predictionCol="cell_id")
    model = km.fit(train.select(array_to_vector("c_vec").alias("_feat")))

    cent_mat = np.array([[float(x) for x in ctr]
                         for ctr in model.clusterCenters()], dtype=np.float64)
    sc = corpus.sdf.sparkSession.sparkContext
    bc = sc.broadcast(cent_mat)

    # assignment/probing: ||v-c||² = ||v||² − 2·v·c + ||c||², and ||v||²
    # is constant per row, so argmin/argsort over (−2·v·C.T + ||C||²) —
    # one matmul per Arrow batch, shuffle-free map-side pass
    def _cells(batches, n_out: int, vcol: str):
        for pdf in batches:
            cm = bc.value
            c_norm2 = (cm * cm).sum(axis=1)
            mat = np.array(pdf[vcol].tolist(), dtype=np.float64)
            d = -2.0 * (mat @ cm.T) + c_norm2                      # B × cells
            if n_out == 1:
                cells = d.argmin(axis=1).astype("int32")
                out = pdf.copy()
                out["cell_id"] = cells
                yield out
            else:
                near = np.argsort(d, axis=1)[:, :n_out].astype("int32")
                reps = []
                for j in range(n_out):
                    rep = pdf.copy()
                    rep["cell_id"] = near[:, j]
                    reps.append(rep)
                yield pd.concat(reps, ignore_index=True)

    from pyspark.sql.types import IntegerType, StructField, StructType

    assigned = c.mapInPandas(
        lambda it: _cells(it, 1, "c_vec"),
        schema=StructType(c.schema.fields + [StructField("cell_id", IntegerType())]))

    q = queries.sdf.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).cast("array<double>").alias("q_vec"))
    probed = q.mapInPandas(
        lambda it: _cells(it, n_probe, "q_vec"),
        schema=StructType(q.schema.fields + [StructField("cell_id", IntegerType())]))

    scored = (probed.join(assigned, on="cell_id", how="inner")
              .filter(F.col("query_id") != F.col("match_id"))
              .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec"))))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("match_id"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "match_id", "cos", "rank"))
    return Frame(out)


def with_bucket_tables(sdf, vec_col: str, tables: list[list[list[float]]],
                       out_col: str = "buckets"):
    """Append ``array<int>`` of per-table hyperplane bucket ids. The
    planes of EVERY table are stacked into one matrix, so all tables
    are scored with a single matmul per Arrow batch — T tables cost
    the same scan as one."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    all_planes = np.array([p for t in tables for p in t], dtype=np.float64)
    sizes = [len(t) for t in tables]
    offsets = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    schema = StructType(sdf.schema.fields
                        + [StructField(out_col, ArrayType(IntegerType()))])
    cols = list(sdf.columns)

    def kernel(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (mat @ all_planes.T) > 0                        # B × ΣP
            outs = [(bits[:, o:o + s].astype(np.int64)
                     @ (1 << np.arange(s)).astype(np.int64)).astype("int32")
                    for o, s in zip(offsets, sizes)]
            pdf = pdf[cols].copy()
            pdf[out_col] = list(np.stack(outs, axis=1))
            yield pdf

    return sdf.mapInPandas(kernel, schema=schema)


def embedding_near_dups(corpus: Frame, threshold: float = 0.95, dim: int = 64,
                        n_planes: int = 12, n_tables: int = 4,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding", seed: int = 42) -> Frame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold):
    LSH-bucketed pair generation, exactly verified.

    OR-construction over ``n_tables`` independent hyperplane sets: a
    pair is a candidate if it shares the full bucket in ANY table. A
    single AND-composed table misses 1 − p^P of true pairs (p =
    1 − θ/π; ≈23% at cos 0.995 with P=8 planes); with T tables the
    miss rate drops to (1 − p^P)^T — ≈0.3% at T=4, tunable to any
    recall target. Candidate volume grows only linearly in T, bucket
    computation stays one matmul (tables stacked), and every candidate
    is exactly verified so false collisions cost join width only."""
    tables = [_hyperplanes(dim, n_planes, seed + 7919 * t)
              for t in range(n_tables)]
    v = with_bucket_tables(
        corpus.sdf.select(F.col(id_col),
                          F.col(vec_col).cast("array<double>").alias("v")),
        "v", tables)
    banded = v.select(id_col, "v",
                      F.posexplode("buckets").alias("table_id", "bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    # Dedup (id_a, id_b) BEFORE the cosine verify: a pair colliding in
    # several tables must pay the interpreted-HOF cosine once, not once
    # per table (verify is the hot path; candidates are linear in T).
    pairs = (a.join(b, on=["table_id", "bucket"], how="inner")
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
             .dropDuplicates(["id_a", "id_b"])
             .withColumn("cos", cosine(F.col("va"), F.col("vb")))
             .filter(F.col("cos") >= threshold)
             .select("id_a", "id_b", "cos"))
    return Frame(pairs)


def rrf_fuse(rankings, id_col: str = "doc_id", rank_col: str = "rank",
             k0: int = 60, top_k: int | None = None) -> Frame:
    """Reciprocal Rank Fusion of N retrieval rankings (Cormack, Clarke
    & Buettcher, SIGIR 2009): the standard hybrid-retrieval combiner —
    fuse a lexical (BM25) list with a dense (embedding-cosine) list
    without score calibration, since only RANKS enter the formula
    ``rrf(d) = Σ_lists 1 / (k0 + rank_list(d))``.

    Each input is a Frame/DataFrame carrying ``(id_col, rank_col)``
    with ranks 1..N_i (the output shape of
    :func:`brute_force_topk` / a ranked
    :func:`~crysda_spark.pipeline.text.bm25_search`). Returns
    ``(id, n_lists, rrf, rank)`` ordered by fused score, id-tiebroken.

    Determinism: each list contributes at most one term per id —
    ENFORCED (r14 advice), not assumed: if an input ranking carries
    duplicate ids, only its best (lowest) rank counts, and ``n_lists``
    counts distinct LISTS, never duplicate rows. The per-id sum folds
    contributions in LIST-INDEX order (struct array sorted by
    (list, contrib desc) → F.aggregate with a skip-repeated-list
    accumulator), so the double result is bit-identical on every
    engine and partitioning — 1/(k0+rank) is a single
    correctly-rounded IEEE division of exact integers.

    Scale shape: inputs are top-N-bounded by contract (a retrieval
    list, not a corpus), so the union carries ≤ Σ N_i rows, the fuse
    is one tiny groupBy, and the global rank window over the fused
    candidate set is bounded — this operator never touches corpus
    width; the heavy lifting happened inside the per-list retrievers.
    """
    if not rankings:
        raise ValueError("rrf_fuse: at least one ranking required")
    if k0 < 1:
        raise ValueError(f"rrf_fuse: k0 must be >= 1, got {k0}")
    tagged = None
    for i, r in enumerate(rankings):
        sdf = r.sdf if hasattr(r, "sdf") else r
        part = sdf.select(
            F.col(id_col), F.lit(i).alias("_src"),
            (F.lit(1.0) / (F.lit(float(k0))
                           + F.col(rank_col).cast("double")))
            .alias("_contrib"))
        tagged = part if tagged is None else tagged.unionByName(part)
    # sort (src asc, contrib desc) so the FIRST row of each list-run is
    # that list's best rank; the fold then skips repeated-src rows —
    # duplicate ids within one ranking contribute exactly one term
    # (their best), with zero extra shuffle vs a per-list dropDuplicates
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("_src"), F.col("_contrib"))),
        lambda a, b: F.when(a["_src"] < b["_src"], F.lit(-1))
        .when(a["_src"] > b["_src"], F.lit(1))
        .when(a["_contrib"] > b["_contrib"], F.lit(-1))
        .when(a["_contrib"] < b["_contrib"], F.lit(1))
        .otherwise(F.lit(0)))
    zero = F.struct(F.lit(0.0).alias("s"), F.lit(-1).alias("p"),
                    F.lit(0).alias("nl"))
    folded = F.aggregate(
        arr, zero,
        lambda acc, s: F.struct(
            F.when(s["_src"] != acc["p"],
                   acc["s"] + s["_contrib"]).otherwise(acc["s"]).alias("s"),
            s["_src"].alias("p"),
            F.when(s["_src"] != acc["p"],
                   acc["nl"] + F.lit(1)).otherwise(acc["nl"]).alias("nl")))
    fused = (tagged.groupBy(id_col)
             .agg(folded.alias("_f"))
             .select(id_col, F.col("_f.nl").cast("long").alias("n_lists"),
                     F.col("_f.s").alias("rrf")))
    rank = F.row_number().over(
        W.orderBy(F.col("rrf").desc(), F.col(id_col)))
    out = fused.withColumn("rank", rank)
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return Frame(out)
