"""Product quantization (PQ) for billion-scale vector search.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split each D-dim vector into ``m`` subspaces,
vector-quantize each subspace against its own ``2^nbits`` codebook,
and search with Asymmetric Distance Computation (ADC) — the query
stays exact, each corpus vector is m table lookups.

Why it matters at 100 TB: a 64-dim float32 vector is 256 bytes; its
m=8 / nbits=8 PQ code is 8 bytes — 32×. The encoded corpus often fits
where the raw vectors never could, and ADC scanning is memory-bandwidth
bound rather than FLOP bound. The Spark shapes:

- TRAIN on a bounded driver-side sample (deterministic numpy Lloyd's,
  fixed seed) — codebooks are m·2^nbits·(D/m) floats, kilobytes;
- ENCODE is one broadcast + mapInPandas argmin pass, ZERO shuffle;
- SEARCH broadcasts the query set (small by contract, as
  similarity.brute_force_topk) with per-query ADC lookup tables;
  each partition emits only its local top-k, so the merge shuffle
  carries ≤ k·|Q| rows per partition regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..frame import Frame

__all__ = ["pq_train", "pq_encode", "pq_topk"]


def _lloyd(x: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Deterministic numpy k-means for one subspace (driver-side on a
    bounded sample). Empty clusters re-seed to the point farthest from
    its centroid, keeping all k codes usable.

    Vectorized: distances via the matmul expansion (never an
    n×k×d temp), per-cluster means via bincount — the per-iteration
    cost is one GEMM + d bincounts, ~10× over the masked-loop form."""
    rng = np.random.default_rng(seed)
    if len(x) < k:
        raise ValueError(f"pq_train: sample has {len(x)} rows < {k} centroids"
                         " — lower nbits or raise the sample")
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    x_norm2 = (x * x).sum(axis=1)
    dims = x.shape[1]
    for _ in range(iters):
        d = -2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)
        assign = d.argmin(axis=1)
        counts = np.bincount(assign, minlength=k)
        sums = np.stack([np.bincount(assign, weights=x[:, c], minlength=k)
                         for c in range(dims)], axis=1)
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz, None]
        if not nz.all():
            # re-seed every empty cluster to the point farthest from its
            # assigned centroid (true squared distance needs the +||x||²
            # the argmin could drop)
            worst = (d[np.arange(len(x)), assign] + x_norm2).argmax()
            cents[~nz] = x[worst]
    return cents


def pq_train(corpus: Frame, m: int = 8, nbits: int = 8,
             vec_col: str = "embedding", sample_limit: int = 65536,
             seed: int = 42, iters: int = 20) -> np.ndarray:
    """Train PQ codebooks: returns an (m, 2^nbits, D/m) float64 array.

    The training sample is a bounded ``limit(sample_limit)`` collect —
    codebook quality needs thousands of points, not the corpus — so
    training cost is O(sample), independent of corpus size."""
    rows = (corpus.sdf.select(F.col(vec_col).cast("array<double>").alias("v"))
            .limit(sample_limit).collect())
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    if x.ndim != 2 or x.shape[1] % m:
        raise ValueError(f"pq_train: dim {x.shape[-1]} not divisible by m={m}")
    dsub = x.shape[1] // m
    k = 1 << nbits
    return np.stack([_lloyd(np.ascontiguousarray(x[:, j * dsub:(j + 1) * dsub]),
                            k, seed + j, iters) for j in range(m)])


def pq_encode(corpus: Frame, codebooks: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding", out_col: str = "pq_code") -> Frame:
    """Encode every vector to its m sub-codes (array<int>): broadcast
    codebooks, one argmin matmul per Arrow batch, zero shuffle."""
    m, k, dsub = codebooks.shape
    sdf = corpus.sdf
    bc = sdf.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(codebooks))

    def kernel(batches):
        cb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                sub = mat[:, j * dsub:(j + 1) * dsub]
                cj = cb[j]
                d = (-2.0 * (sub @ cj.T)
                     + (cj * cj).sum(axis=1))          # + ||sub||², constant
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], out_col: list(codes)})

    schema = f"id long, {out_col} array<int>"
    out = sdf.select(id_col, vec_col).mapInPandas(kernel, schema=schema)
    return Frame(out.withColumnRenamed("id", id_col))


def pq_topk(encoded: Frame, queries: Frame, codebooks: np.ndarray, k: int = 5,
            id_col: str = "vec_id", code_col: str = "pq_code",
            q_id_col: str = "vec_id", q_vec_col: str = "embedding") -> Frame:
    """ADC top-k: per query, build the (m × 2^nbits) squared-distance
    lookup table against the codebooks; every corpus code scores as m
    table gathers. Emits (query_id, match_id, adc_dist, rank), rank
    ascending by distance with match_id tie-break.

    Approximate by construction (quantization error); pair with an
    exact re-rank over the top candidates when exactness matters."""
    m, kk_codes, dsub = codebooks.shape
    q_rows = (queries.sdf.select(F.col(q_id_col).alias("qid"),
                                 F.col(q_vec_col).cast("array<double>").alias("v"))
              .collect())
    if not q_rows:
        spark = encoded.sdf.sparkSession
        return Frame(spark.createDataFrame(
            [], "query_id bigint, match_id bigint, adc_dist double, rank int"))
    q_ids = np.array([r.qid for r in q_rows])
    q_mat = np.array([r.v for r in q_rows], dtype=np.float64)
    # tables[q, j, c] = ||q_sub_j − codebook[j, c]||²
    tables = np.empty((len(q_ids), m, kk_codes))
    for j in range(m):
        sub = q_mat[:, j * dsub:(j + 1) * dsub]
        cj = codebooks[j]
        tables[:, j, :] = (-2.0 * (sub @ cj.T)
                           + (cj * cj).sum(axis=1)
                           + (sub * sub).sum(axis=1, keepdims=True))
    sc = encoded.sdf.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, tables, k))

    def local_topk(batches):
        ids, tabs, kkk = bq.value
        offs = np.arange(m) * tabs.shape[2]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(pdf[code_col].tolist(), dtype=np.int64) + offs
            match_ids = pdf["match_id"].to_numpy()
            flat = tabs.reshape(len(ids), -1)          # |Q| × (m·2^nbits)
            dists = flat[:, codes].sum(axis=2)         # |Q| × B
            out = []
            for qi, qid in enumerate(ids):
                col = dists[qi]
                mask = match_ids != qid
                cand = np.nonzero(mask)[0]
                if len(cand) == 0:
                    continue
                take = min(kkk, len(cand))
                top = cand[np.argpartition(col[cand], take - 1)[:take]]
                out.append(pd.DataFrame({
                    "query_id": qid, "match_id": match_ids[top],
                    "adc_dist": col[top]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    c = encoded.sdf.select(F.col(id_col).alias("match_id"), code_col)
    local = c.mapInPandas(
        local_topk, schema="query_id bigint, match_id bigint, adc_dist double")
    w = W.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("match_id"))
    out = (local.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "match_id", "adc_dist", "rank"))
    return Frame(out)


# ------------------------------------------------------------- IVF-PQ
def ivfpq_build(corpus: Frame, n_cells: int = 16, m: int = 8, nbits: int = 8,
                id_col: str = "vec_id", vec_col: str = "embedding",
                sample_limit: int = 65536, seed: int = 42):
    """Build an IVF-PQ index (the FAISS IVFPQ layout, Jégou 2011 §IV):
    coarse k-means cells + product quantization of the RESIDUAL
    (vector − cell centroid), which concentrates the quantizer on the
    within-cell distribution and cuts distortion vs flat PQ.

    Returns ``(encoded, centroids, codebooks)`` where ``encoded`` is a
    Frame (id, cell, pq_code) — the whole corpus reduced to an int +
    m sub-codes per row.

    Scale shape (the FAISS training recipe): BOTH quantizers — the
    coarse cells and the residual codebooks — train on ONE bounded
    driver-side sample (quantizer quality needs thousands of points,
    not the corpus), so training is a single ``limit().collect()``
    plus O(sample) numpy regardless of corpus size. Encode is ONE
    broadcast mapInPandas pass that computes cell, residual and
    sub-codes together — zero shuffle, no join — and the result is
    pinned (plans.cache) so the typical consume pattern (a gate
    collect plus a returned frame) materializes the scan once.
    """
    rows = (corpus.sdf.select(F.col(vec_col).cast("array<double>").alias("v"))
            .limit(sample_limit).collect())
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    if x.ndim != 2 or x.shape[1] % m:
        raise ValueError(
            f"ivfpq_build: dim {x.shape[-1]} not divisible by m={m}")
    dsub = x.shape[1] // m
    k = 1 << nbits
    cents = _lloyd(x, n_cells, seed)
    # assign the sample to its cells, train codebooks on the residuals
    d = -2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)
    res = x - cents[d.argmin(axis=1)]
    codebooks = np.stack([
        _lloyd(np.ascontiguousarray(res[:, j * dsub:(j + 1) * dsub]),
               k, seed + j) for j in range(m)])

    sdf = corpus.sdf
    bc = sdf.sparkSession.sparkContext.broadcast(
        (np.ascontiguousarray(cents), np.ascontiguousarray(codebooks)))

    def kernel(batches):
        cm, cb = bc.value
        c_norm2 = (cm * cm).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cell = (-2.0 * (mat @ cm.T) + c_norm2).argmin(axis=1)
            resid = mat - cm[cell]
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                sub = resid[:, j * dsub:(j + 1) * dsub]
                cj = cb[j]
                codes[:, j] = (-2.0 * (sub @ cj.T)
                               + (cj * cj).sum(axis=1)).argmin(axis=1)
            yield pd.DataFrame({"id": pdf[id_col],
                                "cell": cell.astype("int32"),
                                "pq_code": list(codes)})

    from ..plans.cache import pin
    enc = sdf.select(id_col, vec_col).mapInPandas(
        kernel, schema="id long, cell int, pq_code array<int>")
    return Frame(pin(enc)), cents, codebooks


def ivfpq_topk(encoded: Frame, centroids: np.ndarray, codebooks: np.ndarray,
               queries: Frame, k: int = 5, n_probe: int = 4,
               q_id_col: str = "vec_id", q_vec_col: str = "embedding") -> Frame:
    """IVF-PQ ADC search: each query probes its ``n_probe`` nearest
    cells; within a probed cell the residual ADC table (query −
    centroid vs residual codebooks) scores codes by m gathers. The
    cell filter is a map-side mask (no shuffle); each partition emits
    only its local top-k per query, so the merge carries ≤ k·|Q| rows
    per partition. Output: (query_id, match_id, adc_dist, rank)."""
    m, kk_codes, dsub = codebooks.shape
    q_rows = (queries.sdf.select(F.col(q_id_col).alias("qid"),
                                 F.col(q_vec_col).cast("array<double>").alias("v"))
              .collect())
    if not q_rows:
        spark = encoded.sdf.sparkSession
        return Frame(spark.createDataFrame(
            [], "query_id bigint, match_id bigint, adc_dist double, rank int"))
    q_ids = np.array([r.qid for r in q_rows])
    q_mat = np.array([r.v for r in q_rows], dtype=np.float64)
    # nearest n_probe cells per query (exact, driver-side — centroid
    # table is n_cells × dim, kilobytes)
    c_norm2 = (centroids * centroids).sum(axis=1)
    cd = -2.0 * (q_mat @ centroids.T) + c_norm2
    probe = np.argsort(cd, axis=1)[:, :n_probe]            # |Q| × n_probe
    # per (query, probed cell): ADC table over the RESIDUAL q − cent
    tables = {}
    for qi in range(len(q_ids)):
        for cell in probe[qi]:
            r = q_mat[qi] - centroids[cell]
            t = np.empty((m, kk_codes))
            for j in range(m):
                sub = r[j * dsub:(j + 1) * dsub]
                cj = codebooks[j]
                t[j] = ((cj - sub) ** 2).sum(axis=1)
            tables[(qi, int(cell))] = t.reshape(-1)
    sc = encoded.sdf.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, {qi: set(map(int, probe[qi]))
                               for qi in range(len(q_ids))}, tables, k, m,
                       kk_codes))

    def local_topk(batches):
        ids, probed, tabs, kkk, mm, wq = bq.value
        offs = np.arange(mm) * wq
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(pdf["pq_code"].tolist(), dtype=np.int64) + offs
            cells = pdf["cell"].to_numpy()
            match_ids = pdf["match_id"].to_numpy()
            out = []
            for qi, qid in enumerate(ids):
                mask = np.isin(cells, list(probed[qi])) & (match_ids != qid)
                cand = np.nonzero(mask)[0]
                if len(cand) == 0:
                    continue
                # one vectorized table-gather per probed cell (n_probe
                # gathers), never a per-row Python loop
                d = np.empty(len(cand))
                cand_cells = cells[cand]
                for cell in probed[qi]:
                    sel = np.nonzero(cand_cells == cell)[0]
                    if len(sel):
                        d[sel] = tabs[(qi, int(cell))][codes[cand[sel]]].sum(axis=1)
                take = min(kkk, len(cand))
                top = np.argpartition(d, take - 1)[:take]
                out.append(pd.DataFrame({
                    "query_id": qid, "match_id": match_ids[cand[top]],
                    "adc_dist": d[top]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    c = encoded.sdf.select(F.col("id").alias("match_id"), "cell", "pq_code")
    local = c.mapInPandas(
        local_topk, schema="query_id bigint, match_id bigint, adc_dist double")
    w = W.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("match_id"))
    out = (local.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "match_id", "adc_dist", "rank"))
    return Frame(out)


def pq_rerank(candidates: Frame, corpus: Frame, queries: Frame, k: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              q_id_col: str = "vec_id", q_vec_col: str = "embedding") -> Frame:
    """Exact re-rank of ADC candidates — the standard two-stage ANN
    recipe: generate a GENEROUS candidate set with pq_topk/ivfpq_topk
    (k' of 3-10× the final k), then join back ONLY those candidates'
    raw vectors (k'·|Q| rows — never the corpus) and score exact
    cosine against the broadcast queries in pure JVM expressions.
    Output: (query_id, match_id, cos, rank) — identical shape to
    similarity.brute_force_topk, and identical VALUES whenever the
    candidate set covers the true top-k."""
    q = F.broadcast(queries.sdf.select(
        F.col(q_id_col).alias("query_id"),
        F.col(q_vec_col).cast("array<double>").alias("_qv")))
    cand = (candidates.sdf.select("query_id", "match_id")
            .join(corpus.sdf.select(F.col(id_col).alias("match_id"),
                                    F.col(vec_col).cast("array<double>")
                                     .alias("_cv")),
                  on="match_id")
            .join(q, on="query_id"))
    dot = F.aggregate(F.zip_with("_qv", "_cv", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nq = F.sqrt(F.aggregate("_qv", F.lit(0.0), lambda a, x: a + x * x))
    nc = F.sqrt(F.aggregate("_cv", F.lit(0.0), lambda a, x: a + x * x))
    cos = F.when((nq > 0) & (nc > 0), dot / (nq * nc)).otherwise(0.0)
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                          F.col("match_id"))
    out = (cand.withColumn("cos", cos)
           .withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "match_id", "cos", "rank"))
    return Frame(out)
