"""Distributed embedding clustering + semantic deduplication.

Implements the SemDeDup shape (Abbas et al., arXiv:2303.09540): k-means
the corpus into cells, then deduplicate WITHIN each cell by pairwise
cosine similarity, keeping one representative per near-duplicate group.
The reference engine has no embedding support anywhere in
``/root/reference/src`` — this is beyond-reference pipeline surface,
designed for the 100 TB training-data case:

- k-means TRAINS on a bounded sample (``pyspark.ml`` KMeans), so
  training cost is decoupled from corpus size;
- ASSIGNMENT broadcasts the (k × dim) centroid matrix and is one
  Arrow-batched map-side matmul — the corpus shuffles ONCE, on cell id;
- WITHIN-CELL dedup is ``applyInPandas`` per cell: exact pairwise for
  bounded cells, hyperplane-LSH candidate generation (exact verify)
  for cells past ``max_exact_cell`` — never O(N²) across cells.

Cell sizes average N/k; pick ``n_cells`` ∝ corpus size (the SemDeDup
paper uses 50k cells for LAION-440M) so cells stay Arrow-batch sized.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, DoubleType, IntegerType, LongType, StructField, StructType)

from ..frame import Frame

__all__ = ["kmeans_centroids", "assign_cells", "nearest_centroid_expr",
           "semantic_dedup", "semantic_survivors"]


# --------------------------------------------------------------- k-means
def kmeans_centroids(corpus: Frame, n_cells: int, vec_col: str = "embedding",
                     sample_fraction: float = 1.0, seed: int = 42,
                     max_iter: int = 20, normalize: bool = False) -> np.ndarray:
    """Train k-means and return the (n_cells × dim) centroid matrix.

    ``normalize=True`` L2-normalizes training vectors first (spherical
    k-means approximation — Euclidean on the unit sphere orders pairs
    exactly like cosine), which is what ``semantic_dedup`` wants.
    Training runs on a ``sample_fraction`` sample: at corpus scale the
    centroids only need to partition space, not see every row.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = F.col(vec_col).cast("array<double>")
    if normalize:
        nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
        v = F.transform(v, lambda x: x / nrm)
    train = corpus.sdf.select(v.alias("_vec"))
    if sample_fraction < 1.0:
        train = train.sample(fraction=sample_fraction, seed=seed)
    if n_cells == 1:
        # ml.KMeans requires k ≥ 2; the single centroid is just the mean
        mean = (train.select(F.posexplode("_vec").alias("_d", "_v"))
                .groupBy("_d").agg(F.avg("_v").alias("_m"))
                .orderBy("_d").collect())
        return np.array([[r["_m"] for r in mean]], dtype=np.float64)
    km = KMeans(k=n_cells, seed=seed, maxIter=max_iter,
                featuresCol="_feat", predictionCol="_cell")
    model = km.fit(train.select(array_to_vector("_vec").alias("_feat")))
    return np.array([[float(x) for x in c] for c in model.clusterCenters()],
                    dtype=np.float64)


def assign_cells(corpus: Frame, centroids: np.ndarray, vec_col: str = "embedding",
                 out_col: str = "cell", normalize: bool = False) -> Frame:
    """Map-side nearest-centroid assignment: broadcast the centroid
    matrix, one ``||v−c||² = ||v||² − 2·v·c + ||c||²`` matmul per Arrow
    batch (same identity as similarity.ivf_topk), zero shuffle. Ties
    break toward the lower cell id (stable across runs)."""
    if out_col in corpus.columns:
        raise ValueError(f"assign_cells: column {out_col!r} already exists")
    sdf = corpus.sdf
    bc = sdf.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(centroids, dtype=np.float64))
    schema = StructType(list(sdf.schema.fields)
                        + [StructField(out_col, IntegerType(), False)])

    def kernel(batches):
        cm = bc.value
        c_norm2 = (cm * cm).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if normalize:
                n = np.linalg.norm(mat, axis=1, keepdims=True)
                mat = mat / np.where(n == 0.0, 1.0, n)
            d = -2.0 * (mat @ cm.T) + c_norm2            # B × k, + ||v||² const
            pdf = pdf.copy()
            # np.argmin returns the FIRST minimal index → low-id tie-break
            pdf[out_col] = d.argmin(axis=1).astype("int32")
            yield pdf

    return Frame(sdf.mapInPandas(kernel, schema=schema))


def nearest_centroid_expr(vec_col, centroids, round_decimals: int = 4):
    """Pure-JVM nearest-centroid assignment against a FIXED centroid
    list — the declarative (codegen, UDF-free) twin of ``assign_cells``
    for small k. Distances are rounded before the argmin and ties break
    toward the lower centroid index, so the expression is reproducible
    across engines (the SQL-oracle contract).

    Returns a Column: the winning centroid's index (int).
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = v.cast("array<double>")
    ranked = []
    for i, ctr in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in ctr])
        d2 = F.aggregate(F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
                         F.lit(0.0), lambda acc, x: acc + x)
        ranked.append(F.struct(F.round(F.sqrt(d2), round_decimals).alias("d"),
                               F.lit(i).alias("i")))
    # sort_array orders structs field-by-field: (distance, index) asc
    return F.sort_array(F.array(*ranked))[0]["i"]


# ---------------------------------------------------------------- SemDeDup
_ASSIGN_FIELDS = [
    StructField("cell", IntegerType(), False),
    StructField("is_survivor", BooleanType(), False),
    StructField("survivor_id", LongType(), False),
    StructField("sim_to_survivor", DoubleType(), False),
]


def _greedy_keep(ids: np.ndarray, mat: np.ndarray, order: np.ndarray,
                 threshold: float, cand: dict[int, list[int]] | None):
    """Priority-order greedy leader pass over ONE cell.

    Rows are visited in ``order``; a row is a duplicate iff its cosine
    similarity to some ALREADY-KEPT row reaches ``threshold`` (it maps
    to the most-similar kept row). With ``cand`` (LSH mode) only
    candidate edges are checked — same greedy, bounded compute.
    Returns (is_survivor, survivor_pos, sim) arrays aligned to rows.
    """
    n = len(ids)
    keep = np.zeros(n, dtype=bool)
    surv = np.arange(n)
    sim_out = np.ones(n)
    kept_pos: list[int] = []
    for pos in order:
        if cand is None:
            checks = kept_pos
        else:
            checks = [p for p in cand.get(pos, ()) if keep[p]]
        if checks:
            sims = mat[checks] @ mat[pos]
            j = int(np.argmax(sims))
            if sims[j] >= threshold:
                surv[pos] = checks[j]
                sim_out[pos] = float(sims[j])
                continue
        keep[pos] = True
        kept_pos.append(pos)
    return keep, surv, sim_out


def _lsh_candidates(mat: np.ndarray, n_tables: int, n_bits: int,
                    seed: int) -> dict[int, list[int]]:
    """OR-construction hyperplane buckets within one oversized cell:
    rows sharing any table's bucket become candidate neighbors. Same
    construction as similarity.embedding_near_dups, but cell-local."""
    rng = np.random.default_rng(seed)
    n, dim = mat.shape
    cand: dict[int, set[int]] = {}
    for _ in range(n_tables):
        planes = rng.standard_normal((dim, n_bits))
        keys = (mat @ planes > 0.0) @ (1 << np.arange(n_bits))
        buckets: dict[int, list[int]] = {}
        for pos, key in enumerate(keys):
            buckets.setdefault(int(key), []).append(pos)
        for members in buckets.values():
            if len(members) < 2:
                continue
            for p in members:
                cand.setdefault(p, set()).update(members)
    return {p: sorted(s - {p}) for p, s in cand.items()}


def semantic_dedup(corpus: Frame, n_cells: int = 16, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   sample_fraction: float = 1.0, seed: int = 42,
                   keep: str = "far", max_exact_cell: int = 8192,
                   lsh_tables: int = 8, lsh_bits: int = 12,
                   kmeans_max_iter: int = 20) -> Frame:
    """SemDeDup: spherical k-means cells → within-cell cosine dedup.

    Returns one row per input row: ``(id, cell, is_survivor,
    survivor_id, sim_to_survivor)`` — duplicates point at the kept row
    they collapsed into (``sim_to_survivor`` = that cosine).

    Keep policy (deterministic): visit rows by ``keep`` priority —
    ``"far"`` keeps low-similarity-to-centroid rows first (the SemDeDup
    paper's choice: prefer atypical examples), ``"near"`` the reverse —
    with id ascending as tie-break. A row collapses into the
    MOST-SIMILAR already-kept row at ≥ ``threshold``.

    Cells past ``max_exact_cell`` rows switch from exact pairwise to
    hyperplane-LSH candidate generation (OR over ``lsh_tables``
    tables) with exact verification — recall on candidates only, so a
    degenerate giant cell cannot go quadratic.
    """
    if keep not in ("far", "near"):
        raise ValueError(f"semantic_dedup: keep must be far|near, got {keep!r}")
    # cells only PARTITION the space — dedup correctness comes from the
    # within-cell verification, so capped iterations (like ivf_topk) are
    # a pure speed knob
    centroids = kmeans_centroids(corpus, n_cells, vec_col=vec_col,
                                 sample_fraction=sample_fraction, seed=seed,
                                 max_iter=kmeans_max_iter, normalize=True)
    cm = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True),
                                1e-12)
    slim = corpus.sdf.select(F.col(id_col).cast("long").alias("id"), vec_col)
    assigned = assign_cells(Frame(slim), centroids, vec_col=vec_col,
                            out_col="cell", normalize=True)
    bc = slim.sparkSession.sparkContext.broadcast(cm)
    schema = StructType([StructField("id", LongType(), False), *_ASSIGN_FIELDS])
    keep_far = keep == "far"

    def dedup_cell(pdf):
        import pandas as pd
        pdf = pdf.sort_values("id").reset_index(drop=True)  # deterministic base
        ids = pdf["id"].to_numpy()
        mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(n == 0.0, 1.0, n)
        cell = int(pdf["cell"].iloc[0])
        c_sim = mat @ bc.value[cell]
        order = np.lexsort((ids, c_sim if keep_far else -c_sim))
        cand = None
        if len(ids) > max_exact_cell:
            cand = _lsh_candidates(mat, lsh_tables, lsh_bits, seed + cell)
        kept, surv, sims = _greedy_keep(ids, mat, order, threshold, cand)
        return pd.DataFrame({
            "id": ids, "cell": np.int32(cell), "is_survivor": kept,
            "survivor_id": ids[surv], "sim_to_survivor": sims})

    out = assigned.sdf.groupBy("cell").applyInPandas(dedup_cell, schema=schema)
    return Frame(out)


def semantic_survivors(corpus: Frame, id_col: str = "vec_id", **kwargs) -> Frame:
    """Corpus rows that survive ``semantic_dedup`` — join back on id so
    callers keep their full row payload (the survivors table is what a
    training pipeline actually reads next)."""
    marks = semantic_dedup(corpus, id_col=id_col, **kwargs)
    keep_ids = marks.filter(F.col("is_survivor")).sdf.select("id")
    return Frame(corpus.sdf.join(keep_ids,
                                 corpus.sdf[id_col] == keep_ids["id"],
                                 "left_semi"))
