"""Sequence packing and dataset-mixing sampling for training-data
pipelines (beyond-reference: the reference has no training-export
operators; these complete the LLM-pipeline story alongside dedup /
similarity / text).

Scale notes are per-operator; the common theme is partition-local
decisions — packing and sampling never need global coordination beyond
one small aggregate, so nothing here shuffles the corpus more than
once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..frame import Frame

# bin ids are (partition_id << _PART_SHIFT) | local_bin — collision-free
# as long as no partition packs more than 2^40 bins
_PART_SHIFT = 40


def pack_sequences(f: Frame, id_col: str, size_col: str,
                   budget: int) -> Frame:
    """Assign documents to fixed-token-budget bins (sequence packing for
    training batches): greedy next-fit over each partition's arrival
    order. Returns (id, size, bin_id, bin_fill).

    Scale shape: packing is PARTITION-LOCAL — each Arrow batch stream
    packs independently and bin ids are namespaced by partition id, so
    there is no shuffle at all; the cost is one scan. Partition-local
    packing is the standard distributed compromise: a global greedy
    order would serialize the corpus for marginal fill improvement.
    Oversized docs (size > budget) get a bin of their own (callers
    typically chunk or drop them first). Null sizes pack at cost 0
    (they'd otherwise arrive as NaN in the Arrow batch and crash the
    kernel — filter them upstream if zero-cost is wrong for you).

    py kernel note: next-fit (close the bin when the next doc doesn't
    fit) rather than first-fit-decreasing — O(n), no per-bin search
    structure, and fill stays >50% for doc sizes << budget."""
    if budget <= 0:
        raise ValueError(f"pack_sequences: budget must be positive, got {budget}")
    import numpy as np
    import pandas as pd

    src = f.sdf.select(F.col(id_col),
                       F.coalesce(F.col(size_col).cast("long"), F.lit(0))
                       .alias("__sz__"),
                       F.spark_partition_id().alias("__pid__"))

    def kernel(batches):
        # state persists across Arrow batches of the same partition
        local_bin, fill = 0, 0
        for pdf in batches:
            ids, sizes, pids = pdf[id_col].to_numpy(), pdf["__sz__"].to_numpy(), pdf["__pid__"].to_numpy()
            bins, fills = [], []
            for s in sizes:
                s = int(s)
                if fill > 0 and fill + s > budget:
                    local_bin += 1
                    fill = 0
                fill += s
                bins.append(local_bin)
                fills.append(fill)
            yield pd.DataFrame({
                id_col: ids, "size": sizes,
                "bin_id": (pids.astype("int64") << _PART_SHIFT)
                | np.array(bins, dtype="int64"),
                "bin_fill": fills})

    id_type = dict(f.sdf.dtypes)[id_col]
    out = src.mapInPandas(
        kernel,
        schema=f"{id_col} {id_type}, size long, bin_id long, bin_fill long")
    return Frame(out)


def stratified_sample(f: Frame, strata_col: str, fractions: dict,
                      seed: int | None = None, exact: bool = True) -> Frame:
    """Dataset-mixing sampler: keep a per-stratum fraction of rows
    (e.g. {"web": 0.1, "code": 1.0, "wiki": 0.5}). Strata absent from
    ``fractions`` are dropped (fraction 0), matching sampleBy.

    exact=False → ``df.sampleBy``: one scan, no shuffle, per-row
    Bernoulli — the 100 TB path (counts are only approximate).
    exact=True → exact per-stratum counts round(n * frac) via a
    per-stratum shuffled row_number window — one shuffle on the strata
    key; strata must be few relative to partitions (mixing weights, not
    high-cardinality keys). Skewed strata sizes are AQE's problem, and
    per-stratum windows parallelize across strata."""
    bad = {k: v for k, v in fractions.items() if not 0.0 <= float(v) <= 1.0}
    if bad:
        raise ValueError(f"stratified_sample: fractions outside [0,1]: {bad}")
    if not exact:
        return Frame(f.sdf.sampleBy(strata_col, fractions, seed=seed))
    from pyspark.sql import Window as W

    frac_map = F.create_map(*[F.lit(x) for kv in fractions.items() for x in kv])
    rnd = F.rand(seed) if seed is not None else F.rand()
    w = W.partitionBy(strata_col).orderBy(F.col("__r__"))
    out = (f.sdf
           .withColumn("__f__", F.coalesce(frac_map[F.col(strata_col)], F.lit(0.0)))
           .withColumn("__n__", F.count(F.lit(1)).over(W.partitionBy(strata_col)))
           .withColumn("__r__", rnd)
           .withColumn("__rn__", F.row_number().over(w))
           .filter(F.col("__rn__") <= F.round(F.col("__n__") * F.col("__f__")))
           .drop("__f__", "__n__", "__r__", "__rn__"))
    return Frame(out)
