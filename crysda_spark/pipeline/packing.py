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


def ordered_cumsum(f: Frame, order_by, value_col: str, out_col: str = "cum",
                   num_partitions: int | None = None) -> Frame:
    """EXACT global running sum over a total order — WITHOUT the
    single-reducer global window that ``Frame.cumsum`` (reference-parity
    semantics) requires. The classic two-phase shape:

    1. range-repartition on the order key(s) and pin the partition
       assignment (persist — spark_partition_id must agree between the
       two passes);
    2. per-partition totals → driver (BOUNDED collect: one row per
       partition, thousands at most) → exclusive prefix offsets
       broadcast back;
    3. per-partition window cumsum + offset. Each partition sorts and
       sums independently — full cluster parallelism, one corpus
       shuffle total.

    ``order_by`` must be a total order (include a unique tiebreak
    column): equal keys land in one partition under range partitioning,
    but their relative cumsum order would otherwise be undefined.
    Nulls in ``value_col`` count as 0."""
    from pyspark.sql import Window as W

    from ..plans.cache import pin
    sdf = f.sdf if hasattr(f, "sdf") else f
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    clash = {"__pid__", "__off__"} & set(sdf.columns)
    if clash:
        raise ValueError(
            f"ordered_cumsum: column(s) {sorted(clash)} collide with "
            "internal working columns — rename before calling")
    if out_col in sdf.columns:
        raise ValueError(
            f"ordered_cumsum: out_col {out_col!r} already exists — "
            "withColumn would silently overwrite it")
    n = num_partitions or int(
        sdf.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranged = pin(sdf.repartitionByRange(n, *[F.col(c) for c in order_cols])
                 .withColumn("__pid__", F.spark_partition_id()))
    totals = (ranged.groupBy("__pid__")
              .agg(F.sum(F.coalesce(F.col(value_col).cast("long"), F.lit(0)))
                   .alias("__t__"))
              .collect())  # bounded: one row per partition
    run, offsets = 0, {}
    for row in sorted(totals, key=lambda r: r["__pid__"]):
        offsets[row["__pid__"]] = run
        run += row["__t__"] or 0
    off_df = sdf.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid__ int, __off__ long")
    w = (W.partitionBy("__pid__")
         .orderBy(*[F.col(c) for c in order_cols])
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    out = (ranged.join(F.broadcast(off_df), on="__pid__")
           .withColumn(out_col,
                       F.sum(F.coalesce(F.col(value_col).cast("long"),
                                        F.lit(0))).over(w) + F.col("__off__"))
           .drop("__pid__", "__off__"))
    return Frame(out)


def shard_by_budget(f: Frame, order_by, size_col: str, budget: int,
                    shard_col: str = "shard") -> Frame:
    """Deterministic training-export sharding: walk the corpus in
    ``order_by`` order and start a new shard every ``budget`` tokens —
    shard = floor(exclusive_running_sum / budget), so every engine
    (and every re-run) cuts the corpus at identical points. Unlike
    ``pack_sequences`` (partition-local bins, maximum parallel fill)
    this gives globally contiguous, reproducibly numbered shards — the
    form training dataloaders and resumable exports want. Built on
    ``ordered_cumsum``; same scale story (one range shuffle + a
    per-partition-totals collect)."""
    if budget <= 0:
        raise ValueError(f"shard_by_budget: budget must be positive, got {budget}")
    cum = ordered_cumsum(f, order_by, size_col, out_col="__cum__")
    out = (cum.sdf
           .withColumn(shard_col,
                       F.floor((F.col("__cum__")
                                - F.coalesce(F.col(size_col).cast("long"),
                                             F.lit(0))) / budget)
                       .cast("long"))
           .drop("__cum__"))
    return Frame(out)


def sample_weighted(f: Frame, weight_col: str, n: int,
                    seed: int = 42, by: str | list[str] | None = None) -> Frame:
    """Weighted sampling WITHOUT replacement: keep ``n`` rows where a
    row's inclusion probability is proportional to ``weight_col`` —
    the quality-weighted data-mix draw (sample by model score instead
    of uniformly).

    Algorithm: Efraimidis & Spirakis 2006 — each row draws an
    exponential sort key ``−ln(u)/w`` and the n SMALLEST keys win;
    provably equivalent to sequential weighted draws, embarrassingly
    parallel, one top-n (per group with ``by``). Zero/negative/null
    weights never sample. Deterministic for a fixed seed.

    At scale the top-n is a window over the group (or a global
    rank for ``by=None`` — same TakeOrdered shape as any top-k);
    n must be small enough to collect per group into one partition's
    sort, which is what "take a sample" means.
    """
    if n < 0:
        raise ValueError(f"sample_weighted: n must be ≥ 0, got {n}")
    from pyspark.sql import Window as W

    w = F.col(weight_col).cast("double")
    # rand(seed) is deterministic per row position; clamp away exact 0
    u = F.greatest(F.rand(seed), F.lit(1e-12))
    key = F.when(w > 0, -F.log(u) / w)
    keys = [by] if isinstance(by, str) else list(by or [])
    win = (W.partitionBy(*keys) if keys else W.partitionBy()).orderBy(
        F.col("__k__").asc_nulls_last(), F.col("__u__"))
    out = (f.sdf.withColumn("__u__", u).withColumn("__k__", key)
           .withColumn("__rn__", F.row_number().over(win))
           .filter(F.col("__k__").isNotNull() & (F.col("__rn__") <= n))
           .drop("__u__", "__k__", "__rn__"))
    return Frame(out)


def mix_corpus(f: Frame, source_col: str, rates: dict[str, float],
               key_col: str, salt: int = 0, copy_col: str = "copy_n",
               default_rate: float = 1.0) -> Frame:
    """Deterministic domain mixing: resample every source to its
    target ``rate`` — the data-mix step that turns a raw corpus into a
    training distribution (the DoReMi / "The Pile" weighting shape,
    where domains are up- or down-weighted by a fixed factor).

    Rate semantics per row: ``n_copies = floor(rate) + (1 if
    bucket(key, salt) < frac(rate)·10000 else 0)`` — rates < 1
    downsample (hash-gated keep), rates > 1 upsample by integer
    repetition plus a hash-gated fractional copy, rate 0 drops the
    source. Sources absent from ``rates`` (and null sources) use
    ``default_rate``. The decision is a pure function of (key, salt)
    via the same portable Carter-Wegman bucket as
    :func:`~crysda_spark.pipeline.split.assign_splits` — identical
    rows survive identically on every run, engine, and partitioning,
    and any SQL engine can replay the arithmetic exactly (the
    value-level oracle shape; rand()-based mixing can't be audited).
    Output rows carry ``copy_col`` in 1..n_copies so downstream
    packing/shuffling can distinguish copies.

    Fractional rates quantize to 1/10000 (same as assign_splits).
    Expected output mass is Σ_source n_source·rate exactly in the
    infinite-key limit and within quantization otherwise.

    NULL keys: a null ``key_col`` has no bucket, so the fractional
    hash-gate reads null and the fractional copy never materializes —
    under a purely fractional rate (< 1) such rows DROP, under a rate
    ≥ 1 they keep exactly ``floor(rate)`` copies. Deterministic and
    conservative; impute keys upstream if null-keyed rows must
    participate in fractional sampling.

    Scale shape: one map-side stamp + an ``explode(sequence(...))``
    whose amplification is the rate itself — no shuffle, no state; a
    100 TB mix is one pass. Upsampling multiplies bytes, which is the
    caller's explicit intent (cap rates sensibly)."""
    from .split import _BUCKETS, split_bucket
    if copy_col in f.columns:
        raise ValueError(f"mix_corpus: column {copy_col!r} already exists")
    if source_col not in f.columns or key_col not in f.columns:
        missing = [c for c in (source_col, key_col) if c not in f.columns]
        raise ValueError(f"mix_corpus: unknown column(s) {missing}")

    def parts(rate: float) -> tuple[int, int]:
        if not (rate >= 0) or rate != rate or rate == float("inf"):
            raise ValueError(f"mix_corpus: rates must be finite and "
                             f">= 0, got {rate}")
        base = int(rate)
        frac_bp = round((rate - base) * _BUCKETS)
        if base + frac_bp == 0 and rate > 0:
            raise ValueError(f"mix_corpus: rate {rate} is below the "
                             f"1/{_BUCKETS} quantization")
        return base, frac_bp

    b = split_bucket(key_col, salt)

    def n_copies(rate: float):
        base, frac_bp = parts(rate)
        n = F.lit(base)
        if frac_bp:
            # null key -> null bucket: coalesce the gate to 0 so the
            # row keeps its floor(rate) copies instead of nulling the
            # whole count (see the NULL-keys docstring note)
            n = n + F.coalesce((b < frac_bp).cast("int"), F.lit(0))
        return n

    expr = None
    for name, rate in rates.items():
        cond = F.col(source_col) == name
        n = n_copies(rate)
        expr = F.when(cond, n) if expr is None else expr.when(cond, n)
    dflt = n_copies(default_rate)
    expr = dflt if expr is None else expr.otherwise(dflt)
    out = (f.sdf.withColumn("_n_copies", expr)
           .filter(F.col("_n_copies") > 0)
           .withColumn(copy_col,
                       F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
           .drop("_n_copies"))
    return Frame(out)
