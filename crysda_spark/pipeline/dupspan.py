"""Exact duplicate-span detection and removal (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the
suffix-array substring-dedup shape, re-expressed Spark-first).

Reference parity note: the reference engine has no substring-dedup
verb; this module is part of the beyond-reference LLM-pipeline surface
(SURVEY §2.11). ``text.dup_span_stats`` is the bounded word-n-gram
approximation; THIS is the exact character-level version: a character
position is "duplicated" iff it lies inside some substring of length
≥ ``min_len`` that occurs at least ``min_dup`` times corpus-wide
(counting every occurrence, including overlapping occurrences within
one document — the paper's semantics).

Why no suffix array: the paper builds one suffix array over the
concatenated corpus — a global sort, which in Spark IS a shuffle of
the whole corpus. The equivalent relational identity: a substring of
length ≥ L is duplicated iff every one of its L-char windows is
duplicated, and conversely every duplicated-window position lies
inside a duplicated substring of length ≥ L. So the UNION of
duplicated L-windows equals the UNION of duplicated substrings of
length ≥ L — EXACTLY (no approximation; this is the same identity that
makes the paper's "remove every duplicated span ≥ 50 chars" cut well-
defined). That turns substring dedup into hash-group-join:

1. one Arrow pass computes a rolling polynomial hash of every L-char
   window — O(chars) per partition via modular-inverse prefix sums in
   uint64 (B odd → invertible mod 2⁶⁴; numpy cumprod/cumsum wrap to
   exactly mod-2⁶⁴ arithmetic), NO shuffle;
2. the corpus-wide duplicate count shuffles (hash, id, pos) rows —
   16-byte keys, never text. This shuffle is the honest cost of exact
   substring dedup and is the SAME asymptotic a distributed
   suffix-array sort pays; everything after it touches only
   candidates;
3. candidates (hash count ≥ min_dup — rare) are EXACTLY verified by
   re-extracting the real substring (JVM-side ``substring``) and
   re-counting on the text itself, so hash collisions cannot create
   false spans (they only cost verify-join width) and the result is
   exact regardless of hash quality;
4. verified duplicated window positions merge per document into
   maximal spans with one gaps-and-islands window pass (positions
   p₁ < p₂ merge iff p₂ − p₁ ≤ L, i.e. the windows overlap or touch).

Scale shape at 100 TB: stage 1 is embarrassingly parallel; stage 2 is
one corpus-width shuffle of fixed-width rows with map-side-combinable
counting on the dup-filter side; stages 3-4 are candidate-sized.
Wider ``min_len`` lowers window count linearly. The per-doc span
merge partitions by doc id — no skew (a doc's windows ≤ its length).

Null/short handling: documents shorter than ``min_len`` produce no
windows (and therefore no spans); null texts are dropped from
windowing but still appear zero-filled in the stats output.

``id_col`` contract (all public functions here): a 64-bit integral
column — the Arrow kernels pack it into int64 and the splice output
schema pins it ``long``. String/UUID document ids must be mapped to a
64-bit key first (e.g. ``xxhash64`` plus a collision-checked side
table), which is also what the shuffle wants at 100 TB: 8-byte keys,
not URL-length strings.

The same machinery also yields exact CROSS-CORPUS decontamination
(``exact_decontaminate*``): a train-corpus position is contaminated
iff it lies inside a substring ≥ ``min_len`` that occurs anywhere in a
benchmark corpus — the semi-join variant where the duplicate test is
"occurs in the other corpus" instead of "count ≥ min_dup", and the
benchmark window-hash set is typically broadcast-sized, so the train
corpus is never shuffled at all.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["exact_dupspan_spans", "exact_dupspan_stats",
           "exact_dupspan_dedup", "exact_decontaminate_spans",
           "exact_decontaminate_stats", "exact_decontaminate",
           "build_decontam_index", "decontaminate_spans_with_index",
           "build_dupspan_index", "validate_dupspan_index",
           "merge_dupspan_index", "dupspan_increment",
           "dupspan_stats_increment", "dupspan_cut_increment",
           "write_dupspan_index", "read_dupspan_index"]

_B = 1099511628211        # odd multiplier (FNV-1a prime) — invertible mod 2^64
_B_INV = pow(_B, -1, 1 << 64)


def _window_hash_rows(sdf, text_col: str, id_col: str, min_len: int,
                      with_gram: bool = False):
    """(id, pos, _h) for every ``min_len``-char window — ONE Arrow
    mapInPandas pass, O(chars) per partition: with pre[i] = Σ_{j<i}
    c_j·B⁻ʲ (mod 2⁶⁴), the window hash at 0-based i is
    (pre[i+L] − pre[i])·B^{L-1+i} — all cumsum/cumprod in uint64,
    whose wraparound IS mod-2⁶⁴ arithmetic. ``pos`` is 1-based to
    match SQL ``substring`` for the exact-verify stage. Characters
    hash by code point (utf-32 view), matching character-based
    ``substring``/``length`` semantics on both engines. ``id_col``
    must be a 64-bit integral column (the kernel packs it into int64).
    ``with_gram`` adds the window's real substring as ``_g`` — output
    grows by L chars per window, so only benchmark-sized inputs
    (``build_decontam_index``) should ask for it; it saves the
    text join-back those consumers would otherwise pay."""
    L = min_len

    def kernel(batches):
        import numpy as np
        import pandas as pd
        binv = np.uint64(_B_INV)
        b = np.uint64(_B)
        for pdf in batches:
            ids_out, pos_out, h_out, g_out = [], [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                codes32 = np.frombuffer(txt.encode("utf-32-le"),
                                        dtype=np.uint32)
                codes = codes32.astype(np.uint64)
                n = codes.shape[0]
                if n < L:
                    continue
                m = n - L + 1
                # inv_pow[j] = B^(-j); pow_mul[i] = B^(L-1+i)  (mod 2^64)
                inv_pow = np.concatenate(
                    ([np.uint64(1)],
                     np.full(n - 1, binv, dtype=np.uint64))).cumprod()
                pre = np.concatenate(
                    ([np.uint64(0)], (codes * inv_pow).cumsum()))
                pow_mul = np.concatenate(
                    ([np.uint64(1)],
                     np.full(m - 1, b, dtype=np.uint64))).cumprod()
                pow_mul = pow_mul * np.uint64(pow(_B, L - 1, 1 << 64))
                h = (pre[L:L + m] - pre[:m]) * pow_mul
                ids_out.append(np.full(m, did, dtype=np.int64))
                pos_out.append(np.arange(1, m + 1, dtype=np.int32))
                h_out.append(h.view(np.int64))
                if with_gram:
                    if "\x00" in txt:
                        # numpy U-strings strip trailing NULs — keep
                        # the exact per-window slice for texts that
                        # contain them (vanishingly rare)
                        g_out.append(np.array(
                            [txt[i:i + L] for i in range(m)],
                            dtype=object))
                    else:
                        # vectorized window extraction (r15
                        # optimization round): numpy unicode arrays
                        # are UCS4 — exactly the utf-32-le code units
                        # already in hand — so the m overlapping
                        # L-char windows are one strided copy + a
                        # dtype view instead of m Python slices
                        wins = np.lib.stride_tricks.sliding_window_view(
                            codes32, L)
                        g_out.append(np.ascontiguousarray(wins)
                                     .view(f"<U{L}").reshape(m))
            if ids_out:
                cols = {"_did": np.concatenate(ids_out),
                        "pos": np.concatenate(pos_out),
                        "_h": np.concatenate(h_out)}
                if with_gram:
                    cols["_g"] = np.concatenate(g_out) if g_out else []
                yield pd.DataFrame(cols)

    proj = sdf.select(F.col(id_col), F.col(text_col))
    schema = "_did long, pos int, _h long"
    if with_gram:
        schema += ", _g string"
    out = proj.mapInPandas(kernel, schema=schema)
    return out.withColumnRenamed("_did", id_col)


def exact_dupspan_spans(f: Frame, text_col: str = "text",
                        id_col: str = "doc_id", min_len: int = 50,
                        min_dup: int = 2) -> Frame:
    """Maximal duplicated character spans per document:
    ``(id, span_start, span_len)`` — 1-based start, every character of
    the span covered by some ``min_len``-window occurring ≥ ``min_dup``
    times corpus-wide (exact; see module docstring for the identity
    with substring dedup and the verification that removes hash
    collisions).

    Caching note: the window-hash table is PINNED (it feeds both the
    corpus-wide count and the candidate join) — call
    ``crysda_spark.plans.cache.release_pinned()`` after consuming the
    result, like every pipeline operator."""
    if min_len < 2:
        raise ValueError(f"exact_dupspan: min_len must be >= 2, got "
                         f"{min_len}")
    if min_dup < 2:
        raise ValueError(f"exact_dupspan: min_dup must be >= 2, got "
                         f"{min_dup}")
    from ..plans.cache import pin
    L = min_len
    w = pin(_window_hash_rows(f.sdf, text_col, id_col, L))
    dup_h = (w.groupBy("_h").agg(F.count(F.lit(1)).alias("_c"))
             .filter(F.col("_c") >= min_dup).select("_h"))
    cand = w.join(dup_h, on="_h").select(id_col, "pos")
    # exact verification on the REAL substring — candidate-sized only.
    # cand_g feeds BOTH the substring re-count and the hit join: pinned
    # (candidate-sized), or each consumer re-runs the window-hash
    # count-join pipeline above it (the r11 dedup_incremental lesson)
    texts = f.sdf.select(F.col(id_col), F.col(text_col))
    cand_g = pin(cand.join(texts, on=id_col)
                 .select(id_col, "pos",
                         F.substring(F.col(text_col), F.col("pos"), L)
                         .alias("_g")))
    dup_g = (cand_g.groupBy("_g").agg(F.count(F.lit(1)).alias("_c"))
             .filter(F.col("_c") >= min_dup).select("_g"))
    hits = cand_g.join(dup_g, on="_g").select(id_col, "pos")
    return Frame(_hits_to_spans(hits, id_col, L))


def _hits_to_spans(hits, id_col: str, L: int):
    """Gaps-and-islands merge of duplicated-window positions into
    maximal spans: windows at p1 < p2 overlap/touch iff p2 - p1 <= L.
    One window pass partitioned by doc id — no skew (a doc's windows
    are bounded by its length)."""
    win = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(win) <= L, 0).otherwise(1)
    grouped = (hits.withColumn("_brk", brk)
               .withColumn("_grp", F.sum("_brk").over(
                   win.rowsBetween(Window.unboundedPreceding, 0))))
    return (grouped.groupBy(id_col, "_grp")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") - F.min("pos") + L).alias("span_len"))
            .select(id_col, "span_start", "span_len"))


def exact_dupspan_stats(f: Frame, text_col: str = "text",
                        id_col: str = "doc_id", min_len: int = 50,
                        min_dup: int = 2) -> Frame:
    """Per-document duplicated-span accounting (every input doc, zero-
    filled): ``(id, n_chars, n_spans, chars_removed, cleaned_len)`` —
    what a Lee-et-al cut at these parameters would delete. Same
    pinning contract as ``exact_dupspan_spans``."""
    spans = exact_dupspan_spans(f, text_col, id_col, min_len,
                                min_dup).sdf
    return Frame(_stats_from_spans(f.sdf, spans, text_col, id_col))


def _stats_from_spans(base_sdf, spans, text_col: str, id_col: str):
    agg = (spans.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_spans"),
                F.sum("span_len").alias("chars_removed")))
    base = base_sdf.select(F.col(id_col),
                           F.length(F.col(text_col)).alias("n_chars"))
    return (base.join(agg, on=id_col, how="left")
            .select(id_col, "n_chars",
                    F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                    F.coalesce("chars_removed", F.lit(0))
                    .cast("long").alias("chars_removed"))
            .withColumn("cleaned_len",
                        F.col("n_chars") - F.col("chars_removed")))


def exact_dupspan_dedup(f: Frame, text_col: str = "text",
                        id_col: str = "doc_id", min_len: int = 50,
                        min_dup: int = 2) -> Frame:
    """Documents with every duplicated span REMOVED (the paper's cut):
    ``(id, <text_col>)`` where the text is the concatenation of the
    non-duplicated segments in order. Span splicing runs in one Arrow
    pass over (text, sorted span list) — spans per doc are few and
    non-overlapping by construction (maximal islands). Same pinning
    contract as ``exact_dupspan_spans``."""
    spans = exact_dupspan_spans(f, text_col, id_col, min_len,
                                min_dup).sdf
    return Frame(_splice_cut(f.sdf, spans, text_col, id_col))


def _splice_cut(base_sdf, spans, text_col: str, id_col: str,
                with_removed: bool = False):
    """Concatenate each doc's non-span segments in order — one Arrow
    pass over (text, sorted span list); spans per doc are few and
    non-overlapping by construction (maximal islands). ``id_col``
    must be a 64-bit integral column (output schema pins it long).
    ``with_removed`` adds a ``chars_removed`` column computed inside
    the kernel (the original and cleaned text are both in hand — no
    extra join or source re-scan needed)."""
    lst = (spans.groupBy(id_col)
           .agg(F.sort_array(F.collect_list(
               F.struct("span_start", "span_len"))).alias("_spans")))
    joined = base_sdf.select(F.col(id_col), F.col(text_col)) \
        .join(lst, on=id_col, how="left")

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            texts, removed = [], []
            for txt, sp in zip(pdf[text_col], pdf["_spans"]):
                if txt is None or sp is None or len(sp) == 0:
                    texts.append(txt)
                    removed.append(0)
                    continue
                parts, at = [], 0
                for s in sp:
                    start0 = s["span_start"] - 1      # to 0-based
                    parts.append(txt[at:start0])
                    at = start0 + s["span_len"]
                parts.append(txt[at:])
                cleaned = "".join(parts)
                texts.append(cleaned)
                removed.append(len(txt) - len(cleaned))
            cols = {id_col: pdf[id_col], text_col: texts}
            if with_removed:
                cols["chars_removed"] = pd.array(removed, dtype="int64")
            yield pd.DataFrame(cols)

    schema = f"{id_col} long, {text_col} string"
    if with_removed:
        schema += ", chars_removed long"
    return joined.mapInPandas(kernel, schema=schema)


def exact_decontaminate_spans(train: Frame, benchmark: Frame,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              min_len: int = 50) -> Frame:
    """Maximal CONTAMINATED character spans per training document:
    ``(id, span_start, span_len)`` where every character lies inside a
    substring of length ≥ ``min_len`` that ALSO OCCURS anywhere in the
    ``benchmark`` corpus (the Lee et al. 2022 exact-substring
    decontamination shape — one verbatim benchmark leak of ``min_len``
    chars marks the span, no duplicate count needed on the train side).

    Same window identity as :func:`exact_dupspan_spans`: a train
    position is contaminated iff its ``min_len``-window content occurs
    as a window of the benchmark, so decontamination is a semi-join of
    train window hashes against the DISTINCT benchmark window-hash set
    — typically broadcast-sized (benchmark suites are MBs while train
    is TBs), making the whole candidate stage map-side: the train
    corpus is never shuffled, which is strictly cheaper than
    within-corpus dedup's corpus-wide count shuffle. Candidates are
    then EXACTLY verified on the real substrings of both sides, so
    hash collisions cannot mark a clean span.

    Caching note: the benchmark index table is PINNED (it feeds the
    candidate hash set and the exact-verify substring set) — call
    ``crysda_spark.plans.cache.release_pinned()`` after consuming the
    result, like every pipeline operator. To amortize the benchmark
    pass across many train shards, :func:`build_decontam_index` once
    and use :func:`decontaminate_spans_with_index`."""
    if min_len < 2:
        raise ValueError(f"exact_decontaminate: min_len must be >= 2, "
                         f"got {min_len}")
    idx = build_decontam_index(benchmark, text_col, id_col, min_len)
    return decontaminate_spans_with_index(train, idx, text_col, id_col,
                                          min_len)


def build_decontam_index(benchmark: Frame, text_col: str = "text",
                         id_col: str = "doc_id",
                         min_len: int = 50) -> Frame:
    """The reusable decontamination state: ``(_h, _g)`` — every
    DISTINCT ``min_len``-char window of the benchmark corpus with its
    rolling hash. ~(8 bytes + ``min_len`` chars) per distinct window;
    build it ONCE per benchmark release, persist to parquet, and
    decontaminate every arriving train shard against it (the streaming
    twin :func:`~crysda_spark.streaming.cdc.stream_decontaminate`
    reads exactly this table). The real substring rides along so the
    exact-verify stage never needs the benchmark texts again."""
    if min_len < 2:
        raise ValueError(f"build_decontam_index: min_len must be >= 2, "
                         f"got {min_len}")
    # the kernel emits the substring directly (with_gram) — one pass
    # over the benchmark, no text join-back
    ew = _window_hash_rows(benchmark.sdf, text_col, id_col, min_len,
                           with_gram=True)
    return Frame(ew.select("_h", "_g").distinct())


def validate_decontam_index(index: Frame, min_len: int) -> None:
    """Raise unless ``index`` was built with this ``min_len``: probes
    the first row's substring length (one tiny Spark job). Split out
    of :func:`decontaminate_spans_with_index` so long-lived callers
    (the streaming sink) can pay it ONCE per index load instead of
    once per micro-batch."""
    probe = index.sdf.select(F.length("_g").alias("_l")).first()
    if probe is not None and probe["_l"] != min_len:
        raise ValueError(
            f"decontaminate_spans_with_index: index was built with "
            f"min_len={probe['_l']} but min_len={min_len} was requested "
            "— a mismatch would silently mark every document clean; "
            "rebuild the index or pass the matching min_len")


def decontaminate_spans_with_index(train: Frame, index: Frame,
                                   text_col: str = "text",
                                   id_col: str = "doc_id",
                                   min_len: int = 50,
                                   probe: bool = True) -> Frame:
    """:func:`exact_decontaminate_spans` against a prebuilt
    :func:`build_decontam_index` table — the incremental/streaming
    path: each arriving train shard pays one window-hash map pass plus
    candidate-sized verify joins; the benchmark is never re-read.
    Same pinning contract (the index feeds the hash set and the
    verify set — pinned; call ``release_pinned()`` after consuming),
    EXCEPT an index that is already persisted (``df.is_cached``) is
    used as-is, so a caller amortizing one pinned index across many
    shards/batches keeps ownership of its lifetime.

    The index's window length MUST equal ``min_len``: mismatched
    hashes would match nothing and silently report the corpus as
    clean, so by default the first index row's substring length is
    checked and a mismatch RAISES (one tiny job). Callers that already
    ran :func:`validate_decontam_index` on this index may pass
    ``probe=False`` to skip the per-call job."""
    if min_len < 2:
        raise ValueError(f"decontaminate_spans_with_index: min_len "
                         f"must be >= 2, got {min_len}")
    from ..plans.cache import pin
    L = min_len
    tw = _window_hash_rows(train.sdf, text_col, id_col, L)
    idx = index.sdf if index.sdf.is_cached else pin(index.sdf)
    if probe:
        validate_decontam_index(Frame(idx), L)
    cand = tw.join(idx.select("_h").distinct(), on="_h") \
        .select(id_col, "pos")
    # exact verification on the REAL substrings — train side extracted
    # from train text, benchmark side carried inside the index, so
    # collisions can only widen this candidate-sized join
    t_g = (cand.join(train.sdf.select(F.col(id_col), F.col(text_col)),
                     on=id_col)
           .select(id_col, "pos",
                   F.substring(F.col(text_col), F.col("pos"), L)
                   .alias("_g")))
    hits = t_g.join(idx.select("_g").distinct(), on="_g",
                    how="leftsemi").select(id_col, "pos")
    return Frame(_hits_to_spans(hits, id_col, L))


def exact_decontaminate_stats(train: Frame, benchmark: Frame,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              min_len: int = 50) -> Frame:
    """Per-training-document contamination accounting (every train doc,
    zero-filled): ``(id, n_chars, n_spans, chars_removed,
    cleaned_len)`` — what an exact-substring decontamination cut at
    ``min_len`` would delete. Same pinning contract as
    :func:`exact_decontaminate_spans`."""
    spans = exact_decontaminate_spans(train, benchmark, text_col,
                                      id_col, min_len).sdf
    return Frame(_stats_from_spans(train.sdf, spans, text_col, id_col))


def exact_decontaminate(train: Frame, benchmark: Frame,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        min_len: int = 50) -> Frame:
    """Training documents with every benchmark-contaminated span
    REMOVED: ``(id, <text_col>)``, the concatenation of clean segments
    in order. Same pinning contract as
    :func:`exact_decontaminate_spans`."""
    spans = exact_decontaminate_spans(train, benchmark, text_col,
                                      id_col, min_len).sdf
    return Frame(_splice_cut(train.sdf, spans, text_col, id_col))


# ------------------------------------------- incremental dupspan (r14)
# Within-corpus exact substring dedup, batch-over-batch — the streaming
# twin the decontamination path already had. The accreted state is the
# window-gram COUNT table (_h, _g, cnt): one row per DISTINCT
# ``min_len``-char window seen so far, with its rolling hash (join
# accelerator), the REAL substring (exactness — duplication is decided
# by grouping on the gram itself, so hash collisions cannot flip a
# value, same discipline as the batch path's verify stage), and its
# total occurrence count (overlapping occurrences included, the Lee et
# al. 2022 semantics). ~(16 bytes + min_len chars) per distinct window
# — the honest suffix-array-equivalent state; persist it as parquet
# (bucketed/sorted by _h if probe joins dominate).
#
# Semantics, stated precisely: a position in an ARRIVING batch is
# duplicated iff its window's count over (all previous batches + this
# batch) reaches ``min_dup``. Earlier batches are never revisited —
# the first ``min_dup - 1`` occurrences ship clean and stay clean,
# later ones are cut: the keep-first discipline at batch granularity.
# Processing the whole corpus as one batch against an empty index is
# exactly ``exact_dupspan_*`` (pytest-pinned).


def build_dupspan_index(corpus: Frame, text_col: str = "text",
                        id_col: str = "doc_id",
                        min_len: int = 50,
                        fingerprint_only: bool = False) -> Frame:
    """The accretable substring-dedup state over ``corpus``:
    ``(_h, _g, cnt)`` — every DISTINCT ``min_len``-char window with
    its occurrence count (overlapping occurrences included). Build
    once (empty corpus → empty state is the streaming bootstrap),
    persist to parquet, feed :func:`dupspan_increment` per batch and
    fold each returned delta back with :func:`merge_dupspan_index`.
    One Arrow window pass + ONE (hash, gram)-keyed aggregate.

    ``fingerprint_only=True`` (r15 — the 100 TB state-size mode) drops
    the gram: state is ``(_h, cnt)``, ~16 bytes per distinct window
    instead of 16 + ``min_len`` chars (≳3× smaller at the default
    L=50, and the build skips materializing grams entirely).
    Exactness trade, stated precisely: within a batch, duplication is
    still decided on REAL grams (the batch carries its own text);
    ACROSS batches it is decided on the 64-bit rolling hash, so a
    cross-batch hash collision can mark one ``min_len``-char window as
    duplicated spuriously — expected spurious windows ≈ n²/2⁶⁵ for n
    distinct windows (at 10¹⁴ windows ≈ 100 TB, a ~10⁻⁶ fraction: the
    standard near-dup-pipeline false-positive class, documented, not
    hidden). Use the gram state when exactness must be absolute and
    the fingerprint state when the corpus outgrows it."""
    if min_len < 2:
        raise ValueError(f"build_dupspan_index: min_len must be >= 2, "
                         f"got {min_len}")
    if fingerprint_only:
        w = _window_hash_rows(corpus.sdf, text_col, id_col, min_len,
                              with_gram=False)
        return Frame(w.groupBy("_h")
                     .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    w = _window_hash_rows(corpus.sdf, text_col, id_col, min_len,
                          with_gram=True)
    return Frame(w.groupBy("_h", "_g")
                 .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def validate_dupspan_index(index: Frame, min_len: int) -> None:
    """Raise unless ``index`` was built with this ``min_len`` (probes
    the first row's gram length — one tiny job; a mismatch would
    silently mark every batch clean). Split out so long-lived callers
    (the streaming sink) pay it once, not per micro-batch.

    A fingerprint-only state (no ``_g`` column) carries nothing to
    probe — callers own the ``min_len`` contract there (the streaming
    sink persists it in the state dir and checks on restart), so this
    raises rather than silently passing a state it cannot validate."""
    if "_g" not in index.sdf.columns:
        raise ValueError(
            "validate_dupspan_index: fingerprint-only state carries no "
            "gram to probe — record min_len alongside the state (the "
            "streaming sink does) and skip the probe (probe=False)")
    probe = index.sdf.select(F.length("_g").alias("_l")).first()
    if probe is not None and probe["_l"] != min_len:
        raise ValueError(
            f"dupspan_increment: index was built with min_len="
            f"{probe['_l']} but min_len={min_len} was requested — a "
            "mismatch would silently mark every batch clean; rebuild "
            "the index or pass the matching min_len")


def merge_dupspan_index(index: Frame, delta: Frame,
                        release_inputs: bool = False) -> Frame:
    """Fold a :func:`dupspan_increment` delta into the state: counts
    SUM by (hash, gram) — associative and commutative, so any batch
    order and any partitioning yield the same state. One map-side-
    combinable aggregate over (old ∪ delta). Both sides MUST have been
    built at the same ``min_len`` (the streaming sink guarantees it;
    ad-hoc callers can check with :func:`validate_dupspan_index`) —
    mixed window lengths would union into a state that matches
    nothing at either length.

    ``release_inputs=True`` is for the accrete-in-a-loop pattern
    (state = merge(state, delta) per batch): the merged state is
    pinned and MATERIALIZED (one count job), then the superseded
    index/delta pins are dropped — without this, each round's pin of
    the new state stacks on the old ones and executor cache grows
    linearly with batch count (the r14 advice finding). Leave False
    when the caller owns the inputs' lifetimes (the streaming sink's
    ``pin_scope`` already releases per batch).

    Handles both state modes: gram ``(_h, _g, cnt)`` and
    fingerprint-only ``(_h, cnt)`` — mixing them raises (a union
    would silently zero the gram side's exactness)."""
    gi, gd = "_g" in index.sdf.columns, "_g" in delta.sdf.columns
    if gi != gd:
        raise ValueError(
            "merge_dupspan_index: cannot fold a "
            f"{'gram' if gd else 'fingerprint-only'} delta into a "
            f"{'gram' if gi else 'fingerprint-only'} state — rebuild "
            "one side in the other's mode")
    keys = ["_h", "_g"] if gi else ["_h"]
    u = index.sdf.unionByName(delta.sdf)
    merged = (u.groupBy(*keys)
              .agg(F.sum("cnt").cast("long").alias("cnt")))
    if release_inputs:
        from ..plans.cache import pin
        merged = pin(merged)
        merged.count()  # materialize BEFORE dropping the inputs' pins,
        # or the lazy merge would recompute the whole accretion chain
        for d in (index.sdf, delta.sdf):
            if d.is_cached:
                d.unpersist()
    return Frame(merged)


def dupspan_increment(new: Frame, index: Frame, text_col: str = "text",
                      id_col: str = "doc_id", min_len: int = 50,
                      min_dup: int = 2,
                      probe: bool = True) -> tuple[Frame, Frame]:
    """Duplicate-span detection for a NEW batch against the accreted
    corpus state, WITHOUT re-reading old text: returns
    ``(spans, delta)`` —

    - ``spans``: ``(id, span_start, span_len)`` maximal spans of the
      batch whose every character sits in a window occurring ≥
      ``min_dup`` times across (state + this batch);
    - ``delta``: this batch's ``(_h, _g, cnt)`` window counts — fold
      into the state with :func:`merge_dupspan_index` for the next
      batch (the state grows only by this batch's distinct windows).

    Exactness: with a GRAM state (``_g`` column present), duplication
    is decided on the REAL gram (the state carries it; the batch
    groups by it), so hash collisions cost join width only, never a
    wrong span — no separate verify stage needed. With a
    FINGERPRINT-ONLY state (r15, ``(_h, cnt)``), within-batch
    duplication is still gram-exact (the batch has its own text);
    cross-batch contributions ride the 64-bit hash — see
    :func:`build_dupspan_index` for the quantified collision bound.
    The returned delta matches the state's mode.

    Scale shape: one Arrow window-hash pass over the batch (map-only),
    ONE (hash, gram) aggregate of batch windows (batch-sized), a
    leftsemi probe of the state AGAINST the batch's keys (the state is
    scanned and filtered, never shuffled — AQE broadcasts the batch
    key set when it is small; a state saved through
    :func:`write_dupspan_index`'s bucketed layout additionally joins
    bucket-to-bucket with no state-side Exchange even when the batch
    outgrows broadcast), and a batch-sized hit join + per-doc islands
    window. Old text is never touched; per-batch cost is O(batch) +
    one state scan.

    Caching note: pins the batch window table, the batch delta, and
    (unless already cached) the index — ``release_pinned()`` after
    consuming, or run under ``pin_scope()`` like the streaming sink."""
    if min_len < 2:
        raise ValueError(f"dupspan_increment: min_len must be >= 2, "
                         f"got {min_len}")
    if min_dup < 2:
        raise ValueError(f"dupspan_increment: min_dup must be >= 2, "
                         f"got {min_dup}")
    from ..plans.cache import pin
    L = min_len
    idx = index.sdf if index.sdf.is_cached else pin(index.sdf)
    if probe:
        validate_dupspan_index(Frame(idx), L)
    w = pin(_window_hash_rows(new.sdf, text_col, id_col, L,
                              with_gram=True))
    if "_g" not in idx.columns:
        # fingerprint-only state: batch counts stay gram-exact, the
        # state contributes by hash; delta is (_h, cnt)
        delta = pin(w.groupBy("_h")
                    .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
        wg = (w.groupBy("_h", "_g")
              .agg(F.count(F.lit(1)).cast("long").alias("_cnt_batch")))
        old = (idx.join(delta.select("_h"), on="_h", how="leftsemi")
               .withColumnRenamed("cnt", "_cnt_old"))
        dup = (wg.join(old, on="_h", how="left")
               .filter(F.col("_cnt_batch")
                       + F.coalesce(F.col("_cnt_old"), F.lit(0))
                       >= min_dup)
               .select("_h", "_g"))
        hits = w.join(dup, on=["_h", "_g"]).select(id_col, "pos")
        return Frame(_hits_to_spans(hits, id_col, L)), Frame(delta)
    delta = pin(w.groupBy("_h", "_g")
                .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    # state probe: leftsemi against the batch's keys — the state side
    # only ever filters and streams, it is never re-keyed or shuffled
    old = (idx.join(delta.select("_h", "_g"), on=["_h", "_g"],
                    how="leftsemi")
           .withColumnRenamed("cnt", "_cnt_old"))
    dup = (delta.join(old, on=["_h", "_g"], how="left")
           .filter(F.col("cnt") + F.coalesce(F.col("_cnt_old"), F.lit(0))
                   >= min_dup)
           .select("_h", "_g"))
    hits = w.join(dup, on=["_h", "_g"]).select(id_col, "pos")
    return Frame(_hits_to_spans(hits, id_col, L)), Frame(delta)


def dupspan_stats_increment(new: Frame, index: Frame,
                            text_col: str = "text",
                            id_col: str = "doc_id", min_len: int = 50,
                            min_dup: int = 2,
                            probe: bool = True) -> tuple[Frame, Frame]:
    """:func:`dupspan_increment` with the batch's per-document
    accounting instead of raw spans: ``((id, n_chars, n_spans,
    chars_removed, cleaned_len), delta)`` — every batch doc, zero-
    filled, the ``exact_dupspan_stats`` shape."""
    spans, delta = dupspan_increment(new, index, text_col, id_col,
                                     min_len, min_dup, probe)
    return Frame(_stats_from_spans(new.sdf, spans.sdf, text_col,
                                   id_col)), delta


def dupspan_cut_increment(new: Frame, index: Frame,
                          text_col: str = "text",
                          id_col: str = "doc_id", min_len: int = 50,
                          min_dup: int = 2,
                          probe: bool = True) -> tuple[Frame, Frame]:
    """:func:`dupspan_increment` with the batch's spans SPLICED OUT:
    ``((id, <text_col>, chars_removed), delta)`` — the keep-first cut
    a streaming ingestion ships downstream (what
    :func:`~crysda_spark.streaming.cdc.stream_dupspan_dedup` writes
    per micro-batch)."""
    spans, delta = dupspan_increment(new, index, text_col, id_col,
                                     min_len, min_dup, probe)
    return Frame(_splice_cut(new.sdf, spans.sdf, text_col, id_col,
                             with_removed=True)), delta


def write_dupspan_index(index: Frame, table: str,
                        n_buckets: int = 64) -> None:
    """Persist dupspan state (either mode) as a BUCKETED managed table
    keyed on ``_h`` — the layout that keeps the per-batch state probe
    shuffle-free even when the batch's key set outgrows broadcast: the
    probe's equi-join on ``_h`` reads the state bucket-to-bucket (no
    state-side Exchange; only the batch side re-buckets), and
    ``sortBy(_h)`` turns the residual per-bucket join into a merge.
    ``n_buckets`` is fixed for the table's life — size it at
    ~(expected state bytes / 128 MB); at 100 TB the fingerprint-only
    state (~16 B/window) is the mode this layout is built for. Plain
    parquet (``df.write.parquet``) remains fine while the batch keys
    broadcast."""
    from ..plans.bucketing import write_bucketed
    write_bucketed(index.sdf, table, "_h", n_buckets, sort_cols="_h")


def read_dupspan_index(spark, table: str) -> Frame:
    """Load a :func:`write_dupspan_index` table, bucket metadata
    intact (``spark.read.parquet`` on the files would discard it and
    reintroduce the probe-side shuffle)."""
    return Frame(spark.table(table))
