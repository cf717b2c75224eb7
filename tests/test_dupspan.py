"""Exact duplicate-span dedup (pipeline/dupspan.py) — the Lee et al.
substring-dedup shape: window-hash candidates, exact substring verify,
gaps-and-islands span merge, and the splice cut."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.pipeline.dupspan import (exact_decontaminate,
                                           exact_decontaminate_spans,
                                           exact_decontaminate_stats,
                                           exact_dupspan_dedup,
                                           exact_dupspan_spans,
                                           exact_dupspan_stats)
from crysda_spark.plans.cache import release_pinned


def _spans(f, **kw):
    rows = exact_dupspan_spans(f, "text", "doc_id", **kw).sdf.collect()
    release_pinned()
    return {(r["doc_id"], r["span_start"], r["span_len"]) for r in rows}


def test_planted_cross_doc_span(spark):
    # a 20-char block shared verbatim by docs 1 and 2; unique elsewhere
    # (neighbors CHARACTER-DIFFER across the docs — a shared space next
    # to the block would legitimately extend the duplicated span)
    block = "QWERTYUIOPASDFGHJKLZ"          # len 20
    rows = [(1, "aaaa-bbbb." + block + ",cccc+dddd"),
            (2, "eeee;ffff!" + block + "?hhhh"),
            (3, "nothing shared here at all zzzz yyyy xxxx")]
    f = Frame(spark.createDataFrame(rows, "doc_id long, text string"))
    got = _spans(f, min_len=20, min_dup=2)
    # block at 1-based pos 11 in both — exactly the block, nothing more
    assert got == {(1, 11, 20), (2, 11, 20)}


def test_overlapping_self_repeat_merges_to_one_span(spark):
    # 'ab'*30: every 4-char window "abab" repeats within the doc —
    # overlapping occurrences count (the paper's semantics) and the
    # islands merge must yield ONE maximal span covering the whole text
    txt = "ab" * 30
    f = Frame(spark.createDataFrame([(1, txt)],
                                    "doc_id long, text string"))
    got = _spans(f, min_len=4, min_dup=2)
    assert got == {(1, 1, len(txt))}


def test_adjacent_but_distinct_spans_stay_separate(spark):
    # two duplicated blocks separated by MORE than min_len unique chars
    # must come back as two spans, not one merged region
    a, b = "AAAABBBBCCCC", "DDDDEEEEFFFF"           # len 12 each
    gap = "uvwxyz0123456789uvwx"                    # len 20 > 12
    rows = [(1, a + gap + b), (2, "pp " + a + " qq"), (3, b + " rr")]
    f = Frame(spark.createDataFrame(rows, "doc_id long, text string"))
    got = _spans(f, min_len=12, min_dup=2)
    assert (1, 1, 12) in got and (1, 33, 12) in got
    assert not any(d == 1 and ln > 12 for d, _s, ln in got)


def test_short_and_null_docs_are_safe_and_zero_filled(spark):
    rows = [(1, "tiny"), (2, None), (3, "ABCDEFGHIJ" * 2 + "ABCDEFGHIJ")]
    f = Frame(spark.createDataFrame(rows, "doc_id long, text string"))
    stats = {r["doc_id"]: r for r in
             exact_dupspan_stats(f, "text", "doc_id", min_len=10,
                                 min_dup=2).sdf.collect()}
    release_pinned()
    assert stats[1]["n_spans"] == 0 and stats[1]["chars_removed"] == 0
    assert stats[1]["cleaned_len"] == 4
    assert stats[2]["n_spans"] == 0
    # doc 3 = "ABCDEFGHIJ" x3: every 10-window repeats (cyclic) — the
    # whole doc is one duplicated span
    assert stats[3]["n_spans"] == 1
    assert stats[3]["chars_removed"] == 30 and stats[3]["cleaned_len"] == 0


def test_dedup_splices_spans_out(spark):
    block = "0123456789ABCDEFGHIJ"          # len 20
    rows = [(1, "keepme." + block + ";andme"),
            (2, block + "!tailonly"),
            (3, "untouched text stays put exactly")]
    f = Frame(spark.createDataFrame(rows, "doc_id long, text string"))
    out = {r["doc_id"]: r["text"] for r in
           exact_dupspan_dedup(f, "text", "doc_id", min_len=20,
                               min_dup=2).sdf.collect()}
    release_pinned()
    assert out[1] == "keepme.;andme"
    assert out[2] == "!tailonly"
    assert out[3] == "untouched text stays put exactly"


def test_rolling_hash_matches_direct_polynomial(spark):
    # the O(chars) modular-inverse prefix form must equal the direct
    # per-window polynomial sum mod 2^64 (same B), incl. non-ASCII
    from crysda_spark.pipeline.dupspan import _B, _window_hash_rows
    txt = "héllo wörld héllo wörld — ünïcode payload"
    L = 5
    sdf = spark.createDataFrame([(7, txt)], "doc_id long, text string")
    got = {r["pos"]: r["_h"] & ((1 << 64) - 1)
           for r in _window_hash_rows(sdf, "text", "doc_id", L).collect()}
    M = 1 << 64
    for i in range(len(txt) - L + 1):
        want = 0
        for ch in txt[i:i + L]:
            want = (want * _B + ord(ch)) % M
        assert got[i + 1] == want, f"pos {i + 1}"


def test_guards(spark):
    f = Frame(spark.createDataFrame([(1, "x")], "doc_id long, text string"))
    with pytest.raises(ValueError):
        exact_dupspan_spans(f, min_len=1)
    with pytest.raises(ValueError):
        exact_dupspan_spans(f, min_dup=1)


def test_partition_invariance(spark):
    rows = [(i, ("block%02d " % (i % 4)) * 6) for i in range(40)]
    f1 = Frame(spark.createDataFrame(rows, "doc_id long, text string")
               .coalesce(1))
    f2 = Frame(spark.createDataFrame(rows, "doc_id long, text string")
               .repartition(13))
    s1 = _spans(f1, min_len=12, min_dup=2)
    s2 = _spans(f2, min_len=12, min_dup=2)
    assert s1 == s2 and s1


# ---------------- exact cross-corpus decontamination ----------------

def _decon_spans(train, bench, **kw):
    rows = exact_decontaminate_spans(train, bench, "text", "doc_id",
                                     **kw).sdf.collect()
    release_pinned()
    return {(r["doc_id"], r["span_start"], r["span_len"]) for r in rows}


def test_decontaminate_planted_benchmark_leak(spark):
    # the benchmark block appears verbatim inside train doc 1 only;
    # train doc 2 repeats ITSELF (within-train dup must NOT contaminate)
    block = "QWERTYUIOPASDFGHJKLZ"          # len 20
    train = Frame(spark.createDataFrame(
        [(1, "aaaa-bbbb." + block + ",cccc"),
         (2, "SELFDUPSELFDUPSELFDUPSELFDUPSELFDUPSELFDUP"),
         (3, "totally clean text with nothing shared 000")],
        "doc_id long, text string"))
    bench = Frame(spark.createDataFrame(
        [(100, "benchmark question: " + block + " answer: 42")],
        "doc_id long, text string"))
    got = _decon_spans(train, bench, min_len=20)
    assert got == {(1, 11, 20)}


def test_decontaminate_cut_and_stats(spark):
    block = "0123456789ABCDEFGHIJ"          # len 20
    train = Frame(spark.createDataFrame(
        [(1, "keepme." + block + ";andme"), (2, "spotless doc here")],
        "doc_id long, text string"))
    bench = Frame(spark.createDataFrame(
        [(9, "eval set contains " + block + " verbatim")],
        "doc_id long, text string"))
    cut = {r["doc_id"]: r["text"] for r in
           exact_decontaminate(train, bench, "text", "doc_id",
                               min_len=20).sdf.collect()}
    release_pinned()
    assert cut[1] == "keepme.;andme"
    assert cut[2] == "spotless doc here"
    stats = {r["doc_id"]: r for r in
             exact_decontaminate_stats(train, bench, "text", "doc_id",
                                       min_len=20).sdf.collect()}
    release_pinned()
    assert stats[1]["n_spans"] == 1 and stats[1]["chars_removed"] == 20
    assert stats[1]["cleaned_len"] == stats[1]["n_chars"] - 20
    assert stats[2]["n_spans"] == 0 and stats[2]["cleaned_len"] == 17


def test_decontaminate_longer_shared_run_merges(spark):
    # a 30-char shared run at min_len=10 must come back as ONE maximal
    # span of exactly 30 chars (windows merge), not 21 unit spans
    run = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123"   # len 30, no internal repeat
    train = Frame(spark.createDataFrame(
        [(1, "xx~" + run + "~yy")], "doc_id long, text string"))
    bench = Frame(spark.createDataFrame(
        [(5, "prefix " + run + " suffix")], "doc_id long, text string"))
    got = _decon_spans(train, bench, min_len=10)
    assert got == {(1, 4, 30)}


def test_decontaminate_guard_and_nulls(spark):
    train = Frame(spark.createDataFrame(
        [(1, None), (2, "abc")], "doc_id long, text string"))
    bench = Frame(spark.createDataFrame(
        [(1, "zz")], "doc_id long, text string"))
    with pytest.raises(ValueError):
        exact_decontaminate_spans(train, bench, min_len=1)
    stats = {r["doc_id"]: r for r in
             exact_decontaminate_stats(train, bench, "text", "doc_id",
                                       min_len=2).sdf.collect()}
    release_pinned()
    assert stats[1]["n_spans"] == 0 and stats[2]["n_spans"] == 0


def test_decontaminate_index_path_matches_direct(spark, tmp_path):
    # the prebuilt-index path must produce byte-identical spans to the
    # direct two-corpus path (same machinery, amortized benchmark pass)
    from crysda_spark.pipeline.dupspan import (
        build_decontam_index, decontaminate_spans_with_index)
    block = "SHAREDBENCHMARKCONTENT"         # len 22
    train = Frame(spark.createDataFrame(
        [(1, "aa." + block + ".bb"), (2, "clean as a whistle 123456")],
        "doc_id long, text string"))
    bench = Frame(spark.createDataFrame(
        [(50, "q: " + block + " a: yes"), (51, "other eval text here")],
        "doc_id long, text string"))
    direct = _decon_spans(train, bench, min_len=22)
    idx = build_decontam_index(bench, "text", "doc_id", min_len=22)
    p = str(tmp_path / "idx")
    idx.sdf.write.parquet(p)
    via_idx = {(r["doc_id"], r["span_start"], r["span_len"]) for r in
               decontaminate_spans_with_index(
                   train, Frame(spark.read.parquet(p)), "text",
                   "doc_id", min_len=22).sdf.collect()}
    release_pinned()
    assert direct == via_idx == {(1, 4, 22)}


def test_stream_decontaminate_cuts_against_static_index(spark, tmp_path):
    """Streaming twin: micro-batches are cut against the parquet
    benchmark index; output partitions by batch id and carries
    chars_removed; clean rows pass through untouched."""
    import os
    from crysda_spark.pipeline.dupspan import build_decontam_index
    from crysda_spark.streaming.cdc import stream_decontaminate
    block = "0123456789ABCDEFGHIJ"           # len 20
    bench = Frame(spark.createDataFrame(
        [(9, "eval has " + block + " inside")],
        "doc_id long, text string"))
    idx_p = str(tmp_path / "idx")
    build_decontam_index(bench, "text", "doc_id", min_len=20) \
        .sdf.write.parquet(idx_p)
    src = str(tmp_path / "docs")
    out = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "keepme." + block + ";andme"), (2, "spotless doc here")],
        "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(src)
    from crysda_spark.plans.cache import pin
    q = stream_decontaminate(stream, idx_p, out, "text", "doc_id",
                             min_len=20, checkpoint=ckpt)
    # r13 (ADVICE): per-batch releases are scoped — a concurrent
    # pipeline's pinned intermediate must survive every micro-batch
    other_pipeline = pin(spark.range(10))
    try:
        q.processAllAvailable()
        assert other_pipeline.is_cached
        # second batch: another leak + a clean doc
        spark.createDataFrame(
            [(3, block + "!tail"), (4, "nothing shared 999")],
            "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {r["doc_id"]: (r["text"], r["chars_removed"],
                             r["batch_id"]) for r in
               spark.read.parquet(out).collect()}
        assert got[1] == ("keepme.;andme", 20, 0)
        assert got[2] == ("spotless doc here", 0, 0)
        assert got[3] == ("!tail", 20, 1)
        assert got[4] == ("nothing shared 999", 0, 1)
        assert other_pipeline.is_cached
    finally:
        q.stop()
        release_pinned()


def test_decontaminate_index_min_len_mismatch_raises(spark, tmp_path):
    # an index built at one window length used at another would match
    # nothing and silently mark the corpus clean — must RAISE instead
    from crysda_spark.pipeline.dupspan import (
        build_decontam_index, decontaminate_spans_with_index)
    bench = Frame(spark.createDataFrame(
        [(1, "benchmark text with enough characters here")],
        "doc_id long, text string"))
    train = Frame(spark.createDataFrame(
        [(2, "train text with enough characters here too")],
        "doc_id long, text string"))
    idx = build_decontam_index(bench, "text", "doc_id", min_len=30)
    with pytest.raises(ValueError, match="min_len=30"):
        decontaminate_spans_with_index(train, idx, "text", "doc_id",
                                       min_len=20)
    release_pinned()
    with pytest.raises(ValueError):
        decontaminate_spans_with_index(train, idx, "text", "doc_id",
                                       min_len=1)
