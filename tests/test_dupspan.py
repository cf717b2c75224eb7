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


# ------------------------------------------- incremental dupspan (r14)

def test_dupspan_increment_single_batch_equals_batch_path(spark):
    # whole corpus as ONE batch against an empty index must reproduce
    # exact_dupspan_spans exactly — the incremental path's base case
    from crysda_spark.pipeline.dupspan import (build_dupspan_index,
                                               dupspan_increment)
    block = "QWERTYUIOPASDFGHJKLZ"
    rows = [(1, "aaaa-bbbb." + block + ",cccc+dddd"),
            (2, "eeee;ffff!" + block + "?hhhh"),
            (3, "nothing shared here at all zzzz yyyy xxxx")]
    f = Frame(spark.createDataFrame(rows, "doc_id long, text string"))
    empty = build_dupspan_index(Frame(f.sdf.limit(0)), "text", "doc_id",
                                min_len=20)
    spans, delta = dupspan_increment(f, empty, "text", "doc_id",
                                     min_len=20, min_dup=2)
    got = {(r["doc_id"], r["span_start"], r["span_len"])
           for r in spans.sdf.collect()}
    want = _spans(f, min_len=20, min_dup=2)
    assert got == want == {(1, 11, 20), (2, 11, 20)}
    # the delta counts every window occurrence: the shared block's
    # exact window appears twice
    d = {r["_g"]: r["cnt"] for r in delta.sdf.collect()}
    assert d[block] == 2
    release_pinned()


def test_dupspan_increment_keep_first_across_batches(spark):
    # batch 1 ships the first copy CLEAN; batch 2's verbatim repeat is
    # cut (count state 1 + batch 1 = 2) — the keep-first discipline;
    # batch 2 also self-duplicates a new block, cut within the batch
    from crysda_spark.pipeline.dupspan import (build_dupspan_index,
                                               dupspan_increment,
                                               merge_dupspan_index,
                                               validate_dupspan_index)
    block = "QWERTYUIOPASDFGHJKLZ"
    b1 = Frame(spark.createDataFrame(
        [(1, "aaaa-bbbb." + block + ",cccc+dddd")],
        "doc_id long, text string"))
    b2 = Frame(spark.createDataFrame(
        [(2, "eeee;ffff!" + block + "?hhhh")],
        "doc_id long, text string"))
    empty = build_dupspan_index(Frame(b1.sdf.limit(0)), "text",
                                "doc_id", min_len=20)
    s1, d1 = dupspan_increment(b1, empty, "text", "doc_id",
                               min_len=20, min_dup=2)
    assert s1.sdf.count() == 0                  # first copy: clean
    idx = merge_dupspan_index(empty, d1)
    validate_dupspan_index(idx, 20)             # round-trips min_len
    with pytest.raises(ValueError, match="min_len"):
        validate_dupspan_index(idx, 30)
    s2, d2 = dupspan_increment(b2, idx, "text", "doc_id",
                               min_len=20, min_dup=2)
    got = {(r["doc_id"], r["span_start"], r["span_len"])
           for r in s2.sdf.collect()}
    assert got == {(2, 11, 20)}                 # later copy: cut
    # merged state counts sum across batches
    m = merge_dupspan_index(idx, d2)
    cnt = {r["_g"]: r["cnt"] for r in m.sdf.collect()}
    assert cnt[block] == 2
    release_pinned()


def test_dupspan_increment_matches_cumulative_oracle_semantics(spark):
    # three batches (doc_id % 3) — the union of incremental spans must
    # equal the cumulative-count semantics computed directly: a window
    # hits in batch b iff its gram count over batches <= b reaches 2
    from crysda_spark.pipeline.dupspan import (build_dupspan_index,
                                               dupspan_stats_increment,
                                               merge_dupspan_index)
    from crysda_spark.plans.cache import pin
    import random
    rng = random.Random(17)
    alphabet = "abcdefgh "
    texts = []
    shared = "".join(rng.choice(alphabet) for _ in range(24))
    for i in range(12):
        base = "".join(rng.choice(alphabet) for _ in range(60))
        if i % 4 == 0:       # plant the shared block in several docs
            base = base[:10] + shared + base[34:]
        texts.append((i, base))
    f = Frame(spark.createDataFrame(texts, "doc_id long, text string"))
    L = 12
    idx = build_dupspan_index(Frame(f.sdf.limit(0)), "text", "doc_id",
                              min_len=L)
    outs = None
    for b in range(3):
        batch = Frame(f.sdf.filter(F.col("doc_id") % 3 == b))
        stats, delta = dupspan_stats_increment(
            batch, idx, "text", "doc_id", min_len=L, min_dup=2,
            probe=False)
        outs = stats.sdf if outs is None else outs.unionByName(stats.sdf)
        idx = Frame(pin(merge_dupspan_index(idx, delta).sdf))
    got = {r["doc_id"]: r["chars_removed"] for r in outs.collect()}
    # driver-side reference: cumulative gram counts per batch
    from collections import Counter
    seen = Counter()
    want = {}
    for b in range(3):
        docs = [(i, t) for i, t in texts if i % 3 == b]
        bc = Counter(t[p:p + L] for _, t in docs
                     for p in range(len(t) - L + 1))
        hits = {}
        for i, t in docs:
            ps = [p for p in range(len(t) - L + 1)
                  if seen[t[p:p + L]] + bc[t[p:p + L]] >= 2]
            # islands merge
            removed, start = 0, None
            for j, p in enumerate(ps):
                if start is None:
                    start = p
                elif p - ps[j - 1] > L:
                    removed += ps[j - 1] - start + L
                    start = p
            if start is not None:
                removed += ps[-1] - start + L
            want[i] = removed
        seen.update(bc)
    assert got == want
    assert sum(got.values()) > 0                # the plant actually hit
    release_pinned()


def test_stream_dupspan_dedup_accretes_and_matches_driver_loop(spark,
                                                               tmp_path):
    """stream == batch: the streaming sink's cleaned output over two
    micro-batches must byte-match the driver loop of
    dupspan_cut_increment, the index must accrete gram counts, and the
    manifest must carry the side@batch_id replay guard."""
    import os
    from crysda_spark.pipeline.dupspan import (build_dupspan_index,
                                               dupspan_cut_increment,
                                               merge_dupspan_index)
    from crysda_spark.streaming.cdc import (_manifest_state,
                                            read_snapshot,
                                            stream_dupspan_dedup)
    block = "QWERTYUIOPASDFGHJKLZ"
    rows1 = [(1, "aaaa-bbbb." + block + ",cccc+dddd"),
             (2, "unrelated first text with nothing shared zzz")]
    rows2 = [(3, "eeee;ffff!" + block + "?hhhh"),       # cross-batch dup
             (4, "pp" + block + "qq" + block + "rr")]   # in-batch dups
    src = str(tmp_path / "docs")
    state = str(tmp_path / "span_state")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    spark.createDataFrame(rows1, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(src)
    q = stream_dupspan_dedup(stream, state, "text", "doc_id",
                             min_len=20, min_dup=2, checkpoint=ckpt)
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"]: (r["text"], r["chars_removed"])
           for r in spark.read.parquet(
               os.path.join(state, "cleaned")).collect()}
    # driver-side reference loop
    f1 = Frame(spark.createDataFrame(rows1, "doc_id long, text string"))
    f2 = Frame(spark.createDataFrame(rows2, "doc_id long, text string"))
    idx = build_dupspan_index(Frame(f1.sdf.limit(0)), "text", "doc_id",
                              min_len=20)
    c1, d1 = dupspan_cut_increment(f1, idx, "text", "doc_id",
                                   min_len=20, min_dup=2)
    want = {r["doc_id"]: (r["text"], r["chars_removed"])
            for r in c1.sdf.collect()}
    idx = merge_dupspan_index(idx, d1)
    c2, d2 = dupspan_cut_increment(f2, idx, "text", "doc_id",
                                   min_len=20, min_dup=2)
    want.update({r["doc_id"]: (r["text"], r["chars_removed"])
                 for r in c2.sdf.collect()})
    release_pinned()
    assert got == want
    assert got[1][1] == 0                       # first copy shipped clean
    assert got[3][1] == 20                      # cross-batch repeat cut
    assert got[4][1] >= 20                      # in-batch repeat cut
    # accreted state: gram counts across all batches (block seen 4x)
    snap = read_snapshot(spark, os.path.join(state, "index"))
    cnt = {r["_g"]: r["cnt"] for r in snap.collect()}
    assert cnt[block] == 4
    side, bid, fp = _manifest_state(os.path.join(state, "index"))
    assert side in ("a", "b") and bid == 1      # last flipped batch
    assert isinstance(fp, int)                  # content fingerprint


def test_stream_dupspan_replay_after_flip_is_idempotent(spark, tmp_path):
    """The exactly-once subtlety of COUNT state: if a batch's index
    flip COMMITTED but Spark still replays the batch (crash between
    flip and checkpoint), re-merging the delta would double-count
    every window and silently over-cut forever after. The manifest's
    side@batch_id guard must make the replay byte-idempotent on BOTH
    tables — recomputing cleaned/ against the PRE-flip side and
    leaving the state alone."""
    import os
    from crysda_spark.streaming.cdc import (_dupspan_apply_batch,
                                            _manifest_state,
                                            read_snapshot)
    block = "QWERTYUIOPASDFGHJKLZ"
    idx_dir = str(tmp_path / "index")
    cln_dir = str(tmp_path / "cleaned")
    os.makedirs(idx_dir); os.makedirs(cln_dir)
    b0 = spark.createDataFrame(
        [(1, "aaaa-bbbb." + block + ",cccc+dddd")],
        "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(2, "eeee;ffff!" + block + "?hhhh")],
        "doc_id long, text string")
    _dupspan_apply_batch(b0, 0, idx_dir, cln_dir, "text", "doc_id", 20, 2)
    _dupspan_apply_batch(b1, 1, idx_dir, cln_dir, "text", "doc_id", 20, 2)

    def snap():
        idx = sorted((r["_g"], r["cnt"]) for r in
                     read_snapshot(spark, idx_dir).collect())
        cln = sorted((r["doc_id"], r["text"], r["chars_removed"])
                     for r in spark.read.parquet(cln_dir).collect())
        return idx, cln, _manifest_state(idx_dir)

    before = snap()
    assert dict(before[0])[block] == 2          # both batches counted
    assert before[2][1] == 1                    # last flipped batch id
    # REPLAY batch 1 after its flip committed (the torn window)
    _dupspan_apply_batch(b1, 1, idx_dir, cln_dir, "text", "doc_id", 20, 2)
    after = snap()
    assert after == before, "replay-after-flip mutated state or output"
    # and batch 1's cut is still the keep-first one (span removed)
    assert dict((d, c) for d, _t, c in after[1])[2] == 20
    side, bid, _fp = after[2]
    assert bid == 1 and side in ("a", "b")
    # CHECKPOINTLESS RESTART: numbering starts at 1... wait — at the
    # last flipped id. New CONTENT arriving under the already-flipped
    # batch id must NOT be mistaken for a replay (the fingerprint
    # disagrees): it takes the normal path and its windows reach the
    # state — on id alone this data would be silently dropped forever.
    b_new = spark.createDataFrame(
        [(3, "iiii:jjjj(" + block + ")kkkk")],
        "doc_id long, text string")
    _dupspan_apply_batch(b_new, 1, idx_dir, cln_dir, "text", "doc_id",
                         20, 2)
    idx3 = sorted((r["_g"], r["cnt"]) for r in
                  read_snapshot(spark, idx_dir).collect())
    assert dict(idx3)[block] == 3               # new doc WAS merged
    # and its text was cut against the full state (block seen twice)
    cln3 = {r["doc_id"]: r["chars_removed"] for r in
            spark.read.parquet(cln_dir).collect()}
    assert cln3[3] == 20


def test_merge_dupspan_index_release_inputs(spark):
    """r15 (r14 advice): the accrete-in-a-loop pattern must not stack
    pins — merge(release_inputs=True) returns a CACHED state with
    identical counts and unpersists the superseded state/delta."""
    from crysda_spark.pipeline.dupspan import (build_dupspan_index,
                                               merge_dupspan_index)
    from crysda_spark.plans.cache import pin, release_pinned
    docs = Frame(spark.createDataFrame(
        [(1, "abcdefabcdef"), (2, "abcdefxyzxyz")], "doc_id long, text string"))
    d2 = Frame(spark.createDataFrame(
        [(3, "abcdefnmopqr")], "doc_id long, text string"))
    idx = Frame(pin(build_dupspan_index(docs, min_len=4).sdf))
    delta = Frame(pin(build_dupspan_index(d2, min_len=4).sdf))
    idx.sdf.count(); delta.sdf.count()
    plain = {(r["_h"], r["_g"]): r["cnt"]
             for r in merge_dupspan_index(idx, delta).sdf.collect()}
    merged = merge_dupspan_index(idx, delta, release_inputs=True)
    assert merged.sdf.is_cached, "merged state must come back pinned"
    assert not idx.sdf.is_cached and not delta.sdf.is_cached, \
        "superseded inputs must be unpersisted"
    got = {(r["_h"], r["_g"]): r["cnt"] for r in merged.sdf.collect()}
    assert got == plain and len(got) > 0
    release_pinned()


def test_fingerprint_mode_parity_with_gram_mode(spark):
    """r15 fingerprint-only state: same spans and same per-gram totals
    as the gram state on a multi-batch corpus with cross-batch AND
    within-batch duplicates (within-batch stays gram-exact; cross-batch
    rides the 64-bit hash)."""
    from crysda_spark.pipeline.dupspan import (build_dupspan_index,
                                               dupspan_increment,
                                               merge_dupspan_index)
    block = "QWERTYUIOPASDFGHJKLZ"
    batches = [
        Frame(spark.createDataFrame(
            [(1, "aaaa-bbbb." + block + ",cccc+dddd"),
             (2, "self" + block[:10] + "####" + "variant text here")],
            "doc_id long, text string")),
        Frame(spark.createDataFrame(
            [(3, "eeee;ffff!" + block + "?hhhh"),
             (4, "xxxx" + block + "yyyy" + block + "zzzz")],
            "doc_id long, text string")),
    ]

    def run(fp_mode):
        idx = build_dupspan_index(
            Frame(batches[0].sdf.limit(0)), "text", "doc_id",
            min_len=20, fingerprint_only=fp_mode)
        spans = set()
        for b in batches:
            s, d = dupspan_increment(b, idx, "text", "doc_id",
                                     min_len=20, min_dup=2, probe=False)
            spans |= {(r["doc_id"], r["span_start"], r["span_len"])
                      for r in s.sdf.collect()}
            idx = merge_dupspan_index(idx, d)
        return spans, idx

    gram_spans, gram_idx = run(False)
    fp_spans, fp_idx = run(True)
    assert fp_spans == gram_spans and len(fp_spans) > 0
    # fingerprint state: no gram column, same totals keyed by hash
    assert fp_idx.sdf.columns == ["_h", "cnt"]
    gtot = {r["_h"]: r["cnt"]
            for r in gram_idx.sdf.groupBy("_h")
            .agg(F.sum("cnt").alias("cnt")).collect()}
    ftot = {r["_h"]: r["cnt"] for r in fp_idx.sdf.collect()}
    assert ftot == gtot
    release_pinned()


def test_fingerprint_state_is_materially_smaller(spark, tmp_path):
    """The 3× state-size claim, measured: parquet bytes of the
    fingerprint state must be well under the gram state's for the same
    corpus (random-ish text, so grams don't compress away)."""
    import os
    from crysda_spark.pipeline.dupspan import build_dupspan_index
    import random
    rng = random.Random(7)
    docs = [(i, "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ")
                        for _ in range(400))) for i in range(50)]
    f = Frame(spark.createDataFrame(docs, "doc_id long, text string"))

    def psize(frame, name):
        p = str(tmp_path / name)
        frame.sdf.coalesce(1).write.mode("overwrite").parquet(p)
        return sum(os.path.getsize(os.path.join(p, x))
                   for x in os.listdir(p) if x.endswith(".parquet"))

    g = psize(build_dupspan_index(f, min_len=50), "gram")
    fp = psize(build_dupspan_index(f, min_len=50, fingerprint_only=True),
               "fp")
    assert fp * 2 < g, f"fingerprint state {fp}B not <50% of gram {g}B"
    release_pinned()


def test_fingerprint_mode_guards(spark):
    """validate raises on a gram-less state; merge refuses mixed modes."""
    from crysda_spark.pipeline.dupspan import (build_dupspan_index,
                                               merge_dupspan_index,
                                               validate_dupspan_index)
    f = Frame(spark.createDataFrame([(1, "abcdefghij" * 5)],
                                    "doc_id long, text string"))
    gram = build_dupspan_index(f, min_len=10)
    fp = build_dupspan_index(f, min_len=10, fingerprint_only=True)
    with pytest.raises(ValueError, match="fingerprint-only"):
        validate_dupspan_index(fp, 10)
    with pytest.raises(ValueError, match="mode"):
        merge_dupspan_index(gram, fp)
    with pytest.raises(ValueError, match="mode"):
        merge_dupspan_index(fp, gram)
    release_pinned()


def test_bucketed_dupspan_state_probe_has_no_state_side_exchange(
        spark, tmp_path):
    """write_dupspan_index persists the state bucketed by _h: the probe
    equi-join reads the state bucket-to-bucket — no Exchange above the
    state scan even with broadcast disabled (the beyond-broadcast-batch
    regime the layout exists for)."""
    from crysda_spark.pipeline.dupspan import (build_dupspan_index,
                                               read_dupspan_index,
                                               write_dupspan_index)
    f = Frame(spark.createDataFrame(
        [(i, f"doc {i} payload abcdefghij{i % 3}") for i in range(30)],
        "doc_id long, text string"))
    idx = build_dupspan_index(f, min_len=10, fingerprint_only=True)
    write_dupspan_index(idx, "dupspan_state_test", n_buckets=4)
    state = read_dupspan_index(spark, "dupspan_state_test")
    keys = spark.range(100).select(F.xxhash64("id").alias("_h"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = state.sdf.join(keys, on="_h", how="leftsemi") \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # exactly one Exchange (the probe-key side); the bucketed state
    # side reads shuffle-free
    assert plan.count("Exchange") == 1, plan
    spark.sql("DROP TABLE IF EXISTS dupspan_state_test")


def test_stream_dupspan_fingerprint_mode_and_minlen_sidecar(spark,
                                                            tmp_path):
    """r15: the sink in fingerprint_only mode matches the driver loop,
    persists a (min_len, mode) sidecar at bootstrap, and REFUSES a
    restart with different values (the silent-clean mismatch the gram
    probe used to catch, now caught in both modes)."""
    import os
    from crysda_spark.pipeline.dupspan import (build_dupspan_index,
                                               dupspan_cut_increment)
    from crysda_spark.streaming.cdc import (read_snapshot,
                                            stream_dupspan_dedup)
    block = "QWERTYUIOPASDFGHJKLZ"
    rows1 = [(1, "aaaa-bbbb." + block + ",cccc+dddd")]
    rows2 = [(3, "eeee;ffff!" + block + "?hhhh")]
    src = str(tmp_path / "docs")
    state = str(tmp_path / "span_state_fp")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    spark.createDataFrame(rows1, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(src)
    q = stream_dupspan_dedup(stream, state, "text", "doc_id",
                             min_len=20, min_dup=2, checkpoint=ckpt,
                             fingerprint_only=True)
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"]: (r["text"], r["chars_removed"])
           for r in spark.read.parquet(
               os.path.join(state, "cleaned")).collect()}
    assert got[1][1] == 0 and got[3][1] == 20   # keep-first held
    snap = read_snapshot(spark, os.path.join(state, "index"))
    assert snap.columns == ["_h", "cnt"]        # fingerprint state
    # sidecar recorded and enforced
    with open(os.path.join(state, "index", "MINLEN")) as fh:
        assert fh.read() == "20@fp"
    stream2 = spark.readStream.schema("doc_id long, text string") \
        .parquet(src)
    with pytest.raises(ValueError, match="min_len=20 mode=fp"):
        stream_dupspan_dedup(stream2, state, "text", "doc_id",
                             min_len=30, min_dup=2)
    with pytest.raises(ValueError, match="mode=fp"):
        stream_dupspan_dedup(stream2, state, "text", "doc_id",
                             min_len=20, min_dup=2,
                             fingerprint_only=False)
    release_pinned()
