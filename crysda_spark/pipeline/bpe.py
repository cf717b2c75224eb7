"""Byte-pair-encoding tokenizer for training-data pipelines
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units" — the public BPE algorithm).

Replaces the regex token ESTIMATE in ``pipeline.text`` with a real
subword tokenizer: train merges on the corpus, then count/emit true
BPE tokens per document.

Scale shape: training needs only the WORD-COUNT table — the standard
practice (HF tokenizers train the same way) — so the corpus-sized work
is one explode → groupBy(word) aggregate whose shuffle is
vocabulary-sized. The count table is pruned distributedly
(``min_count`` + top-``max_words`` by count) before the BOUNDED
driver collect; the merge loop itself is pure Python over that table.
Encoding fans back out Arrow-batched (mapInPandas) with a per-batch
cache keyed on distinct words, so each distinct word is segmented once
per batch regardless of corpus size.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from ..frame import Frame
from .text import tokens

EOW = "</w>"  # end-of-word marker (merges can't cross word boundaries)


def word_counts(f, text_col: str):
    """Distributed (word, count) table over normalized whitespace
    tokens — the only corpus-sized pass BPE training needs."""
    sdf = f.sdf if hasattr(f, "sdf") else f
    return (sdf.select(F.explode(tokens(F.col(text_col))).alias("word"))
            .filter(F.length("word") > 0)
            .groupBy("word").agg(F.count(F.lit(1)).alias("count")))


def train_bpe_from_counts(wc: list[tuple[str, int]],
                          n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a weighted word list: repeatedly
    merge the most frequent adjacent symbol pair (ties broken by the
    lexicographically smallest pair — deterministic across runs and
    partitionings). Returns the ordered merge list."""
    words = [[*w, EOW] for w, _ in wc]
    weights = [c for _, c in wc]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in zip(words, weights):
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i:i + 2] = [ab]
                else:
                    i += 1
    return merges


def train_bpe(f, text_col: str, n_merges: int = 1000,
              min_count: int = 1, max_words: int = 100_000
              ) -> list[tuple[str, str]]:
    """Train BPE merges on a corpus. The word-count table is pruned
    DISTRIBUTEDLY (drop words under ``min_count``, keep the
    top-``max_words`` by count with a deterministic word tie-break)
    before the driver collect, so the collect is bounded by
    ``max_words`` regardless of corpus size — misspellings and URL
    junk in a web corpus cannot blow up the driver."""
    wc = word_counts(f, text_col)
    if min_count > 1:
        wc = wc.filter(F.col("count") >= min_count)
    top = (wc.orderBy(F.col("count").desc(), F.col("word"))
           .limit(max_words).collect())  # bounded: max_words rows
    # r["count"], not r.count — Row inherits tuple's count() method
    return train_bpe_from_counts([(r["word"], r["count"]) for r in top],
                                 n_merges)


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE application to one word: repeatedly merge the
    best-ranked adjacent pair. Concatenating the result (and dropping
    the EOW marker) reconstructs the word exactly — BPE is lossless."""
    syms = [*word, EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(f, text_col: str, id_col: str,
                 merges: list[tuple[str, str]],
                 counts_only: bool = False) -> Frame:
    """Apply trained merges corpus-wide via mapInPandas (Arrow
    batches): returns (id, n_bpe_tokens) when ``counts_only`` else
    (id, n_bpe_tokens, bpe_tokens array). The kernel caches
    segmentations per distinct word within a batch — web text is
    Zipfian, so most lookups hit the cache."""
    from pyspark.sql import types as T
    sdf = f.sdf if hasattr(f, "sdf") else f
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    fields = [T.StructField("id", T.LongType()),
              T.StructField("n_bpe_tokens", T.IntegerType())]
    if not counts_only:
        fields.append(T.StructField("bpe_tokens", T.ArrayType(T.StringType())))
    schema = T.StructType(fields)
    base = sdf.select(F.col(id_col).cast("long").alias("id"),
                      tokens(F.col(text_col)).alias("_t"))

    def kernel(batches):
        import pandas as pd
        cache: dict[str, list[str]] = {}

        def seg(w):
            s = cache.get(w)
            if s is None:
                s = segment_word(w, ranks)
                cache[w] = s
            return s

        for pdf in batches:
            ids, ns, toks = [], [], []
            for pid, words in zip(pdf["id"], pdf["_t"]):
                out: list[str] = []
                for w in words:
                    if w:
                        out.extend(seg(w))
                ids.append(pid)
                ns.append(len(out))
                if not counts_only:
                    toks.append(out)
            cols = {"id": ids, "n_bpe_tokens": ns}
            if not counts_only:
                cols["bpe_tokens"] = toks
            yield pd.DataFrame(cols)

    return Frame(base.mapInPandas(kernel, schema=schema))
