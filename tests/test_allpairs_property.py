"""AllPairs prefix-bound properties (pipeline.dedup.ngram_jaccard_exact).

The prefix length ``n - ceil(t*n - eps) + 1`` must never be SHORTER than
the exact rational bound (a short prefix silently loses pairs — the one
failure mode exactness forbids), and the end-to-end pipeline must equal
the all-pairs brute force at rational thresholds where ``t*n`` lands
exactly on an integer (the boundary the float epsilon exists for),
under adversarial df-orderings where the shared tokens are the
HIGH-frequency ones that sort to the end of every prefix order.
"""

from __future__ import annotations

import math
import random
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame, from_records
from crysda_spark.pipeline import dedup as dd


# ---------------------------------------------------------------- pure math
def _prefix_float(t: float, n: int) -> int:
    # the exact expression shape used in dedup.ngram_jaccard_exact
    return n - math.ceil(t * n - 1e-9) + 1


def _prefix_exact(t: Fraction, n: int) -> int:
    return n - math.ceil(t * n) + 1


@pytest.mark.parametrize("t_str", ["0.1", "0.2", "0.3", "0.4", "0.5",
                                   "0.6", "0.66", "0.7", "0.75", "0.8",
                                   "0.9", "0.95"])
def test_prefix_length_never_loses_pairs(t_str):
    """For every set size 1..200: the float-epsilon prefix is >= the
    exact rational prefix (no lost pairs) and overshoots by at most one
    position (bounded candidate cost). Catches the float-ceil hazard:
    e.g. 0.1*10 = 1.0000000000000002 in doubles, whose bare ceil is 2 —
    one position short."""
    t_f = float(t_str)
    t_q = Fraction(t_str)
    for n in range(1, 201):
        got, want = _prefix_float(t_f, n), _prefix_exact(t_q, n)
        assert got >= want, (t_str, n, got, want)
        assert got <= want + 1, (t_str, n, got, want)


# ------------------------------------------------------- end-to-end vs brute
def _brute_pairs(doc_sets: dict[int, frozenset], t: float):
    ids = sorted(doc_sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(doc_sets[a] & doc_sets[b])
            union = len(doc_sets[a] | doc_sets[b])
            j = inter / union if union else 0.0
            if j >= t:  # same double comparison the verify join runs
                out[(a, b)] = round(j, 6)
    return out


def _run_corpus(spark, doc_sets: dict[int, frozenset], t: float):
    rows = [{"doc_id": i, "text": " ".join(sorted(s))}
            for i, s in doc_sets.items()]
    corpus = Frame(from_records(spark, rows).sdf)
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dd.ngram_jaccard_exact(corpus, "text", "doc_id",
                                           threshold=t, k=1).sdf.collect()}
    want = _brute_pairs(doc_sets, t)
    assert set(got) == set(want), (
        f"pair set mismatch at t={t}: missing={set(want) - set(got)}, "
        f"extra={set(got) - set(want)}")
    for key, j in want.items():
        assert got[key] == pytest.approx(j, abs=1e-6)


@pytest.mark.parametrize("t,n", [(0.6, 5), (0.6, 10), (0.6, 20),
                                 (0.8, 5), (0.8, 10), (0.8, 20)])
def test_allpairs_equals_brute_force_adversarial(spark, t, n):
    """16 docs of ~n tokens drawn from a 2n-token universe: every token
    is high-frequency, so the df-order prefix has no rare tokens to
    lean on — the regime where a too-short prefix actually loses pairs."""
    rng = random.Random(10 * n + int(t * 10))
    universe = [f"w{i:03d}" for i in range(2 * n)]
    doc_sets = {i: frozenset(rng.sample(universe, n)) for i in range(16)}
    _run_corpus(spark, doc_sets, t)


def test_boundary_jaccard_exactly_at_threshold(spark):
    """Pairs whose Jaccard equals t EXACTLY (t*n integral) must be kept:
    |A|=|B|=4, |A∩B|=3 → J = 3/5 = 0.6; |A|=9,|B|=9,|A∩B|=8 → 8/10 = 0.8."""
    a4 = frozenset(["s1", "s2", "s3", "a1"])
    b4 = frozenset(["s1", "s2", "s3", "b1"])
    # filler docs pump the shared tokens' df so they sort LAST in the
    # prefix order — the adversarial placement for the bound
    fillers = {100 + i: frozenset(["s1", "s2", "s3", f"f{i}a", f"f{i}b",
                                   f"f{i}c", f"f{i}d", f"f{i}e"])
               for i in range(6)}
    sets6 = {0: a4, 1: b4, **fillers}
    got = _brute_pairs(sets6, 0.6)
    assert (0, 1) in got and got[(0, 1)] == 0.6
    _run_corpus(spark, sets6, 0.6)

    sh = [f"s{i}" for i in range(8)]
    a9 = frozenset(sh + ["a1"])
    b9 = frozenset(sh + ["b1"])
    fillers8 = {100 + i: frozenset(sh + [f"f{i}{j}" for j in range(8)])
                for i in range(6)}
    sets8 = {0: a9, 1: b9, **fillers8}
    got8 = _brute_pairs(sets8, 0.8)
    assert (0, 1) in got8 and got8[(0, 1)] == 0.8
    _run_corpus(spark, sets8, 0.8)


def test_length_filter_boundary_pairs_kept(spark):
    """PPJoin length filter (added r6): |A| = t·|B| with A ⊂ B gives
    J exactly t — the size-predicate boundary; the epsilon-loosened
    filter must keep the pair (a tight float bound could drop it)."""
    # t=0.5: |A|=4 ⊂ |B|=8 → J = 4/8 = 0.5 exactly
    a = frozenset(["s1", "s2", "s3", "s4"])
    b = frozenset(["s1", "s2", "s3", "s4", "x1", "x2", "x3", "x4"])
    others = {100 + i: frozenset([f"o{i}{j}" for j in range(5)])
              for i in range(3)}
    sets = {0: a, 1: b, **others}
    got = _brute_pairs(sets, 0.5)
    assert (0, 1) in got and got[(0, 1)] == 0.5
    _run_corpus(spark, sets, 0.5)
    # t=0.25: |A|=2 ⊂ |B|=8 → J = 2/8 = 0.25 exactly
    a2 = frozenset(["s1", "s2"])
    b2 = frozenset(["s1", "s2", "x1", "x2", "x3", "x4", "x5", "x6"])
    sets2 = {0: a2, 1: b2, **others}
    got2 = _brute_pairs(sets2, 0.25)
    assert (0, 1) in got2 and got2[(0, 1)] == 0.25
    _run_corpus(spark, sets2, 0.25)
