"""Fuzzy (edit-distance) join — the entity-resolution primitive.

Matching dirty strings (names, addresses, product titles) against a
clean reference within Levenshtein distance k. The naive plan is a
cross join with a distance filter — O(|L|·|R|) and a broadcast
nested loop; this implementation blocks on the LENGTH-BAND lower
bound (an edit changes length by ≤ 1, so distance ≤ k ⇒
|len(l) − len(r)| ≤ k):

- the right side explodes each row to its 2k+1 admissible lengths;
- the join becomes an EQUI-join on (length) — hash/SMJ + AQE, never
  a nested loop;
- the exact ``levenshtein`` filter runs only on band candidates.

For k ≪ typical length the band prunes most of the cross product;
pair with a stricter blocker (first-token equality, phonetic key) as
an extra equi-key via ``block_on`` when the corpus is name-shaped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["fuzzy_join"]


def fuzzy_join(left: Frame, right: Frame, left_col: str, right_col: str,
               max_distance: int = 2, how: str = "inner",
               block_on: list[tuple[str, str]] | None = None,
               suffices: tuple[str, str] = (".x", ".y"),
               out_col: str = "edit_distance") -> Frame:
    """Join rows whose ``levenshtein(left_col, right_col)`` ≤
    ``max_distance``. ``how`` ∈ inner|left (left keeps unmatched left
    rows with null right columns). ``block_on`` adds exact-match
    blocking keys [(left_key, right_key), ...] to the equi-join.
    Shared column names get ``suffices``; the distance lands in
    ``out_col``."""
    if max_distance < 0:
        raise ValueError(f"fuzzy_join: max_distance must be ≥ 0, "
                         f"got {max_distance}")
    if how not in ("inner", "left"):
        raise ValueError(f"fuzzy_join: how must be inner|left, got {how!r}")
    l_sdf, r_sdf = left.sdf, right.sdf
    shared = [c for c in left.columns if c in set(right.columns)]
    l2 = l_sdf
    for c in shared:
        l2 = l2.withColumnRenamed(c, c + suffices[0])
        r_sdf = r_sdf.withColumnRenamed(c, c + suffices[1])
    lcol = left_col + suffices[0] if left_col in shared else left_col
    rcol = right_col + suffices[1] if right_col in shared else right_col
    if out_col in l2.columns or out_col in r_sdf.columns:
        raise ValueError(f"fuzzy_join: column {out_col!r} already exists")

    k = max_distance

    def _q(name):  # suffixed names contain dots — backtick-quote
        return F.col(f"`{name}`")

    # Row identity for the left-outer recovery: anti-joining on the
    # left COLUMNS equates rows by value, where a NULL in any matched
    # row's column fails its own equality and the row comes back a
    # second time with null right columns. An id column makes the
    # anti-join exact (and shuffles 8-byte keys instead of whole rows).
    if how == "left":
        l2 = l2.withColumn("__lid__", F.monotonically_increasing_id())

    r3 = r_sdf.withColumn(
        "__band__",
        F.explode(F.sequence(F.length(_q(rcol)) - k, F.length(_q(rcol)) + k)))
    cond = F.length(_q(lcol)) == F.col("__band__")
    for lk, rk in (block_on or []):
        lk = lk + suffices[0] if lk in shared else lk
        rk = rk + suffices[1] if rk in shared else rk
        cond = cond & (_q(lk) == _q(rk))
    # bounded Levenshtein (r15 optimization round): the 3-arg form
    # (Spark 3.5+) early-exits the DP once the running distance exceeds
    # k — O(k·n) per candidate instead of O(n²) — and returns -1 above
    # the bound, so `dist >= 0` is exactly the old `dist <= k` and the
    # emitted distance is the true distance for every kept pair.
    dist = F.levenshtein(_q(lcol), _q(rcol), k)
    matched = (l2.join(r3, on=cond & (dist >= 0), how="inner")
               .drop("__band__")
               .withColumn(out_col, dist))
    if how == "inner":
        return Frame(matched)
    # left: keep unmatched left rows with null right side
    r_cols = [c for c in r3.columns if c != "__band__"]
    un = (l2.join(matched.select("__lid__").distinct(),
                  on="__lid__", how="left_anti")
          .select("*", *[F.lit(None).cast(dict(r3.dtypes)[c]).alias(c)
                         for c in r_cols],
                  F.lit(None).cast("int").alias(out_col)))
    return Frame(matched.unionByName(un).drop("__lid__"))
