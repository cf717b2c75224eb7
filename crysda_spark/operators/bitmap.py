"""Bitmap indexes over integer keys: EXACT distinct counts with set
algebra (the roaring-bitmap pattern of OLAP user analytics — "how many
distinct users did A AND B" without ever joining raw event rows).

A bitmap is the relational pair table (word, bits): word = id div 64,
bits = OR of ``1 << (id mod 64)``. Everything stays exact and
mergeable:

- build is ONE groupBy over (segment keys, word) — the shuffle carries
  word ids + longs, never raw id lists; output size is
  |id-space|/64 rows per segment AT WORST (dense), usually far less;
- union/intersection/difference are equi-joins on word with
  bit_or/bit_and/AND-NOT — set algebra without touching events again;
- cardinality is Σ bit_count(bits) — a codegen'd aggregate.

Unlike HLL this is exact and intersectable; the trade is an integer
key space (user ids, doc ids — exactly what analytics has).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["bitmap_build", "bitmap_and", "bitmap_or", "bitmap_andnot",
           "bitmap_count"]

_SHIFT = F.call_function


def _one_hot(id_col) -> F.Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.call_function("shiftleft", F.lit(1).cast("long"),
                           F.pmod(c, F.lit(64)).cast("int"))


def bitmap_build(f: Frame, id_col: str, keys: list[str] | str | tuple = ()) -> Frame:
    """Build per-segment bitmaps: (keys..., word, bits). Ids must be
    non-negative integers; null ids are skipped."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    c = F.col(id_col)
    sdf = (f.sdf.filter(c.isNotNull() & (c >= 0))
           .select(*keys, (c / 64).cast("long").alias("word"),
                   _one_hot(id_col).alias("_b"))
           .groupBy(*keys, "word").agg(F.bit_or("_b").alias("bits")))
    return Frame(sdf)


def _align(a: Frame, b: Frame, how: str) -> SparkDF:
    aa = a.sdf.select(F.col("word"), F.col("bits").alias("_ba"))
    bb = b.sdf.select(F.col("word"), F.col("bits").alias("_bb"))
    return aa.join(bb, on="word", how=how)


def bitmap_and(a: Frame, b: Frame) -> Frame:
    """Intersection of two (word, bits) bitmaps."""
    j = _align(a, b, "inner")
    return Frame(j.select("word",
                          F.col("_ba").bitwiseAND(F.col("_bb")).alias("bits"))
                 .filter(F.col("bits") != 0))


def bitmap_or(a: Frame, b: Frame) -> Frame:
    j = _align(a, b, "full_outer")
    bits = (F.coalesce(F.col("_ba"), F.lit(0))
            .bitwiseOR(F.coalesce(F.col("_bb"), F.lit(0))))
    return Frame(j.select("word", bits.alias("bits")))


def bitmap_andnot(a: Frame, b: Frame) -> Frame:
    """Elements of ``a`` not in ``b`` (set difference)."""
    j = _align(a, b, "left")
    bits = F.col("_ba").bitwiseAND(
        F.bitwise_not(F.coalesce(F.col("_bb"), F.lit(0).cast("long"))))
    return Frame(j.select("word", bits.alias("bits"))
                 .filter(F.col("bits") != 0))


def bitmap_count(bm: Frame) -> SparkDF:
    """1-row DataFrame with the exact cardinality of a bitmap."""
    return bm.sdf.agg(
        F.coalesce(F.sum(F.bit_count("bits")), F.lit(0)).alias("n_distinct"))
