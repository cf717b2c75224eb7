"""Deterministic, leakage-safe dataset splitting.

Train/val/test assignment for a training corpus has two hard
requirements the naive ``rand() < 0.01`` fails:

1. **Determinism** — the same document must land in the same split on
   every run, engine, and partitioning (eval sets must be stable
   artifacts, not samples). Assignment here is a pure hash of the key:
   Carter-Wegman ``((a·k + b) mod p) mod 10000`` with p = 2³¹−1 —
   chosen over xxhash64 for the same reason as the CMS sketch: every
   intermediate fits 62 bits, so ANY SQL engine replays the exact
   arithmetic and the DuckDB oracle can verify assignments value-for-
   value (xxhash64 exists only in Spark).
2. **Group atomicity** — near-duplicates split across train and test
   leak eval data into training. Hash the CLUSTER key (e.g.
   ``survivor_id`` from ``dedup.dedup_full_assignments``), not the
   row id, and every member of a near-dup cluster lands in ONE split.

Scale shape: pure codegen expressions, zero shuffles, zero state —
the assignment is a map-side stamp.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["assign_splits", "split_bucket"]

_P = (1 << 31) - 1
_A = 1103515245
_B = 987654321
_BUCKETS = 10_000


def split_bucket(key: Column | str, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 10000) from an integral key —
    portable Carter-Wegman arithmetic (62-bit safe, replayable in any
    SQL engine). ``salt`` derives independent assignments from the
    same keys (e.g. a re-split audit)."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.pmod(k.cast("long") + F.lit(salt), F.lit(_P))
    return F.pmod(F.pmod(h * _A + _B, F.lit(_P)), F.lit(_BUCKETS))


def assign_splits(f: Frame, key_col: str,
                  fractions: dict[str, float] | None = None,
                  salt: int = 0, out_col: str = "split") -> Frame:
    """Stamp every row with a split name by hashing ``key_col``.
    ``fractions`` maps name → fraction (must sum to 1 within 1e-9);
    thresholds are cumulative in the dict's order, quantized to
    1/10000 — fractions below 0.0001 raise rather than silently
    producing an empty split. Pass a CLUSTER id as ``key_col`` for
    leakage-safe splits (all near-dups of a document travel
    together)."""
    fractions = dict(fractions or
                     {"train": 0.98, "val": 0.01, "test": 0.01})
    if not fractions:
        raise ValueError("assign_splits: fractions must be non-empty")
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"assign_splits: fractions must sum to 1, got "
                         f"{sum(fractions.values())}")
    if key_col not in f.columns:
        raise ValueError(f"assign_splits: unknown key column {key_col!r}")
    if out_col in f.columns:
        raise ValueError(f"assign_splits: column {out_col!r} already exists")
    edges = []
    cum = 0.0
    prev = 0
    for name, frac in fractions.items():
        if frac <= 0:
            raise ValueError(f"assign_splits: fraction for {name!r} must "
                             f"be > 0")
        cum += frac
        hi = round(cum * _BUCKETS)
        if hi <= prev:
            raise ValueError(f"assign_splits: fraction for {name!r} is "
                             f"below the 1/{_BUCKETS} quantization")
        edges.append((name, hi))
        prev = hi
    edges[-1] = (edges[-1][0], _BUCKETS)  # float-sum drift → exact cap
    b = split_bucket(key_col, salt)
    expr = None
    for name, hi in edges:
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return Frame(f.sdf.withColumn(out_col, expr))
