"""Pairwise column statistics: one-pass correlation / covariance.

``corr_matrix`` computes Pearson correlation and sample covariance for
every pair of the given numeric columns in ONE map-side-combined
aggregate over the table — the profiling step a feature pipeline runs
before training (redundant-feature pruning, leakage checks).

Scale shape: a single aggregate producing one row of 6·k(k−1)/2 + k
partial sums (no shuffle of data rows — partials combine map-side;
the single result row is driver-sized). The pair expansion is plan
width, not data width: k columns cost O(k²) expressions, so the
operator guards k ≤ 32 (a 32-column request is 2,992 aggregate
expressions — about the Janino comfort limit; wider matrices should
run as column batches).

Determinism contract (same discipline as logreg_gd_fit): inputs are
quantized to decimal(18, quant) and every sum is EXACT decimal —
order-free, partition-invariant — so the double-arithmetic epilogue
(products, subtractions, IEEE-exact sqrt, one divide — each correctly
rounded from identical operands) yields bit-identical statistics on
any engine; a SQL oracle can check raw values with no rounding. The
quantization means corr is computed over values rounded at ``quant``
decimals — at the default 6 that is far below measurement noise for
real features; raw-double accumulation would instead make the result
depend on partition order.

Null handling: pairwise-complete observations (a row contributes to a
pair iff BOTH columns are non-null) — SQL ``corr()`` semantics.
Degenerate pairs (n < 2, or zero variance on either side) yield NULL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..frame import Frame

__all__ = ["corr_matrix"]

_MAX_COLS = 32


def corr_matrix(f: Frame, cols: list[str], quant: int = 6) -> Frame:
    """(col_x, col_y, n, cov, corr) for every i<j pair of ``cols`` —
    one pass, exact-decimal sums, bit-reproducible doubles out."""
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least 2 columns")
    if len(cols) > _MAX_COLS:
        raise ValueError(
            f"corr_matrix: {len(cols)} columns is {len(cols)*(len(cols)-1)//2} "
            f"pairs (> {_MAX_COLS}-column guard) — run in column batches")
    if len(set(cols)) != len(cols):
        raise ValueError(f"corr_matrix: duplicate columns in {cols}")
    missing = [c for c in cols if c not in f.columns]
    if missing:
        raise ValueError(f"corr_matrix: unknown columns {missing}")
    if not 0 <= quant <= 8:
        raise ValueError(f"corr_matrix: quant must be in [0, 8], got {quant}")
    # decimal(18,q) × decimal(18,q) → decimal(37, 2q) — fits precision 38
    # with zero loss (the moments-bug class: squaring (28,8) collapses to
    # (38,6) and silently rounds; (18,q) does not)
    dt, st = f"decimal(18,{quant})", f"decimal(38,{2 * quant})"
    q = {c: F.col(c).cast(dt) for c in cols}
    aggs = []
    pairs = [(cols[i], cols[j]) for i in range(len(cols))
             for j in range(i + 1, len(cols))]
    for x, y in pairs:
        both = q[x].isNotNull() & q[y].isNotNull()
        tag = f"{x}__{y}"
        aggs += [
            F.sum(F.when(both, 1).otherwise(0)).alias(f"n_{tag}"),
            F.sum(F.when(both, q[x])).alias(f"sx_{tag}"),
            F.sum(F.when(both, q[y])).alias(f"sy_{tag}"),
            F.sum(F.when(both, (q[x] * q[y]).cast(st))).alias(f"sxy_{tag}"),
            F.sum(F.when(both, (q[x] * q[x]).cast(st))).alias(f"sxx_{tag}"),
            F.sum(F.when(both, (q[y] * q[y]).cast(st))).alias(f"syy_{tag}"),
        ]
    one = f.sdf.agg(*aggs)

    def _stats(x: str, y: str):
        tag = f"{x}__{y}"
        nd = F.col(f"n_{tag}").cast("double")
        sx = F.col(f"sx_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        sxy = F.col(f"sxy_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        syy = F.col(f"syy_{tag}").cast("double")
        # canonical association — mirrored verbatim by the SQL oracle
        num = sxy * nd - sx * sy
        denx = sxx * nd - sx * sx
        deny = syy * nd - sy * sy
        cov = F.when(F.col(f"n_{tag}") >= 2,
                     num / (nd * (nd - F.lit(1.0))))
        corr = F.when((F.col(f"n_{tag}") >= 2) & (denx > 0) & (deny > 0),
                      num / (F.sqrt(denx) * F.sqrt(deny)))
        return F.struct(F.lit(x).alias("col_x"), F.lit(y).alias("col_y"),
                        F.col(f"n_{tag}").alias("n"), cov.alias("cov"),
                        corr.alias("corr"))

    out = one.select(F.inline(F.array(*[_stats(x, y) for x, y in pairs])))
    return Frame(out)
