"""Full-precision gate pre-flight (r15): compare Spark vs DuckDB rows
by repr() — STRICTER than check_oracle's 10-significant-digit float
canonicalization and therefore a closer stand-in for the driver's
full-float64 value hash. Run it over any gate-rotation candidates
before the round ships; a BITDIFF here is a near-certain driver red
that check_oracle's slack would hide.

Usage: python tools/strict_bitcheck.py [sf_dir] [query ...]
       (no query names = the current _GATE_ORDER roster)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(repr(r[i]) for i in order) for r in rows)


def main() -> None:
    import __spark_entry__ as entry
    from crysda_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(entry._GATE_ORDER)
    spark = get_spark("strict_bitcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_diff = n_skip = 0
    for n in names:
        if n not in oracles:
            print(f"skip    {n} (rows-only)")
            n_skip += 1
            continue
        sdf = qs[n](spark, sf_dir)
        s = canon(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.sql(oracles[n])
        d = canon(res.columns, res.fetchall())
        if s == d:
            print(f"BITPASS {n} ({len(s)} rows)")
            n_pass += 1
        else:
            diffs = [(a, b) for a, b in zip(s, d) if a != b][:2]
            print(f"BITDIFF {n}: rows {len(s)} vs {len(d)}; {diffs}")
            n_diff += 1
    print(f"\n{n_pass} bitpass, {n_skip} skip, {n_diff} bitdiff")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
