"""Plan-health report over every __spark_entry__ query: per query, the
number of scans with filter pushdown, columns read per scan, exchange
count, and join strategies. Run at any SF dir (plans don't depend on
data size, modulo AQE thresholds).

Usage: python tools/plan_report.py [sf_dir] > PLAN_HEALTH.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from crysda_spark.plans.inspect import _explain_str, scan_health
    from crysda_spark.session import get_spark

    spark = get_spark("plan_report")
    print(f"# Plan health — {len(entry.queries())} queries @ {sf_dir}\n")
    print("| query | scans | pushdown | cols read | exchanges | BHJ | SMJ | codegen |")
    print("|---|---|---|---|---|---|---|---|")
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            txt = _explain_str(df, "formatted")
            scans = scan_health(df)
            pushed = sum(1 for s in scans if s["pushed_filters"])
            cols = "+".join(str(len(s["read_columns"])) for s in scans) or "-"
            exch = len(re.findall(r"\(\d+\) Exchange", txt))
            bhj = len(set(re.findall(r"\((\d+)\) BroadcastHashJoin", txt)))
            smj = len(set(re.findall(r"\((\d+)\) SortMergeJoin", txt)))
            wsc = len(set(re.findall(r"codegen id : (\d+)", txt)))
            print(f"| {name} | {len(scans)} | {pushed} | {cols} | {exch} | "
                  f"{bhj} | {smj} | {wsc} |")
        except Exception as e:
            print(f"| {name} | ERR {str(e).splitlines()[0][:60]} | | | | | | |")


if __name__ == "__main__":
    main()
