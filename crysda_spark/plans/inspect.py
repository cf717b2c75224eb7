"""Physical-plan inspection: assert the plan you shipped is the plan
you wanted. Parses ``explain`` output — no private Spark APIs."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame as SparkDF


def _explain_str(sdf: SparkDF, mode: str = "formatted") -> str:
    return sdf._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        sdf._jdf.queryExecution(), mode)


def scan_health(sdf: SparkDF) -> list[dict]:
    """One record per file scan in the physical plan:
    ``{"pushed_filters": [...], "read_columns": [...], "format": ...}``.

    Use in tests/CI: a scan whose ``read_columns`` is wider than the
    query needs, or whose ``pushed_filters`` is empty for a filtered
    read, is a scale bug long before it is a local slowdown."""
    text = _explain_str(sdf, "formatted")
    scans = []
    for block in re.split(r"\n\(\d+\) ", text):
        header = block.splitlines()[0] if block else ""
        if not header.startswith("Scan "):
            continue
        rec = {"format": header.split()[1] if len(header.split()) > 1 else "?",
               "pushed_filters": [], "read_columns": []}
        m = re.search(r"PushedFilters: \[(.*?)\]", block)
        if m and m.group(1).strip():
            rec["pushed_filters"] = [s.strip() for s in m.group(1).split(",")]
        m = re.search(r"ReadSchema: struct<(.*?)>", block)
        if m and m.group(1).strip():
            rec["read_columns"] = [s.split(":")[0].strip()
                                   for s in m.group(1).split(",") if ":" in s]
        scans.append(rec)
    return scans


def shuffle_count(sdf: SparkDF) -> int:
    """Number of exchanges in the physical plan. The cheapest scale
    review: did this verb chain add a shuffle it didn't need?"""
    text = _explain_str(sdf, "formatted")
    return len(re.findall(r"\(\d+\) Exchange", text))


def plan_stats(sdf: SparkDF) -> dict:
    """Catalyst's size/row estimate for this plan — the numbers the
    broadcast decision actually reads. Returns {size_bytes, row_count}
    (row_count None when stats carry no count). Use BEFORE submitting
    a 100 TB join: a dimension whose estimate exceeds the broadcast
    threshold will silently become a shuffle join."""
    st = sdf._jdf.queryExecution().optimizedPlan().stats()  # noqa: SLF001
    rc = st.rowCount()
    return {
        "size_bytes": int(str(st.sizeInBytes())),
        "row_count": int(str(rc.get())) if rc.isDefined() else None,
    }


def _parse_bytes(v: str) -> int:
    """Spark size-conf strings: bare numbers, '10485760b', '10MB',
    '1g', '-1'. A bare int() here broke the first time the conf
    reverted to Spark's DEFAULT ('10MB') after a conf.unset()."""
    s = v.strip().lower()
    units = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
             "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30,
             "t": 1 << 40, "tb": 1 << 40}
    for suffix in sorted(units, key=len, reverse=True):
        if s.endswith(suffix):
            num = s[: -len(suffix)].strip()
            if num.lstrip("-").isdigit():
                return int(num) * units[suffix]
    return int(s)


def will_broadcast(sdf: SparkDF) -> bool:
    """Whether Catalyst's size estimate for this plan sits under the
    session's autoBroadcastJoinThreshold — the pre-flight check for
    'is my dimension actually broadcast-sized?'. AQE can still convert
    at runtime when the measured size disagrees with the estimate."""
    thr = _parse_bytes(sdf.sparkSession.conf.get(
        "spark.sql.autoBroadcastJoinThreshold"))
    return thr > 0 and plan_stats(sdf)["size_bytes"] <= thr
