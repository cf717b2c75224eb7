"""Sinks (reference write_csv: src/crysda/dataframe.cr:674-692).

Spark writes are distributed (one file per partition). ``single_file``
coalesces to one partition for small-result parity with the reference's
one-file output — only for results that fit an executor.
"""

from __future__ import annotations

from ..frame import Frame

MISSING_VALUE = "NA"


def write_csv(f: Frame, path: str, separator: str = ",", quote_char: str = '"',
              single_file: bool = False, mode: str = "overwrite") -> None:
    sdf = f.sdf.coalesce(1) if single_file else f.sdf
    (sdf.write.mode(mode)
     .option("sep", separator)
     .option("quote", quote_char)
     .option("nullValue", MISSING_VALUE)
     .option("header", True)
     .csv(path))


def write_parquet(f: Frame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = f.sdf.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json(f: Frame, path: str, mode: str = "overwrite") -> None:
    f.sdf.write.mode(mode).json(path)
