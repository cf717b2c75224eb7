"""Manifest-based incremental ingest for file-dropped datasets.

The batch counterpart of a streaming file source: a landing directory
accretes files (hourly exports, upstream dumps) and each ingest run
must process exactly the NEW ones — rerunning the whole directory
double-counts, and "newer than last run's clock" misses late-arriving
files with old mtimes. The robust contract is a processed-files
MANIFEST keyed by (path, size): a file is new until a ledger entry
records it, regardless of clocks.

Scale shape: the listing is a driver-side Hadoop-FS walk (one RPC per
directory — the same cost every Spark file scan already pays); the
manifest is a text ledger next to the data, appended atomically via
rename. Reading selects the new files explicitly, so the scan prunes
to exactly the delta.
"""

from __future__ import annotations

import os

__all__ = ["list_new_files", "mark_processed", "read_new_parquet"]

_LEDGER = "_PROCESSED"


def _ledger_path(manifest_dir: str) -> str:
    return os.path.join(manifest_dir, _LEDGER)


def _load_ledger(manifest_dir: str) -> set[str]:
    try:
        with open(_ledger_path(manifest_dir)) as fh:
            return {line.rstrip("\n") for line in fh if line.strip()}
    except OSError:
        return set()


def _entry(path: str, size: int) -> str:
    return f"{path}\t{size}"


def list_new_files(spark, data_dir: str, manifest_dir: str,
                   suffix: str = ".parquet") -> list[str]:
    """Files under ``data_dir`` (recursive, Hadoop FS — any scheme)
    not yet recorded in the manifest. A file whose SIZE changed since
    it was recorded counts as new again (a rewritten export must
    reprocess)."""
    jvm = spark._jvm                                     # noqa: SLF001
    hconf = spark._jsc.hadoopConfiguration()             # noqa: SLF001
    p = jvm.org.apache.hadoop.fs.Path(data_dir)
    fs = p.getFileSystem(hconf)
    seen = _load_ledger(manifest_dir)
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        path = st.getPath().toString()
        name = st.getPath().getName()
        if not name.endswith(suffix) or name.startswith(("_", ".")):
            continue
        if _entry(path, st.getLen()) not in seen:
            out.append(path)
    return sorted(out)


def mark_processed(spark, files: list[str], manifest_dir: str) -> None:
    """Append the files (with their CURRENT sizes) to the ledger —
    call after the ingest transaction commits, never before. The
    append goes through a temp file + atomic rename so a crashed run
    leaves the ledger either old or new, never truncated."""
    if not files:
        return
    jvm = spark._jvm                                     # noqa: SLF001
    hconf = spark._jsc.hadoopConfiguration()             # noqa: SLF001
    os.makedirs(manifest_dir, exist_ok=True)
    lines = set(_load_ledger(manifest_dir))
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        lines.add(_entry(p.toString(), fs.getFileStatus(p).getLen()))
    tmp = _ledger_path(manifest_dir) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(sorted(lines)) + "\n")
    os.replace(tmp, _ledger_path(manifest_dir))


def read_new_parquet(spark, data_dir: str, manifest_dir: str):
    """(DataFrame-or-None, new_files): the unprocessed delta as one
    scan. Typical loop::

        df, files = read_new_parquet(spark, landing, manifest)
        if df is not None:
            ingest(df)                       # your transaction
            mark_processed(spark, files, manifest)
    """
    files = list_new_files(spark, data_dir, manifest_dir)
    if not files:
        return None, []
    return spark.read.parquet(*files), files
