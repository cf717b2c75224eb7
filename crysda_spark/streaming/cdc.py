"""Streaming CDC upsert sink: maintain a keyed parquet snapshot from a
change stream.

Spark has no MERGE sink without a table format (Delta/Iceberg); this
composes the engine's own batch ``merge_into`` under ``foreachBatch`` —
the exact pattern those formats document for streaming upserts. Each
micro-batch:

1. reads the current snapshot (empty → the batch bootstraps it),
2. applies ``merge_into`` (update-wins, insert-new, optional delete
   predicate; duplicate keys WITHIN a batch collapse to the latest by
   ``seq_col`` first — cross-batch ordering is the stream's watermark
   discipline),
3. writes the NEW snapshot to the inactive side of an A/B pair and
   flips a MANIFEST file — readers always see a complete snapshot
   (parquet overwrite-in-place would let a concurrent reader observe
   a half-written table).

Scale notes: one key shuffle per batch (AQE broadcasts small
changesets against the big snapshot); snapshot rewrite cost is the
usual no-format tradeoff — a real deployment graduates to a table
format for file-level upserts, keeping THIS operator's semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..frame import Frame
from ..operators.merge import merge_into

__all__ = ["read_snapshot", "stream_upsert_to_parquet"]

_MANIFEST = "MANIFEST"


def _active_side(path: str) -> str | None:
    try:
        with open(os.path.join(path, _MANIFEST)) as fh:
            side = fh.read().strip()
            return side if side in ("a", "b") else None
    except OSError:
        return None


def read_snapshot(spark, path: str) -> SparkDF | None:
    """Current committed snapshot, or None before the first batch."""
    side = _active_side(path)
    if side is None:
        return None
    return spark.read.parquet(os.path.join(path, side))


def stream_upsert_to_parquet(stream: SparkDF, path: str,
                             on: list[str] | str,
                             seq_col: str | None = None,
                             checkpoint: str | None = None):
    """Start the upsert sink: returns the StreamingQuery. ``on`` is the
    merge key; ``seq_col`` (e.g. an event timestamp) picks the LATEST
    change when one batch carries several rows per key — without it,
    intra-batch duplicate keys raise (merge_into's duplicate guard)."""
    keys = [on] if isinstance(on, str) else list(on)
    os.makedirs(path, exist_ok=True)

    def apply_batch(batch: SparkDF, batch_id: int) -> None:
        if seq_col is not None:
            from pyspark.sql.window import Window as W
            rn = F.row_number().over(
                W.partitionBy(*keys).orderBy(F.col(seq_col).desc()))
            batch = (batch.withColumn("_rn", rn)
                     .filter(F.col("_rn") == 1).drop("_rn"))
        spark = batch.sparkSession
        current = read_snapshot(spark, path)
        if current is None:
            new_snap = batch
        else:
            new_snap = merge_into(Frame(current), Frame(batch),
                                  on=keys).sdf
        side = _active_side(path)
        nxt = "b" if side == "a" else "a"
        new_snap.write.mode("overwrite").parquet(os.path.join(path, nxt))
        tmp = os.path.join(path, _MANIFEST + ".tmp")
        with open(tmp, "w") as fh:
            fh.write(nxt)
        os.replace(tmp, os.path.join(path, _MANIFEST))  # atomic flip

    writer = stream.writeStream.foreachBatch(apply_batch) \
        .outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
