"""Incremental-dupspan scaling rehearsal (r14): the scaling claim for
`dupspan_increment` is NOT 10x-corpus wall time (the batch path owns
that cell) — it is that PER-BATCH cost stays ~flat as the accreted
state grows, because each round pays O(batch) window+count work plus a
state probe that scans-and-filters (never shuffles) the index.

Protocol: split the sf0.1 documents table into N equal batches by
doc_id hash, run `dupspan_cut_increment` rounds 1..N with the state
accreted between rounds (pinned, like the streaming sink), and record
per-round wall seconds, state row count, and the round's
chars_removed mass (the anti-prune aggregate — a bare count() would
let Catalyst drop the joins, the r12 bench lesson). If round N costs
~round 1 while the state holds ~N x the windows, the streaming sink's
100 TB story (per-batch cost independent of corpus age) is measured,
not argued.

Usage: python tools/dupspan_inc_rehearsal.py [sf_dir] [n_batches]
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from crysda_spark import Frame
    from crysda_spark.pipeline.dupspan import (build_dupspan_index,
                                               dupspan_cut_increment,
                                               merge_dupspan_index)
    from crysda_spark.plans.cache import pin, release_pinned
    from crysda_spark.session import get_spark

    spark = get_spark("dupspan_inc_rehearsal")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    docs.count()  # warm footer caches outside the timed region

    L, min_dup = 30, 2
    idx = Frame(pin(build_dupspan_index(
        Frame(docs.limit(0)), "text", "doc_id", min_len=L).sdf))
    rounds = []
    for b in range(n_batches):
        batch = Frame(docs.filter(F.pmod(F.xxhash64("doc_id"),
                                         F.lit(n_batches)) == b))
        t0 = time.perf_counter()
        cleaned, delta = dupspan_cut_increment(
            batch, idx, "text", "doc_id", min_len=L, min_dup=min_dup,
            probe=False)
        # force the full cut through a computed aggregate (anti-prune)
        agg = cleaned.sdf.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("chars_removed").alias("removed")).collect()[0]
        # pins + materializes the merged state and releases the
        # superseded state/delta pins (r14 advice: O(1) cache growth)
        new_idx = merge_dupspan_index(idx, delta, release_inputs=True)
        state_rows = new_idx.sdf.count()   # cached by the merge
        secs = round(time.perf_counter() - t0, 2)
        rounds.append(dict(batch=b, secs=secs, docs=int(agg["n"]),
                           chars_removed=int(agg["removed"]),
                           state_rows=int(state_rows),
                           load1=round(os.getloadavg()[0], 2)))
        idx = new_idx
        print(f"# round {b}: {secs}s docs={agg['n']} "
              f"removed={agg['removed']} state={state_rows} "
              f"load1={rounds[-1]['load1']}", file=sys.stderr)
    release_pinned()
    first, last = rounds[0]["secs"], rounds[-1]["secs"]
    print(json.dumps(dict(
        metric="dupspan_increment_per_batch", sf_dir=sf_dir,
        n_batches=n_batches, min_len=L, min_dup=min_dup,
        rounds=rounds,
        last_over_first=round(last / first, 2) if first else None)))


if __name__ == "__main__":
    main()
