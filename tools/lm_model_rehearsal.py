"""LM-model accretion scaling rehearsal (r15): the scaling claim for
`build/merge/score_with_ngram_model` is NOT whole-corpus wall time
(the self-scoring rungs own that cell) — it is that PER-BATCH cost
(build the batch's model + fold it into the accreted state + score
the batch against the accreted model) stays ~flat as the model grows,
because each round pays O(batch) count work plus model-VOCABULARY-
sized merges and joins, and the gram vocabulary grows Heaps-sublinear
in corpus age — never corpus-sized.

Protocol: split the sf documents table into N equal batches by doc_id
hash, accrete an order-2 model across rounds 1..N (merged state
pinned between rounds, like the streaming sink), and in each round
score THAT batch against the post-merge model, forcing the scores
through a computed aggregate (a bare count() would let Catalyst prune
the model joins — the r12 bench lesson). If round N costs ~round 1
while the model holds ~N batches' vocabulary, the streaming sink's
100 TB story (per-batch cost independent of corpus age) is measured,
not argued.

Usage: python tools/lm_model_rehearsal.py [sf_dir] [n_batches]
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
    from crysda_spark.pipeline.text import (build_ngram_model,
                                            merge_ngram_model,
                                            score_with_ngram_model)
    from crysda_spark.plans.cache import pin, pin_scope
    from crysda_spark.session import get_spark

    spark = get_spark("lm_model_rehearsal")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    docs.count()  # warm footer caches outside the timed region

    order = 2
    model = None
    rounds = []
    for b in range(n_batches):
        batch = Frame(docs.filter(F.pmod(F.xxhash64("doc_id"),
                                         F.lit(n_batches)) == b))
        t0 = time.perf_counter()
        delta = build_ngram_model(batch, "text", order=order)
        if model is None:
            merged = delta
        else:
            merged = merge_ngram_model(*model, *delta)
        # pin + MATERIALIZE the merged gram/vocab tables (the state the
        # next round folds into and this round's scorer joins against),
        # and cut the 1-row stats' lineage — then drop ONLY the
        # superseded state, so executor cache stays O(1) in batch
        # count and no round recomputes the merge chain
        new_g = Frame(pin(merged[0].sdf))
        new_v = Frame(pin(merged[1].sdf))
        gram_rows = new_g.sdf.count()
        new_v.sdf.count()
        new_s = Frame(spark.createDataFrame(merged[2].sdf.collect(),
                                            merged[2].sdf.schema))
        with pin_scope():  # scorer's internal cn pin, released after
            scored = score_with_ngram_model(batch, "text", "doc_id",
                                            new_g, new_v, new_s,
                                            add_k=1.0)
            # force the model joins through a computed aggregate
            agg = scored.sdf.agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(f"lm{order}_logprob"), 2).alias("mass")
            ).collect()[0]
        secs = round(time.perf_counter() - t0, 2)
        stats_row = new_s.sdf.collect()[0]
        if model is not None:
            model[0].sdf.unpersist()
            model[1].sdf.unpersist()
        model = (new_g, new_v, new_s)
        rounds.append(dict(batch=b, secs=secs, docs=int(agg["n"]),
                           logprob_mass=float(agg["mass"]),
                           model_gram_rows=int(gram_rows),
                           model_n_grams=int(stats_row["n_grams"]),
                           load1=round(os.getloadavg()[0], 2)))
        print(f"# round {b}: {secs}s docs={agg['n']} "
              f"grams={gram_rows} load1={rounds[-1]['load1']}",
              file=sys.stderr)
    model[0].sdf.unpersist()
    model[1].sdf.unpersist()
    first, last = rounds[0]["secs"], rounds[-1]["secs"]
    print(json.dumps(dict(
        metric="lm_model_accrete_per_batch", sf_dir=sf_dir,
        n_batches=n_batches, order=order, rounds=rounds,
        last_over_first=round(last / first, 2) if first else None)))


if __name__ == "__main__":
    main()
