"""Incremental-dedup scaling: batch-vs-corpus cost as the CORPUS grows
(BASELINE.md section).

The claim under test: with `minhash_lsh_pairs_incremental`, deduping a
fixed-size new batch against an ever-larger corpus costs ~(one corpus
signature pass + batch work) — NOT the full-corpus pair generation that
re-running `minhash_lsh_pairs` on corpus+batch would pay. At 100 TB the
corpus signatures are a precomputed table, so the marginal daily cost is
the batch alone; here we measure both the full incremental run and, as
the comparison bar, the self-join run over the same union.

Usage: python scripts/incr_scaling.py [multipliers...]  (default 1 2 4 8 16)
Set SKIP_FULL=1 to measure only the incremental path (the full-run
comparison at large multipliers is already in BASELINE.md's main
dedup curve).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pythondataingestionprocess_spark.catalog import load_table  # noqa: E402
from pythondataingestionprocess_spark.operators import dedup as dd  # noqa: E402
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

mults = [int(m) for m in sys.argv[1:]] or [1, 2, 4, 8, 16]

spark = get_spark()
base = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
base.count()  # warm the scan

# fixed new batch: 10% of the base corpus, re-keyed (so every batch doc
# that is a copy of a corpus doc is a planted cross near-dup)
batch = (
    base.filter(F.col("doc_id") % 10 == 0)
    .withColumn("doc_id", F.col("doc_id") + F.lit(900_000_000))
    .localCheckpoint(eager=True)
)
n_batch = batch.count()

for mult in mults:
    corpus = base
    for i in range(1, mult):
        corpus = corpus.unionAll(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    corpus = corpus.localCheckpoint(eager=True)
    n_docs = corpus.count()

    t0 = time.monotonic()
    n_cross = dd.minhash_lsh_pairs_incremental(
        corpus, batch, "doc_id", "text", threshold=0.5
    ).count()
    wall_incr = time.monotonic() - t0

    if os.environ.get("SKIP_FULL"):
        n_full, wall_full = None, None
    else:
        t1 = time.monotonic()
        n_full = dd.minhash_lsh_pairs(
            corpus.unionAll(batch), "doc_id", "text", threshold=0.5
        ).count()
        wall_full = time.monotonic() - t1

    print(
        json.dumps(
            {
                "mult": mult,
                "corpus_docs": n_docs,
                "batch_docs": n_batch,
                "cross_pairs": n_cross,
                "incr_wall_sec": round(wall_incr, 1),
                "full_pairs": n_full,
                "full_wall_sec": None if wall_full is None else round(wall_full, 1),
            }
        ),
        flush=True,
    )
