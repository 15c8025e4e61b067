"""Repeated-span dedup scaling curve (BASELINE.md section).

Corpus = sf0.1 documents (5k docs) unioned with re-keyed copies. Every
copy duplicates every document verbatim, so the DUPLICATED TAIL (the
removal starts that pay the k-fold position explode) grows linearly
with the multiplier while each doc's gram stage stays map-side — the
stress test for the claim that repeated_span_dedup's cost is
gram-shuffle-bound, not pair-bound, even at pathological 100% dup
rates. Also prints the removed-token mass as a sanity check: with m
copies of everything, all but the first copy's tokens must go.

Usage: python scripts/span_scaling.py [multipliers...]  (default 1 2 4 8)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pythondataingestionprocess_spark.catalog import load_table  # noqa: E402
from pythondataingestionprocess_spark.operators.spandedup import (  # noqa: E402
    repeated_span_dedup,
)
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

mults = [int(m) for m in sys.argv[1:]] or [1, 2, 4, 8]

spark = get_spark()
base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
    "doc_id", "text"
)
base.count()  # warm the scan

for mult in mults:
    corpus = base
    for i in range(1, mult):
        corpus = corpus.unionAll(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    corpus = corpus.localCheckpoint(eager=True)
    n_docs = corpus.count()
    t0 = time.monotonic()
    out = repeated_span_dedup(corpus, k=10)
    agg = out.agg(
        F.sum("n_tokens").alias("toks"), F.sum("n_removed").alias("gone")
    ).collect()[0]
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "mult": mult,
                "docs": n_docs,
                "tokens": agg["toks"],
                "removed": agg["gone"],
                "wall_sec": round(wall, 1),
            }
        ),
        flush=True,
    )
