"""MinHash-LSH dedup scaling curve (BASELINE.md section).

Corpus = sf0.1 documents (5k docs) unioned with re-keyed copies: each
copy multiplies exact-duplicate group sizes, so TRUE PAIR COUNT grows
~quadratically in the multiplier while INPUT grows linearly — the
stress test for candidate generation staying bucket-bounded.

Usage: python scripts/dedup_scaling.py [multipliers...]  (default 1 2 4 8 16 80)
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

mults = [int(m) for m in sys.argv[1:]] or [1, 2, 4, 8, 16, 80]

spark = get_spark()
base = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
base.count()  # warm the scan

for mult in mults:
    corpus = base
    for i in range(1, mult):
        corpus = corpus.unionAll(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    corpus = corpus.localCheckpoint(eager=True)  # isolate build cost from dedup cost
    n_docs = corpus.count()
    t0 = time.monotonic()
    n_pairs = dd.minhash_lsh_pairs(corpus, "doc_id", "text", threshold=0.5).count()
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {"mult": mult, "docs": n_docs, "pairs": n_pairs, "wall_sec": round(wall, 1)}
        ),
        flush=True,
    )
