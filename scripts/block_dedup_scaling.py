"""Block-level (C4-style) dedup scaling curve (BASELINE.md section).

Corpus = sf0.1 documents (5k docs) unioned with re-keyed copies: each
copy multiplies the duplicate multiplicity of EVERY block, so the
window groups on block_text grow linearly in the multiplier while the
output (per-doc retention) also grows linearly — the stress test is
that wall time tracks input, i.e. the block_text shuffle stays keyed
by content and per-group work stays O(group).

Usage: python scripts/block_dedup_scaling.py [multipliers...]
       (default 1 4 16 64)
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

mults = [int(m) for m in sys.argv[1:]] or [1, 4, 16, 64]

spark = get_spark()
base = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
base.count()  # warm the scan

for mult in mults:
    corpus = base
    for i in range(1, mult):
        corpus = corpus.unionAll(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    corpus = corpus.localCheckpoint(eager=True)  # isolate build cost
    n_docs = corpus.count()
    t0 = time.monotonic()
    ret = dd.block_dedup_retention(corpus, "doc_id", "text")
    agg = ret.agg(
        F.sum("n_blocks").alias("blocks"), F.sum("n_kept").alias("kept")
    ).collect()[0]
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "mult": mult,
                "docs": n_docs,
                "blocks": int(agg["blocks"]),
                "kept": int(agg["kept"]),
                "wall_sec": round(wall, 1),
            }
        ),
        flush=True,
    )
