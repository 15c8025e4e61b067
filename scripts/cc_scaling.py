"""Connected-components scaling: pairs → groups on the 400k-doc corpus
(BASELINE.md). Measures the full dedup-grouping pipeline: MinHash-LSH
pair generation, then min-label propagation CC over the ~17M-pair graph.

Usage: python scripts/cc_scaling.py [multiplier]   (default 80)
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
from pythondataingestionprocess_spark.operators.components import (  # noqa: E402
    connected_components,
)
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

mult = int(sys.argv[1]) if len(sys.argv) > 1 else 80

spark = get_spark()
base = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
corpus = base
for i in range(1, mult):
    corpus = corpus.unionAll(
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
    )
corpus = corpus.localCheckpoint(eager=True)
n_docs = corpus.count()

t0 = time.monotonic()
pairs = dd.minhash_lsh_pairs(corpus, "doc_id", "text", threshold=0.5).localCheckpoint(
    eager=True
)
n_pairs = pairs.count()
t_pairs = time.monotonic() - t0

t1 = time.monotonic()
comps = connected_components(pairs)
n_groups = comps.select("group_id").distinct().count()
n_grouped_docs = comps.count()
t_cc = time.monotonic() - t1

print(
    json.dumps(
        {
            "mult": mult,
            "docs": n_docs,
            "pairs": n_pairs,
            "grouped_docs": n_grouped_docs,
            "groups": n_groups,
            "pairs_sec": round(t_pairs, 1),
            "cc_sec": round(t_cc, 1),
        }
    )
)
