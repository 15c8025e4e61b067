"""SemDeDup scaling curve (BASELINE.md section).

The paper's scaling knob is k: clusters bound the quadratic, so at a
FIXED corpus, halving k must grow wall superlinearly (bigger cells →
more within-cell pairs), and at a fixed k the dup mass — not the
corpus — should dominate incremental cost. Two sweeps over the sf0.1
embeddings (re-keyed copies plant a 10% dup tail):

1. k sweep at mult=4: cells shrink as k grows; wall should fall until
   assignment-expression cost (k literal struct candidates per row)
   takes over — the measured crossover is the honest guidance for
   when to swap the literal assigner for the Arrow GEMM kernel.
2. corpus sweep at k=32: wall vs corpus multiplier; within-cell pair
   volume grows ~quadratically in cell size when k is held fixed,
   which is exactly the misconfiguration the k-sweep teaches against.

Usage: python scripts/semdedup_scaling.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pythondataingestionprocess_spark.catalog import load_table  # noqa: E402
from pythondataingestionprocess_spark.operators import semdedup as sd  # noqa: E402
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

spark = get_spark()
base = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
    "vec_id", "embedding"
)
base.count()


def corpus_mult(mult: int):
    c = base
    for i in range(1, mult):
        c = c.unionAll(
            base.filter(F.col("vec_id") % 10 == 0).withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
            )
        )
    return c.localCheckpoint(eager=True)


def run(corpus, k: int) -> dict:
    cents = sd.md5_centroids(base, k=k)
    t0 = time.monotonic()
    n_dropped = sd.semdedup_dropped(corpus, cents).count()
    return {"k": k, "dropped": n_dropped, "wall_sec": round(time.monotonic() - t0, 1)}


four = corpus_mult(4)
n4 = four.count()
for k in (8, 16, 32, 64):
    print(json.dumps({"sweep": "k", "docs": n4, **run(four, k)}), flush=True)

for mult in (1, 2, 4, 8):
    c = corpus_mult(mult)
    n = c.count()
    print(
        json.dumps({"sweep": "corpus", "mult": mult, "docs": n, **run(c, 32)}),
        flush=True,
    )
