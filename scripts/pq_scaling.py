"""PQ ANN tier scaling probe (BASELINE.md section).

Measures, at growing corpus sizes (sf0.1 embeddings re-keyed ×mult):

- ENCODE throughput (one Arrow pass, map-side);
- SEARCH wall for 8 queries: PQ/ADC over m-smallint codes vs the JVM
  float brute scan (knn_bruteforce) on the same corpus;
- the at-rest BYTES each scan must read (the 100 TB quantity): codes
  ≈ m bytes/vector vs 4·dim for float32 — measured from the actual
  parquet files, not the formula.

Honest-measurement notes (the int8 lesson, COVERAGE.md): at local
sf0.1 scale the Arrow round-trip can outweigh the arithmetic savings —
the probe records WALL and BYTES separately so the right tier is
picked per regime (bytes win at IO-bound cluster scale, wall may not
win at CPU-bound local scale).

Usage: python scripts/pq_scaling.py [multipliers...]   (default 1 4 16)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pythondataingestionprocess_spark.catalog import load_table  # noqa: E402
from pythondataingestionprocess_spark.operators import pq  # noqa: E402
from pythondataingestionprocess_spark.operators import similarity as sim  # noqa: E402
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

mults = [int(m) for m in sys.argv[1:]] or [1, 4, 16]

spark = get_spark()
base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
base.count()
dim = len(base.select("embedding").first()[0])
queries = base.filter(F.col("vec_id") < 8)
M, KSUB = 8, 256

cb = pq.pq_fit(base, m=M, ksub=min(KSUB, 16), max_iter=4)
# ksub capped at 16 for the fit pass here: sf0.1 has enough vectors
# for 256 but the probe's subject is scan scaling, not codebook
# quality; note it so the bytes row below stays honest (codes are
# still 1 byte each at rest under parquet dictionary encoding).

for mult in mults:
    corpus = base
    for i in range(1, mult):
        corpus = corpus.unionAll(
            base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        )
    corpus = corpus.localCheckpoint(eager=True)
    n = corpus.count()

    t0 = time.monotonic()
    codes = pq.pq_encode(corpus, cb)
    codes_path = f"/tmp/pq_scaling_codes_{mult}"
    codes.write.mode("overwrite").parquet(codes_path)
    t_encode = time.monotonic() - t0

    vec_path = f"/tmp/pq_scaling_vecs_{mult}"
    corpus.write.mode("overwrite").parquet(vec_path)

    def tree_bytes(p):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
        )

    codes_df = spark.read.parquet(codes_path)
    t0 = time.monotonic()
    pq.pq_search(codes_df, queries.select(F.col("vec_id").alias("q_id"), "embedding"),
                 cb, k=5, exclude_self=True).count()
    t_pq = time.monotonic() - t0

    vecs_df = spark.read.parquet(vec_path)
    t0 = time.monotonic()
    sim.knn_bruteforce(vecs_df, queries, k=5).count()
    t_brute = time.monotonic() - t0

    print(json.dumps({
        "mult": mult, "n_vectors": n, "dim": dim, "m": M,
        "encode_sec": round(t_encode, 2),
        "pq_search_sec": round(t_pq, 2),
        "brute_search_sec": round(t_brute, 2),
        "codes_parquet_bytes": tree_bytes(codes_path),
        "vectors_parquet_bytes": tree_bytes(vec_path),
    }))
