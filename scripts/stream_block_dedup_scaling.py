"""Streaming block-dedup per-batch cost vs store size (BASELINE.md).

Seeds the block store from multiplied sf0.1 corpora, then screens the
SAME fixed 1000-doc batch against each store size. The semi-prune
contract says per-batch wall should stay flat as the store grows (the
store is scanned map-side, never shuffled); without it the anti-join
hash-partitions the whole store every batch.

Usage: python scripts/stream_block_dedup_scaling.py [multipliers...]
       (default 4 16 64)
"""
from __future__ import annotations

import json
import shutil
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pythondataingestionprocess_spark.catalog import load_table  # noqa: E402
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402
from pythondataingestionprocess_spark.streaming import dedup_ingest as di  # noqa: E402

mults = [int(m) for m in sys.argv[1:]] or [4, 16, 64]

spark = get_spark()
base = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
base.count()
batch = base.filter(F.col("doc_id") < 1000).localCheckpoint(eager=True)

for mult in mults:
    corpus = base
    for i in range(1, mult):
        # interleaving a per-copy token into every gap puts it in every
        # block, so each copy contributes all-new distinct hashes —
        # the store GROWS linearly in the multiplier
        corpus = corpus.unionAll(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            .withColumn("text", F.regexp_replace("text", " ", f" c{i} "))
        )
    root = tempfile.mkdtemp(prefix="blockstore_")
    try:
        di.append_blocks_to_store(corpus, root, batch_id=0)
        store_hashes = spark.read.parquet(f"{root}/blocks").count()
        t0 = time.monotonic()
        ret = di.block_screen_batch(spark, batch, root, batch_id=1)
        agg = ret.agg(
            F.sum("n_blocks").alias("nb"), F.sum("n_kept").alias("nk")
        ).collect()[0]
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "mult": mult,
                    "store_hashes": store_hashes,
                    "batch_blocks": int(agg["nb"]),
                    "batch_kept": int(agg["nk"]),
                    "screen_wall_sec": round(wall, 1),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
