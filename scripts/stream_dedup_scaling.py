"""Streaming dedup-ingest scaling: per-batch cost as the PERSISTENT
SIGNATURE STORE grows (BASELINE.md section; VERDICT r2 item 4 — the
streaming twin of scripts/incr_scaling.py).

The claim under test: `streaming/dedup_ingest.py`'s per-batch work
(screen within-batch + probe the store's band buckets + verify + append
the batch's signatures) stays ~flat as the store grows 100k → 400k
docs, because (a) the bucket probe is an equi-join that shuffles the
BATCH side only, and (b) the verify step semi-prunes the store's
shingle table to candidate ids before touching payloads — nothing in
the batch path is corpus×corpus.

Corpus design (realistic crawl shape, unlike the dense replica worst
case): store docs carry UNIQUE pseudo-random text (60 md5-derived
tokens keyed by doc_id — no accidental near-dups), except the first
5k docs which are the real sf0.1 documents. Each measured batch is 5k
docs: 90% novel pseudo-random text + 10% re-keyed copies of the real
docs (the planted dups). Expected cross-pairs therefore stay ~constant
(~500) as the store grows — any wall growth is pure store-size cost.

Usage: python scripts/stream_dedup_scaling.py [store sizes in 5k-doc units]
(default checkpoints at 20, 40, 60, 80 units = 100k..400k docs)
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
from pythondataingestionprocess_spark.streaming.dedup_ingest import (  # noqa: E402
    append_to_store,
    screen_batch,
)

checkpoints = [int(m) for m in sys.argv[1:]] or [20, 40, 60, 80]

spark = get_spark(app_name="stream-dedup-scaling")
spark.sparkContext.setLogLevel("ERROR")

base = (
    load_table(spark, "/root/testdata/sf0.1", "documents")
    .select("doc_id", "text")
    .localCheckpoint(eager=True)
)
n_base = base.count()


def pseudo_docs(id_lo: int, n: int):
    """n docs with unique 60-token pseudo-random text (md5-keyed by
    doc_id) — mutually non-near-dup by construction."""
    return spark.range(id_lo, id_lo + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(60)),
                lambda k: F.substring(
                    F.md5(F.concat_ws("_", F.col("id").cast("string"), k.cast("string"))),
                    1,
                    8,
                ),
            ),
        ).alias("text"),
    )


store_dir = tempfile.mkdtemp(prefix="stream_dedup_store_")
print(f"# base={n_base} real docs, store at {store_dir}", file=sys.stderr)

grown = 0  # 5k-doc units in the store
try:
    for target in checkpoints:
        # grow the store to `target` units (untimed bulk backfill):
        # unit 0 = the real docs, later units = unique pseudo docs
        while grown < target:
            chunk = min(10, target - grown)
            if grown == 0:
                bulk = base.unionAll(pseudo_docs(10_000_000, (chunk - 1) * n_base))
            else:
                bulk = pseudo_docs(10_000_000 + grown * n_base, chunk * n_base)
            append_to_store(bulk, store_dir, batch_id=grown)
            grown += chunk
        store_docs = grown * n_base

        # measured batch: 90% novel pseudo docs + 10% planted re-keyed
        # real docs — expected cross-pairs ~constant across store sizes
        novel = pseudo_docs(900_000_000 + grown * n_base, int(n_base * 0.9))
        planted = (
            base.filter(F.col("doc_id") % 10 == 0)
            .withColumn("doc_id", F.col("doc_id") + F.lit(950_000_000))
        )
        batch = novel.unionAll(planted).localCheckpoint(eager=True)
        n_batch = batch.count()

        t0 = time.monotonic()
        pairs = screen_batch(spark, batch, store_dir)
        n_cross = pairs.filter(F.col("kind") == "cross").count()
        wall_screen = time.monotonic() - t0
        t1 = time.monotonic()
        append_to_store(batch, store_dir, batch_id=1_000_000 + grown)
        wall_append = time.monotonic() - t1

        rec = {
            "store_docs": store_docs,
            "batch_docs": n_batch,
            "cross_pairs": n_cross,
            "screen_s": round(wall_screen, 1),
            "append_s": round(wall_append, 1),
        }
        print(json.dumps(rec), flush=True)
finally:
    shutil.rmtree(store_dir, ignore_errors=True)
