"""Marginal-batch-cost probe for the streaming dedup store screens.

Claim under test (dedup_ingest module docstring): the per-batch screen
cost stays proportional to the BATCH as the store grows — the store is
semi-pruned map-side, never fully shuffled, and candidates are
per-bucket capped. This script grows a minhash signature store batch
by batch and times ``screen_batch`` for a fixed-size probe batch at
increasing store sizes, then compacts and re-times (the accreted
ingest_batch subdirs cost file listings; compaction restores them).

Run:  python scripts/store_scaling.py [n_batches] [docs_per_batch]
Writes one human-readable table to stdout; paste into BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pythondataingestionprocess_spark.session import get_spark  # noqa: E402
from pythondataingestionprocess_spark.streaming import dedup_ingest as di  # noqa: E402


def synth_docs(spark, n, offset, dup_every=10):
    """n docs; every ``dup_every``-th repeats a fixed boilerplate so
    the store develops real duplicate buckets."""
    rows = []
    for i in range(n):
        doc_id = offset + i
        if i % dup_every == 0:
            text = "common boilerplate header repeated across the corpus daily"
        else:
            text = " ".join(f"w{doc_id}x{j}" for j in range(40))
        rows.append((doc_id, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    store = tempfile.mkdtemp(prefix="store_scaling_")
    probe = synth_docs(spark, per_batch, offset=10_000_000).localCheckpoint()
    checkpoints = {max(1, n_batches // 4), n_batches // 2, n_batches}

    print(f"# store-scaling probe: {n_batches} batches x {per_batch} docs, "
          f"probe batch = {per_batch} docs")
    print("store_batches  screen_wall_s  n_pairs")
    for b in range(1, n_batches + 1):
        di.append_to_store(
            synth_docs(spark, per_batch, offset=b * per_batch), store, batch_id=b
        )
        if b in checkpoints:
            t0 = time.perf_counter()
            n_pairs = di.screen_batch(spark, probe, store).count()
            print(f"{b:13d}  {time.perf_counter() - t0:12.2f}  {n_pairs}")

    t0 = time.perf_counter()
    stats = di.compact_store(spark, store)
    compact_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_pairs = di.screen_batch(spark, probe, store).count()
    post = time.perf_counter() - t0
    print(f"# compacted in {compact_wall:.1f}s: "
          + ", ".join(f"{t} {a}->{z} files" for t, (a, z) in stats.items()))
    print(f"{'compacted':>13s}  {post:12.2f}  {n_pairs}")


if __name__ == "__main__":
    main()


def embedding_probe(n_batches: int = 16, per_batch: int = 400) -> None:
    """Same marginal-cost probe for the EMBEDDING store: fixed probe
    batch, growing vector store, 5% planted duplicates."""
    import numpy as np

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pythondataingestionprocess_spark.streaming import (
        embedding_ingest as ei,
    )
    import tempfile

    store = tempfile.mkdtemp(prefix="emb_scaling_")
    rng = np.random.default_rng(11)
    base = rng.standard_normal((per_batch, 64))

    def batch(offset, reuse_frac=0.05):
        rows = []
        fresh = rng.standard_normal((per_batch, 64))
        for i in range(per_batch):
            vec = base[i] if i < per_batch * reuse_frac else fresh[i]
            rows.append((offset + i, [float(x) for x in vec]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    probe = batch(10_000_000).localCheckpoint()
    checkpoints = {max(1, n_batches // 4), n_batches // 2, n_batches}
    print(f"# embedding-store probe: {n_batches} batches x {per_batch} vecs")
    print("store_batches  screen_wall_s  n_pairs")
    for b in range(1, n_batches + 1):
        ei.append_to_store(batch(b * per_batch), store, batch_id=b)
        if b in checkpoints:
            t0 = time.perf_counter()
            n = ei.screen_batch(spark, probe, store).count()
            print(f"{b:13d}  {time.perf_counter() - t0:12.2f}  {n}")
