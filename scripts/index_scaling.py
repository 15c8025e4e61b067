"""Inverted-index + BM25 scaling curve (BASELINE.md section).

Corpus = sf0.1 documents (5k docs) unioned with re-keyed copies. Index
build cost should track the (term, doc) postings count (linear in the
multiplier); BM25 cost should track the QUERY-TERM postings only —
the term filter cuts the explode before any shuffle, so the retrieval
wall grows far slower than the corpus.

Usage: python scripts/index_scaling.py [multipliers...] (default 1 4 16 64)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pythondataingestionprocess_spark.catalog import load_table  # noqa: E402
from pythondataingestionprocess_spark.plans.corpus_ops import (  # noqa: E402
    _BM25_TERMS,
    _partial_index,
    _words,
    bm25_topk,
    merge_index_states,
)
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
    corpus = corpus.localCheckpoint(eager=True)
    n_docs = corpus.count()

    terms = _words(corpus).select("doc_id", F.explode(F.col("ws")).alias("term"))
    t0 = time.monotonic()
    idx = merge_index_states(
        _partial_index(terms.filter(F.col("doc_id") % 2 == 0)),
        _partial_index(terms.filter(F.col("doc_id") % 2 == 1)),
    )
    n_terms = idx.count()
    index_wall = time.monotonic() - t0

    t0 = time.monotonic()
    # the SHARED plan body the registered query runs — the curve can
    # never silently measure a stale shape
    hits = bm25_topk(corpus, _BM25_TERMS, k=20).count()
    bm25_wall = time.monotonic() - t0

    print(
        json.dumps(
            {
                "mult": mult,
                "docs": n_docs,
                "index_terms": n_terms,
                "index_wall_sec": round(index_wall, 1),
                "bm25_hits": hits,
                "bm25_wall_sec": round(bm25_wall, 1),
            }
        ),
        flush=True,
    )
