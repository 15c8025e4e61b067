"""Batched-BPE pass curve at vocabulary scale (r12 VERDICT item 2).

Two probes, both recorded in BASELINE.md's round-13 entry:

1. A diverse natural-text corpus (this repo's own markdown + package
   source, ~23.6k lines / ~4.6k distinct letters-only words): trains
   n_merges=2000 and prints the pass/batch-size curve — the evidence
   that `learn_bpe_merges_batched` is O(passes), not O(merges), at
   10x the r12-tested scale.
2. The honest bound: /root/testdata/sf0.1/documents.parquet draws
   from a 31-distinct-word pool, so BPE EXHAUSTS the vocabulary after
   ~107 merges with tie-heavy tiny batches — the testdata cannot
   evidence the vocabulary-scale claim, and this script says so with
   numbers instead of hiding it.

Usage: python scripts/bpe_scaling.py [n_merges]
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pythondataingestionprocess_spark.session import get_spark  # noqa: E402
from pythondataingestionprocess_spark.operators.bpe import (  # noqa: E402
    learn_bpe_merges_batched,
    word_counts,
)

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")


def probe(docs, n_merges: int, label: str, **kw) -> None:
    stats: dict = {}
    t0 = time.time()
    merges = learn_bpe_merges_batched(
        docs, n_merges=n_merges, min_count=2, top_t=512, stats=stats, **kw
    )
    bs = stats["batch_sizes"]
    dec = [bs[i * len(bs) // 10:(i + 1) * len(bs) // 10] for i in range(10)]
    print(json.dumps({
        "corpus": label,
        "n_merges_requested": n_merges,
        "n_merges_learned": len(merges),
        "passes": stats["passes"],
        "wall_sec": round(time.time() - t0, 1),
        # a corpus with no pair above min_count learns nothing —
        # report that honestly rather than crashing on min([])
        "batch_min": min(bs) if bs else None,
        "batch_max": max(bs) if bs else None,
        "batch_mean": round(sum(bs) / len(bs), 2) if bs else None,
        "decile_means": [
            round(sum(d) / len(d), 1) if d else None for d in dec
        ],
    }))


# probe 1: natural text with a real vocabulary
rows = []
for path in glob.glob("/root/repo/*.md") + glob.glob(
    "/root/repo/pythondataingestionprocess_spark/**/*.py", recursive=True
):
    with open(path, errors="replace") as f:
        rows.extend((ln.strip(),) for ln in f if ln.strip())
docs_repo = spark.createDataFrame(rows, "text string")
n_words = word_counts(docs_repo, word_pattern="^[a-z]+$").count()
print(f"repo corpus: {len(rows)} lines, {n_words} distinct words")
probe(docs_repo, N_MERGES, "repo-text", word_pattern="^[a-z]+$")

# probe 2: the testdata bound (31-word pool -> vocabulary exhaustion)
docs_sf = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
probe(docs_sf, N_MERGES, "sf0.1-documents")
