"""Span-dedup FIXPOINT convergence probe (r10 VERDICT item 5 /
BASELINE.md section).

How many passes does `repeated_span_dedup_fixpoint` need on a real
corpus, and how fast do marginal removals decay? Runs the wrapper at
sf0.1 (natural repeats) and on the same corpus with a planted
cascade-heavy overlay (every 10th doc re-keyed verbatim — 100% dup
mass for those docs, maximizing removal-created adjacencies), printing
passes, per-pass removed-token mass, and per-pass wall time.

Usage: python scripts/span_fixpoint_probe.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pythondataingestionprocess_spark.catalog import load_table  # noqa: E402
from pythondataingestionprocess_spark.operators.spandedup import (  # noqa: E402
    repeated_span_dedup_fixpoint,
)
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark()
base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
base.count()  # warm the scan

planted = base.unionAll(
    base.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
).localCheckpoint(eager=True)

for label, corpus in (("natural", base), ("planted_10pct", planted)):
    stats: dict = {}
    t0 = time.monotonic()
    out = repeated_span_dedup_fixpoint(corpus, k=10, stats=stats)
    agg = out.agg(
        F.sum("n_tokens").alias("toks"), F.sum("n_removed").alias("gone")
    ).collect()[0]
    wall = time.monotonic() - t0
    print(json.dumps({
        "corpus": label,
        "n_docs": corpus.count(),
        "total_tokens": int(agg["toks"]),
        "total_removed": int(agg["gone"]),
        "passes": stats["passes"],
        "removed_per_pass": stats["removed_per_pass"],
        "wall_sec": round(wall, 2),
    }))
