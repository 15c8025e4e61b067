"""Cross-partitioning determinism: the repo's oracle discipline
(decimal-accumulated sums, total-order rankings, tie-free windows)
claims results don't depend on HOW the data is partitioned. This
meta-test enforces it mechanically: value-sensitive queries must
return byte-identical result sets under different shuffle-partition
counts — the local stand-in for "same answer on 32 threads and on a
1000-executor cluster"."""

from __future__ import annotations

import pytest

from pythondataingestionprocess_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# Queries whose outputs exercise the risky surfaces: double sums
# (order-sensitive if not decimal-accumulated), window ranking ties,
# ratio-of-sums division, top-k cuts, and the merge identity.
SENSITIVE = [
    "pricing_summary",            # decimal-accumulated double sums
    "trend_slope_per_nation",     # moments + IEEE closed form
    "hierarchical_revenue_share", # window sums + ratios
    "topk_per_group",             # rank ties must be total-ordered
    "incremental_agg_maintenance",# partial-state merge identity
    "window_edge_values",         # frame-edge picks under ties
    "dedup_fingerprint",          # hash-grouped exact dedup
    "corpus_block_dedup",         # global-first window under block ties
    "corpus_weighted_sample",     # rounded ln(u)/w keys + rank cut
    "inverted_index_postings",    # bounded postings + top-100 cut
    "bm25_retrieval_topk",        # rounded ln-based scores + top-20 cut
    "corpus_temperature_mix",     # decimal-summed normalizer + md5 Bernoulli
]


def _canon(df) -> list[tuple]:
    rows = [tuple(str(v) for v in r) for r in df.collect()]
    return sorted(rows)


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_identical_across_partitionings(spark, name):
    spec = REGISTRY[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _canon(spec.fn(spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = _canon(spec.fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name} output depends on partitioning"
