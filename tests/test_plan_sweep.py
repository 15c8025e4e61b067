"""Registry-wide plan anti-pattern sweep (scripts/plan_sweep.py).

The hand-written guards in test_plans.py pin the designed shape of
the flagship queries; this sweep is the broad tripwire over EVERY
registered query: no CartesianProduct / BroadcastNestedLoopJoin
outside the hand-reviewed scalar-broadcast and graph whitelists, no
row-at-a-time BatchEvalPython anywhere, and the vectorized-Python
surface (Arrow / grouped-pandas) stays exactly the sanctioned set.
"""

from __future__ import annotations

import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "plan_sweep", "/root/repo/scripts/plan_sweep.py"
)
plan_sweep = importlib.util.module_from_spec(spec)
sys.modules["plan_sweep"] = plan_sweep
spec.loader.exec_module(plan_sweep)

from pythondataingestionprocess_spark.plans import REGISTRY  # noqa: E402

SANCTIONED_VECTORIZED = {
    "doc_packing_greedy",
    "doc_packing_lookahead",
    "multimodal_decode_stats",
    "multimodal_frame_sample",
    "dedup_embedding_cosine",
    "embedding_ann_lsh",
    "embedding_ann_ivf",
}

SF_DIR = "/root/testdata/sf0.001"


def test_no_unsanctioned_plan_antipatterns_anywhere(spark):
    out = plan_sweep.sweep(spark, SF_DIR)
    assert out["unsanctioned"] == {}, out["unsanctioned"]
    assert set(out["vectorized_python"]) == SANCTIONED_VECTORIZED
    assert out["n_queries"] == len(REGISTRY)
    # whitelists must not rot: every entry still registered
    assert plan_sweep.NESTED_LOOP_OK <= set(REGISTRY)
