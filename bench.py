#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": N}.

Each query is fully materialized through the noop sink (no driver
collect, no column pruning shortcut), after a small warmup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pythondataingestionprocess_spark.plans import REGISTRY  # noqa: E402
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

# Representative headline set — scan/filter/join/agg/window/dedup/
# similarity coverage. Extend as operators land.
HEADLINE = [
    "flagship_revenue_by_nation",
    "pricing_summary",
    "broadcast_dim_join",
    "left_join_reverse_agg",
    "multi_agg_stats",
    "semi_join_membership",
    "anti_join_dedup",
    "top_orders_by_price",
    "scalar_subquery_small_qty",
    "having_large_orders",
    "bilateral_trade_volume",
    "rollup_agg",
    "pivot_status_revenue",
    "histogram_quantity",
    "union_all_slices",
    "window_running_total",
    "forward_fill_locf",
    "topk_per_group",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "embedding_knn_brute",
    "embedding_ann_lsh",
    "text_quality_score",
    "text_tfidf_top_terms",
    "events_tumbling_window",
    "events_session_window",
    "events_asof_last_click",
    # r2 additions
    "dedup_groups_cc",
    "text_contamination_check",
    "doc_packing_shards",
    "exists_agg_discounted_orders",
    "qualify_above_avg_suppliers",
    "fuzzy_join_symdelete",
    "pit_scd2_price_join",
    "dedup_incremental_minhash",
    "dedup_keep_one",
    "text_pii_redact",
    "events_concurrency_peak",
    "pagerank_nations",
    # r4 additions
    "q11_important_parts",
    "q15_top_supplier",
    "q16_supplier_count",
    "q20_dominant_suppliers",
    "scd2_build_user_state",
    "cdc_snapshot_latest",
    "islands_user_activity",
    "text_bigram_lm",
    # r5 additions
    "q21_waiting_suppliers",
    "q13_order_count_distribution",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q18_large_volume_customers",
    "dedup_containment",
    "events_funnel_watermark",
    # late-r5 additions (staged for the r6 driver window)
    "stream_static_revenue_rollup",
    "q9_profit_by_nation_year",
    # late-r5 additions (staged for r7)
    "events_pattern_match",
    "events_decayed_feature",
    "events_resample_interpolate",
    "corpus_curation_filter",
    "text_bpe_pair_counts",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q12_lateness_priority",
    "events_next_event_training",
    "corpus_build_pipeline",
    "equidepth_price_bands",
    # r5 continuation additions (staged for r8)
    "incremental_agg_maintenance",
    "trend_slope_per_nation",
    "feature_winsorize_robust",
    "zorder_layout_cells",
    "copurchase_triangles",
    "part_clustering_coefficient",
    "pii_pseudonymize_vault",
    "unpivot_charge_components",
    "hierarchical_revenue_share",
    "window_edge_values",
    "recursive_cte_subtree_rollup",
    "dq_order_reconciliation",
    # second-continuation additions (staged for r9)
    "corpus_block_dedup",
    "doc_chunking_overlap",
    "inverted_index_postings",
    "train_val_test_split",
    "corpus_weighted_sample",
    "inverted_index_incremental",
    "bm25_retrieval_topk",
    "corpus_temperature_mix",
    # r13 addition (staged for r14): the oracle-checked REAL media
    # decode face — two Arrow mapInPandas stages (closed-form blob
    # synthesis + the real decoders) over the documents table
    "multimodal_real_decode_roundtrip",
    # r14 addition (staged for r15): the ANN recall certificate —
    # registered-config LSH + brute-force top-5 + recall join
    "embedding_ann_recall",
    # r15 addition (staged for r16): TPC-H Q2 — correlated min
    # supplycost decorrelated to one fact shuffle + a partitioned
    # window over the aggregated supply pairs
    "q2_min_cost_supplier",
]

# Where the full per-query detail lands (module-level so tests can
# redirect it to a tmp dir instead of stomping the committed file).
DETAIL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
)

# Registry-retired plans that the R1 bench anchor still times: the
# 28-query r1_subset must stay COMPOSITION-IDENTICAL across rounds to
# remain the ledger's comparable number, so a retired query's plan
# lives on here (bench-only — not driver-checked; the binning
# equivalence is pinned in tests/test_plans.py).
def _histogram_quantity_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    from pythondataingestionprocess_spark.plans.core_relational import _t
    from pythondataingestionprocess_spark.plans.registry import dec_sum

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.withColumn(
            "bucket",
            F.width_bucket(F.col("l_quantity"), F.lit(0), F.lit(50), F.lit(10)),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("l_extendedprice", "sum_price"))
    )


RETIRED_BENCH_PLANS = {"histogram_quantity": _histogram_quantity_plan}

# The 28-query subset shared by every round's bench since r1 — its
# total is the round-over-round comparable number (VERDICT r2 item 8);
# the full HEADLINE total moves whenever new queries land.
R1_SUBSET = [
    "flagship_revenue_by_nation",
    "pricing_summary",
    "broadcast_dim_join",
    "left_join_reverse_agg",
    "multi_agg_stats",
    "semi_join_membership",
    "anti_join_dedup",
    "top_orders_by_price",
    "scalar_subquery_small_qty",
    "having_large_orders",
    "bilateral_trade_volume",
    "rollup_agg",
    "pivot_status_revenue",
    "histogram_quantity",
    "union_all_slices",
    "window_running_total",
    "forward_fill_locf",
    "topk_per_group",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "embedding_knn_brute",
    "embedding_ann_lsh",
    "text_quality_score",
    "text_tfidf_top_terms",
    "events_tumbling_window",
    "events_session_window",
    "events_asof_last_click",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def calibrate(spark) -> float:
    """Fixed CPU-bound reference job (no I/O, no data dependence):
    hash-aggregate over a generated range. Published as ``calib_sec``
    so round-over-round query timings can be read as ratios against
    the same host's speed that day — this round's uniform ~25% drift
    on identical plans showed absolute seconds alone mislead."""
    import pyspark.sql.functions as F

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).select(
            (F.col("id") * 2654435761 % 97).alias("k")
        ).groupBy("k").count().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _loadavg_1m() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # platform without getloadavg
        return None


def host_noise_verdict(
    calib: float,
    calib_end: float,
    load_start: float | None,
    load_end: float | None,
    cores: int,
) -> str:
    """Self-interpretation of the host-context fields (r9 VERDICT
    item 6 — the reading rules used to live only in BASELINE.md
    prose, so a polluted artifact did not flag itself):

    - end/start calib ratio outside ±20% (inclusive boundary: 0.80
      and 1.20 are clean BY RULE) → the host's speed CHANGED mid-run;
      per-query timings are not mutually comparable. The band was
      ±15% through r13; widened per r13 VERDICT item 7 because the
      calibration probe's own variance exceeds raw-wall variance on
      this host (r13 ledger: calibs moved 0.41→0.33 between two runs
      whose raw walls matched within 0.6%).
    - loadavg above the core count on either edge → the sweep
      competed for CPU; the total is an upper bound.
    - loadavg well above idle at START (before the sweep ran — e.g.
      the r9 driver artifact's 4.4-5.3) → ambient background load;
      compare only within-run ratios / the s-per-calib ledger.

    Returns 'clean' or a compact 'WARN: ...' string that rides both
    JSON lines into the committed BENCH artifact."""
    notes = []
    if calib and calib_end:
        ratio = calib_end / calib
        if not (0.80 <= ratio <= 1.20):
            notes.append(
                f"calib drifted {ratio:.2f}x mid-run (outside +/-20%)"
            )
    loads = [x for x in (load_start, load_end) if x is not None]
    if loads and max(loads) > cores:
        notes.append(
            f"loadavg {max(loads):.1f} above core count {cores}; "
            "total is an upper bound"
        )
    elif load_start is not None and load_start > 4:
        notes.append(
            f"ambient loadavg {load_start:.1f} at start; "
            "compare within-run ratios only"
        )
    return ("WARN: " + "; ".join(notes)) if notes else "clean"


# Pre-start quiet gate + one-shot retry (r13 VERDICT item 4): three
# consecutive official BENCH artifacts were WARN'd by ambient load /
# mid-run calib drift while same-session ledger reruns were clean —
# the archived number was systematically the worst one. The ambient
# threshold matches host_noise_verdict's "ambient loadavg > 4" rule.
QUIET_LOAD = 4.0
# 120 s through r14; the r14 official artifact still archived a WARN
# because the gate gave up after a short wait against ambient 6.5
# (r14 VERDICT item "What's wrong 1") — a few minutes of bounded
# patience is cheaper than a polluted committed number.
QUIET_WAIT_MAX_SEC = int(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT", 300))


def _wait_for_quiet_host() -> float:
    """Bounded pre-start wait for ambient load to drop below the
    threshold. Returns seconds waited (0.0 when already quiet)."""
    waited = 0.0
    while waited < QUIET_WAIT_MAX_SEC:
        load = _loadavg_1m()
        if load is None or load <= QUIET_LOAD:
            break
        time.sleep(10)
        waited += 10
    return waited


def run_sweep(spark, sf_dir: str, names, plan_fn, sf) -> dict:
    """One full timed sweep: warmup, calib, per-query walls, end calib.

    Host-context fields (r7 VERDICT #2 / item 4): the official r7
    artifact recorded 127.7 s on a contended host while a same-day
    equal-calib rerun measured 105.6 s — the start-of-run calib
    scalar alone cannot certify a run. A SECOND calib at the end
    plus 1-min load averages make contention visible inside the
    artifact itself: calib_sec_end diverging from calib_sec, or
    load averages far above the core count's idle baseline, mark
    the totals as ambient-noise-suspect (read with BASELINE.md's
    s-per-calib ledger; never compare absolute seconds across
    rounds). A per-query second pass within one session is
    deliberately NOT taken: the dedup/graph families memoize within
    a session, so warm reps measure cache hits, not plans — the
    drift retry in main() cycles the SparkSession instead, which
    evicts those per-session memos (graph_queries._EDGE_MEMO et al
    key on the session object)."""
    load_start = _loadavg_1m()
    # warmup: JVM/codegen/parquet footer caches
    materialize(plan_fn(names[0])(spark, sf_dir))
    calib = calibrate(spark)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        materialize(plan_fn(name)(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    calib_end = calibrate(spark)
    load_end = _loadavg_1m()

    # SPARK_GRAFT_CPUS is the sweep's own parallelism; absent that,
    # the PHYSICAL core count is the contention baseline — a
    # hardcoded 32 would classify a fully-contended 8-core host as
    # clean (code-review r10)
    cores = int(
        os.environ.get("SPARK_GRAFT_CPUS", 0) or os.cpu_count() or 32
    )
    noise = host_noise_verdict(calib, calib_end, load_start, load_end, cores)
    total = round(sum(timings.values()), 3)
    subset = round(sum(timings[n] for n in R1_SUBSET if n in timings), 3)
    # the cross-round comparable: r1-subset seconds normalized by the
    # MEAN of the two calibrations (BASELINE.md s-per-calib ledger,
    # r10 VERDICT item 6 — computed in the artifact itself so ledger
    # entries are read, not derived by hand)
    per_calib = (
        round(subset / ((calib + calib_end) / 2), 1)
        if calib and calib_end
        else None
    )
    return {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "r1_subset_wall": subset,
        "r1_subset_per_calib": per_calib,
        "calib_sec": calib,
        "calib_sec_end": calib_end,
        "loadavg_1m_start": load_start,
        "loadavg_1m_end": load_end,
        "host_noise": noise,
    }


def _drift_badness(detail: dict) -> float:
    """|log(end/start calib)| — 0 for a perfectly stable pair."""
    import math

    c0, c1 = detail.get("calib_sec"), detail.get("calib_sec_end")
    if not c0 or not c1:
        return float("inf")
    return abs(math.log(c1 / c0))


def _run_badness(detail: dict) -> tuple:
    """Run-selection key: a clean run ALWAYS beats a WARN'd one (the
    r14 artifact parsed a WARN'd run while a clean rerun existed —
    r14 VERDICT item "What's wrong 1"); ties break on calib drift."""
    return (
        0 if detail.get("host_noise") == "clean" else 1,
        _drift_badness(detail),
    )


def select_run(runs: list) -> dict:
    """Pick the run the compact line reports (r18, VERDICT r17 item 9).

    Base rule (r14): a clean run beats a WARN'd one, ties break on
    calib drift. That rule has an asymmetry: a run whose host SPED UP
    mid-run is WARN'd and loses to a stable-but-slow run even though
    its total is the better (upper-bound) estimate — the r17
    end-of-round artifact archived 153.1 s while discarding a 103.3 s
    run WARN'd only because calib improved 0.51x. New override: when
    the two runs AGREE per-query — each run's total is within 10% of
    the elementwise-min composite, i.e. neither run is systematically
    distorted relative to the other — prefer the lower total. When
    they disagree, the noise verdicts still decide (clean beats WARN).
    """
    if len(runs) < 2:
        return runs[0]
    per_q = [r.get("queries", {}) for r in runs]
    common = set(per_q[0]) & set(per_q[1])
    if common:
        min_total = sum(min(q[n] for q in per_q) for n in common)
        if min_total > 0 and all(
            sum(q[n] for n in common) <= 1.10 * min_total for q in per_q
        ):
            # lower total wins; exact ties fall back to cleanliness
            return min(runs, key=lambda r: (r["value"], _run_badness(r)))
    return min(runs, key=_run_badness)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    quiet_wait = _wait_for_quiet_host()
    spark = get_spark(app_name="pdip-spark-bench")

    names = [
        n for n in HEADLINE if n in REGISTRY or n in RETIRED_BENCH_PLANS
    ]

    def plan_fn(name):
        spec = REGISTRY.get(name)
        return spec.fn if spec is not None else RETIRED_BENCH_PLANS[name]

    runs = [run_sweep(spark, sf_dir, names, plan_fn, sf)]
    if runs[0].get("host_noise") != "clean":
        # One-shot retry on ANY noise verdict — ambient load as well
        # as calib drift (r14 VERDICT item 5: the drift-only trigger
        # let an ambient-load WARN become the parsed number). Fresh
        # session (evicts per-session memos so the rerun measures
        # plans, not cache hits), preceded by another bounded quiet
        # wait since the ambient load may still be draining. Both
        # runs ride the artifact; the cleaner/stabler one is parsed.
        spark.stop()
        quiet_wait += _wait_for_quiet_host()
        spark = get_spark(app_name="pdip-spark-bench-retry")
        runs.append(run_sweep(spark, sf_dir, names, plan_fn, sf))
    detail = select_run(runs)
    detail["quiet_wait_sec"] = quiet_wait
    if len(runs) > 1:
        discarded = runs[0] if detail is runs[1] else runs[1]
        detail["bench_runs"] = 2
        detail["discarded_run"] = discarded
    # Full per-query detail: one JSON line (for humans/judge reading
    # the stream) plus a committed-path file, since the driver keeps
    # only the last 2000 chars of output.
    print(json.dumps(detail))
    try:
        with open(DETAIL_PATH, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    # FINAL line = compact summary. The driver parses the tail of
    # stdout; with 88 queries the detailed line above is ~2.8 KB and
    # its head (including "value") falls outside the tail buffer —
    # BENCH_r05.json recorded parsed:null exactly because of that
    # (VERDICT r5 item 1). This line must stay well under 2000 chars
    # and must be printed LAST. r18 (VERDICT r17 item 2): per-query
    # walls now ride this line too, as the compact "q" array —
    # 2-decimal floats in benched-HEADLINE order (the insertion order
    # of the detailed line's "queries" dict), ~600 chars for 91
    # queries — so PERF can compute round-over-round per-query deltas
    # (r17 had n_common: 0, i.e. no per-query comparison at all).
    compact = {
        "metric": "headline_queries_total_wall",
        "value": detail["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(detail["queries"]),
        "r1_subset_wall": detail["r1_subset_wall"],
        "r1_subset_per_calib": detail["r1_subset_per_calib"],
        "calib_sec": detail["calib_sec"],
        "calib_sec_end": detail["calib_sec_end"],
        "loadavg_1m_start": detail["loadavg_1m_start"],
        "loadavg_1m_end": detail["loadavg_1m_end"],
        "host_noise": detail["host_noise"],
        "q": [round(v, 2) for v in detail["queries"].values()],
    }
    if quiet_wait:
        compact["quiet_wait_sec"] = quiet_wait
    if len(runs) > 1:
        compact["bench_runs"] = 2
        # truncated here to protect the tail-buffer bound; the full
        # string rides the discarded run in the detail artifact
        compact["discarded_host_noise"] = (
            detail["discarded_run"]["host_noise"][:60]
        )
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
