"""Runtime Bloom-filter join pruning — the 100 TB activation proof.

BASELINE.md records that `spark.sql.optimizer.runtime.bloomFilter.*`
is ON in the tuned session but dormant at bench SF (every creation
side is under the 10 MB creation threshold and every application-side
scan is under the 10 GB application threshold). Dormant-at-test-scale
is exactly the situation a plan regression can hide in: if a query
shape becomes ineligible (keys wrapped in expressions, join rewritten
to a non-equi form), nothing at sf0.1 fails, but at cluster scale the
fact scan loses its row-group pruning filter.

These tests force the thresholds down so the InjectRuntimeFilter rule
fires at sf0.001, then assert the bloom filter actually lands on the
big-side scan for the registry's canonical selective-dim⋈fact shape.
Thresholds are restored in a finally block — the shared session must
leave with its tuned defaults.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

_CONFS = {
    # make the sf0.001 scans eligible as application sides
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # keep the (tiny) filtered creation side eligible
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    # disable auto-broadcast so the join is a shuffle join — the shape
    # a 100 TB fact⋈fact join takes (broadcast hints still honored)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _with_forced_thresholds(spark, build):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        df = build()
        return df._jdf.queryExecution().optimizedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_selective_quarter_join_injects_bloom_on_lineitem(spark):
    """Q4/Q10's core shape: a date-filtered orders slice joined to the
    lineitem fact on orderkey. At cluster scale the quarter filter
    keeps ~2% of orders; the injected bloom filter prunes ~98% of
    lineitem rows at the scan, before the shuffle."""

    def build():
        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem")
        quarter = orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        return (
            quarter.join(
                lineitem, quarter["o_orderkey"] == lineitem["l_orderkey"]
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    plan = _with_forced_thresholds(spark, build)
    assert "bloom_filter_agg" in plan or "BloomFilter" in plan, (
        "InjectRuntimeFilter did not fire on the quarter⋈lineitem shape:\n"
        + plan[:2000]
    )
    assert "might_contain" in plan, (
        "no might_contain probe on the application side:\n" + plan[:2000]
    )


def test_bloom_filter_lands_on_fact_side_not_dim_side(spark):
    """The probe must sit on the FACT (lineitem) subtree — a bloom
    filter probing the already-filtered orders slice would be pure
    overhead. The optimized plan nests might_contain inside a Filter
    directly over the lineitem relation."""

    def build():
        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem")
        quarter = orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        return quarter.join(
            lineitem, quarter["o_orderkey"] == lineitem["l_orderkey"]
        ).select("l_extendedprice")

    plan = _with_forced_thresholds(spark, build)
    if "might_contain" not in plan:
        import pytest

        pytest.skip("rule did not fire for bare join (version-dependent)")
    probe = plan[plan.index("might_contain") :]
    assert "l_orderkey" in probe.split("\n")[0], (
        "bloom probe is not keyed on the fact-side join key"
    )


def test_tuned_session_leaves_runtime_filter_enabled(spark):
    """The activation tests above force thresholds temporarily; the
    tuned session itself must keep the feature ON with stock
    thresholds so it self-activates at real fact sizes (BASELINE.md
    'dormant at test scale' note)."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling — the runtime complement to the manual
    salting operator (operators/skew.py): one hot key owning ~all of
    the big side must be SPLIT by OptimizeSkewedJoin (the sort-merge
    join node reports skew=true) once a partition exceeds the skew
    thresholds. Dormant at test data sizes for the same reason the
    Bloom rule is — so, as there, thresholds are forced down to prove
    the registry's join shapes remain ELIGIBLE, and restored after."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        # keep AQE from first coalescing the skew away
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 200k rows, 95% on key 0; modest right side, same key space
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("dim").alias("attr")
        )
        joined = big.join(small, "k")
        # collect() (not count()) so THIS DataFrame's QueryExecution
        # runs and AQE finalizes it — count() wraps the plan in its
        # own QE and leaves this one unexecuted (isFinalPlan=false)
        assert len(joined.collect()) == 200_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, (
            "OptimizeSkewedJoin did not split the hot partition:\n"
            + final[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_session_keeps_skew_join_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def _walk_executed(node):
    yield node
    nm = node.nodeName()
    if nm == "AdaptiveSparkPlan":
        yield from _walk_executed(node.executedPlan())
        return
    if "QueryStage" in nm:
        yield from _walk_executed(node.plan())
        return
    for i in range(node.children().length()):
        yield from _walk_executed(node.children().apply(i))


def test_dynamic_partition_pruning_skips_fact_partitions(spark, tmp_path):
    """Dynamic partition pruning — the other runtime filter, and the
    single biggest scan saver on a date-partitioned 100 TB lake: a
    selective dim filter must reach the partitioned fact scan as a
    dynamicpruning PartitionFilter, so unselected partitions are never
    LISTED, let alone read. Static proof (the pruning expression in
    the plan) plus executed proof (scan metrics: 1 of ~80 partition
    files actually read)."""
    orders = load_table(spark, SF_DIR, "orders")
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    fact = orders.withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
    fact.write.mode("overwrite").partitionBy("o_month").parquet(fact_path)
    (
        fact.select("o_month")
        .distinct()
        .withColumn(
            "flag",
            F.when(F.col("o_month") == "1996-03", "pick").otherwise("skip"),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )

    f = spark.read.parquet(fact_path)
    d = spark.read.parquet(dim_path).filter(F.col("flag") == "pick")
    j = f.join(d, "o_month").agg(F.count(F.lit(1)).alias("n"))

    plan = j._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "dynamicpruningexpression" in plan, (
        "DPP did not inject a partition filter:\n" + plan[:2000]
    )

    assert j.collect()[0]["n"] > 0
    # executed proof: the fact scan must have read exactly the picked
    # partition — numFiles far below the static file count
    scans = []
    for n in _walk_executed(j._jdf.queryExecution().executedPlan()):
        if "Scan parquet" in n.nodeName():  # note: trailing space in node name
            it = n.metrics().iterator()
            mets = {}
            while it.hasNext():
                kv = it.next()
                mets[kv._1()] = kv._2().value()
            if "staticFilesNum" in mets:
                scans.append(mets)
    assert scans, "no partitioned fact scan found in executed plan"
    m = scans[0]
    assert m["numPartitions"] == 1, m
    assert m["numFiles"] < m["staticFilesNum"] / 10, (
        f"DPP read {m['numFiles']} of {m['staticFilesNum']} files"
    )
