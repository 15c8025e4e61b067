"""Bucketed co-located join: the write-time pre-shuffle must elide
run-time exchanges on the bucketed key — the physical-layout half of
the 100 TB join story (SURVEY.md §4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.storage import bucketed_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_fact_fact_join_has_no_exchange(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(li, "li_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bkt",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
    )
    joined = bucketed_join(spark, "li_bkt", "ord_bkt", ["l_orderkey"]).filter(
        F.col("o_totalprice") > 0
    )
    # force a sort-merge join so broadcast doesn't mask the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
    # correctness: same result as the plain join
    plain = li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    ).count()
    assert joined.count() == li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    ).filter(F.col("o_totalprice") > 0).count()
    assert plain >= joined.count()


def test_bucketed_groupby_has_no_exchange(spark):
    # aggregation on the bucket key also rides the layout
    agg = (
        spark.table("li_bkt")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange hashpartitioning" not in _plan(agg)


def test_bucketed_signature_store_probe_shuffles_batch_only(spark):
    """The dedup_ingest store claim made physical: corpus signatures
    persisted bucketed BY (band, band_hash) are probed by a new batch
    with NO exchange on the store side — only the (small) batch side
    shuffles, so per-batch dedup cost is independent of corpus layout
    work at 100 TB."""
    from pythondataingestionprocess_spark.operators import dedup as dd
    from pythondataingestionprocess_spark.storage import write_bucketed

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 3)
    batch = docs.filter(F.col("doc_id") % 7 == 3)
    kw = dict(shingle_n=3, num_hashes=64, bands=16, seed=42)
    write_bucketed(
        dd._signatures_banded(corpus, "doc_id", "text", **kw)
        .withColumnRenamed("doc_id", "corpus_id"),
        "sig_store_bkt",
        ["band", "band_hash"],
        8,
    )
    probe = (
        dd._signatures_banded(batch, "doc_id", "text", **kw)
        .withColumnRenamed("doc_id", "new_id")
        .join(spark.table("sig_store_bkt"), ["band", "band_hash"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(probe)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    # exactly one exchange feeds the join keys: the batch side. The
    # store side reads pre-bucketed. (The distinct() afterwards adds
    # its own exchange on (new_id, corpus_id) — not on the join keys.)
    join_key_exchanges = plan.count("Exchange hashpartitioning(band")
    assert join_key_exchanges == 1, plan


def test_compaction_bins_small_files_and_preserves_rows(spark, tmp_path):
    """Ten tiny part-files compact into fewer bins sized by the byte
    budget; every row survives, no row duplicates."""
    from pythondataingestionprocess_spark.storage import (
        compact_dir,
        plan_compaction,
    )

    src = str(tmp_path / "small")
    out = str(tmp_path / "compacted")
    df = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    df.repartition(10).write.mode("overwrite").parquet(src)

    sizes = [
        f.getLen()
        for f in spark._jvm.org.apache.hadoop.fs.Path(src)
        .getFileSystem(spark._jsc.hadoopConfiguration())
        .listStatus(spark._jvm.org.apache.hadoop.fs.Path(src))
        if f.getPath().getName().endswith(".parquet")
    ]
    assert len(sizes) == 10
    target = sum(sizes) // 3  # force ~4 bins
    groups = plan_compaction(spark, src, target)
    assert 1 < len(groups) < 10
    assert sorted(p for g in groups for p in g) == sorted(
        p for g in plan_compaction(spark, src, target) for p in g
    )  # deterministic

    n_bins = compact_dir(spark, src, out, target)
    assert n_bins == len(groups)
    before = df.orderBy("o_orderkey").collect()
    after = spark.read.parquet(out + "/bin_*").orderBy("o_orderkey").collect()
    assert before == after


def test_dynamic_partition_overwrite_replaces_only_loaded_days(spark, tmp_path):
    """write_partitioned is the idempotent daily-reload primitive:
    re-loading day 2 must replace ONLY day 2's directory — days 1 and
    3 keep their original rows (static overwrite mode would truncate
    the whole table). Reading back with a day filter must prune to the
    one partition directory (PartitionFilters in the scan)."""
    from pythondataingestionprocess_spark.storage import write_partitioned

    path = str(tmp_path / "facts")
    initial = spark.createDataFrame(
        [(d, i, float(10 * d + i)) for d in (1, 2, 3) for i in range(4)],
        "day int, rec_id int, amount double",
    )
    write_partitioned(initial, path, ["day"])
    assert spark.read.parquet(path).count() == 12

    # day-2 correction: fewer rows, new values
    reload_day2 = spark.createDataFrame(
        [(2, 99, 999.0)], "day int, rec_id int, amount double"
    )
    write_partitioned(reload_day2, path, ["day"])

    got = spark.read.parquet(path)
    per_day = {r["day"]: r["n"] for r in
               got.groupBy("day").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_day == {1: 4, 2: 1, 3: 4}, "other days must survive the reload"
    assert got.filter(F.col("day") == 2).first()["amount"] == 999.0

    # partition pruning: the day filter must land in PartitionFilters,
    # not a post-scan Filter over all directories
    pruned = got.filter(F.col("day") == 3).select("rec_id")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:80]


def test_static_overwrite_truncates_whole_table(spark, tmp_path):
    """The dynamic=False face: a one-partition write under static
    overwrite mode drops every other partition — pinned so the
    difference stays visible (this is the foot-gun write_partitioned
    defaults away from)."""
    from pythondataingestionprocess_spark.storage import write_partitioned

    path = str(tmp_path / "facts")
    initial = spark.createDataFrame(
        [(d, d) for d in (1, 2, 3)], "day int, rec_id int"
    )
    write_partitioned(initial, path, ["day"])
    write_partitioned(
        spark.createDataFrame([(2, 99)], "day int, rec_id int"),
        path,
        ["day"],
        dynamic=False,
    )
    assert [r["day"] for r in spark.read.parquet(path).collect()] == [2]


def test_partitioned_table_schema_evolution_mergeschema(spark, tmp_path):
    """Schema widening across daily reloads: day 2 arrives with a new
    column the day-1 files lack. Dynamic overwrite keeps day 1 as-is;
    a mergeSchema read unions the schemas, NULL-filling the old
    partition — the evolution story for the partitioned layout (the
    default read would serve whichever schema the footer sample
    picked, silently dropping the new column for some file orders)."""
    from pythondataingestionprocess_spark.storage import write_partitioned

    path = str(tmp_path / "facts")
    write_partitioned(
        spark.createDataFrame([(1, 10)], "day int, amount int"), path, ["day"]
    )
    write_partitioned(
        spark.createDataFrame(
            [(2, 20, "eur")], "day int, amount int, currency string"
        ),
        path,
        ["day"],
    )
    got = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(got.columns) == {"day", "amount", "currency"}
    rows = {r["day"]: (r["amount"], r["currency"]) for r in got.collect()}
    assert rows == {1: (10, None), 2: (20, "eur")}


def test_file_stats_zorder_skips_more_files(spark, tmp_path):
    """The data-skipping payoff of the Morton layout, measured on real
    files: write orders into 8 range-partitioned files either by
    Morton(price, date) or by o_orderkey (uncorrelated with both
    dims), build the per-file min/max stats table, and count files a
    2-D box predicate can skip. Key-ordered files span the full range
    of both dimensions (skip ≈ 0); Morton-ordered files keep BOTH
    envelopes tight, so several files miss the box entirely."""
    import datetime as dt

    from pythondataingestionprocess_spark.functions.layout import morton16
    from pythondataingestionprocess_spark.storage import (
        file_skipping_stats,
        prunable_files,
    )

    orders = load_table(spark, SF_DIR, "orders")
    b = orders.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.least(F.floor(F.col("o_totalprice") / 2000).cast("long"), F.lit(255)).alias("px"),
        F.least(
            (F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long") / 10)
            .cast("long"),
            F.lit(255),
        ).alias("py"),
    ).withColumn("morton", morton16("px", "py"))

    zpath = str(tmp_path / "zorder")
    kpath = str(tmp_path / "keyorder")
    b.repartitionByRange(8, "morton").write.parquet(zpath)
    b.repartitionByRange(8, "o_orderkey").write.parquet(kpath)

    def skippable(path: str) -> int:
        stats = file_skipping_stats(spark, path, ["o_totalprice", "o_orderdate"])
        n_files = stats.count()
        assert n_files == 8
        miss_price = prunable_files(stats, "o_totalprice", 100_000.0, 150_000.0)
        miss_date = prunable_files(
            stats, "o_orderdate", dt.datetime(1997, 1, 1), dt.datetime(1998, 1, 1)
        )
        return miss_price.select("file").union(miss_date.select("file")).distinct().count()

    z_skip = skippable(zpath)
    k_skip = skippable(kpath)
    assert z_skip > k_skip, (z_skip, k_skip)
    assert z_skip >= 3, z_skip


def test_optimize_zorder_tightens_file_stats(spark, tmp_path):
    """The OPTIMIZE ZORDER job end-to-end: a key-ordered table whose
    per-file envelopes span the full price and date ranges is
    rewritten Morton-clustered; afterwards the per-file envelopes
    cover a fraction of each dimension, and a 2-D box predicate can
    skip files it previously had to read."""
    import datetime as dt

    from pythondataingestionprocess_spark.storage import (
        file_skipping_stats,
        optimize_zorder,
        prunable_files,
    )

    orders = load_table(spark, SF_DIR, "orders")
    before = str(tmp_path / "keyordered")
    after = str(tmp_path / "zordered")
    orders.repartitionByRange(8, "o_orderkey").write.parquet(before)

    optimize_zorder(
        spark,
        before,
        after,
        "least(CAST(floor(o_totalprice / 2000) AS BIGINT), 255)",
        "least(CAST(CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT) / 10 AS BIGINT), 255)",
        n_files=8,
    )
    # same rows survive the rewrite
    assert spark.read.parquet(after).count() == orders.count()

    def skips(path: str) -> int:
        stats = file_skipping_stats(spark, path, ["o_totalprice", "o_orderdate"])
        a = prunable_files(stats, "o_totalprice", 100_000.0, 150_000.0)
        b = prunable_files(
            stats, "o_orderdate", dt.datetime(1997, 1, 1), dt.datetime(1998, 1, 1)
        )
        return a.select("file").union(b.select("file")).distinct().count()

    assert skips(before) == 0  # uncorrelated key order: every file spans everything
    assert skips(after) >= 3
