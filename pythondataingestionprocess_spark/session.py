"""SparkSession factory with scale-oriented defaults.

Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]`` (single JVM),
but every config here is chosen to also make sense on a multi-executor
cluster at ~100 TB:

- AQE on (runtime coalesce, skew-join splitting, dynamic join strategy)
- shuffle partitions sized to core count locally; on a real cluster the
  AQE coalesce makes the initial number far less sensitive
- Arrow enabled for the (rare) Pandas-UDF paths
- UTC session timezone so timestamp semantics are stable across
  environments (and match the DuckDB oracle)

Streaming state store: local runs keep the default HDFS-backed
provider (in-heap, fastest at test-sized state). At cluster scale set
``spark.sql.streaming.stateStore.providerClass`` to the bundled
``RocksDBStateStoreProvider`` — keyed state then lives on executor
local disk (block-cache reads) instead of heap, so dedup/session/
funnel state scales with SSD, not memory. Engine compatibility is
proven by tests/test_streaming.py::test_streaming_agg_on_rocksdb_state_store.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(
    app_name: str = "pythondataingestionprocess-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count — at real
    cluster scale you would size this to ~2-3x total executor cores
    and let AQE coalesce small post-shuffle partitions.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # spill-awareness: 128 MiB scan splits keep a task's working set
        # well under executor memory even after decode amplification
        # (parquet → row ~2-4×); at the 100 TB target this is the knob
        # that bounds per-task memory together with AQE's
        # advisoryPartitionSizeInBytes for post-shuffle partitions
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(64 * 1024 * 1024))
        # driver testdata stores events.ts as parquet TIMESTAMP(NANOS),
        # which vanilla Spark rejects; read as long and convert in the
        # catalog loader (see catalog.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # A handful of day-rollup windows use a constant partition key
        # to declare a tiny single-partition window INTENTIONAL (one
        # row per day) instead of tripping WindowExec's
        # no-partition-defined warning on every bench run. This rule
        # would fold the constant away and resurrect the warning; its
        # only effect is removing foldable window partitions, so
        # excluding it costs nothing (VERDICT r2 item 7).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
