"""Physical-layout utilities: bucketed tables for co-located joins.

At 100 TB the biggest join cost is shuffling two fact tables on the
join key. Bucketing pre-shuffles AT WRITE TIME: both tables hashed
into the same number of buckets on the key mean the join (and any
groupBy on that key) runs with NO exchange — each task reads matching
bucket files from both sides. The win repeats on every downstream
query, amortizing the one-time write shuffle.

Local tests register bucketed tables in the in-memory catalog
(spark-warehouse dir); on a cluster this is the same API against a
metastore, or Delta/Iceberg's clustered-write equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.
    Sorting within buckets additionally enables exchange-AND-sort-free
    sort-merge joins."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an orphaned managed-table dir (warehouse outliving the catalog,
    # e.g. across local test sessions) blocks re-creation — clear it
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner
    elides both shuffles (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)
