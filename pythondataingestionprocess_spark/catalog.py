"""Testdata catalog: loaders for the driver-generated parquet corpus.

Tables (TPC-H-ish star schema + events stream + documents/embeddings):
``region nation customer supplier part orders lineitem events
documents embeddings`` — one parquet file per table under an
``sf{N}`` directory (see TESTDATA.md).

At 100 TB these would be partitioned/bucketed Delta or parquet tables
registered in a metastore; the loader keeps that shape in mind — all
reads are plain ``spark.read.parquet`` so Catalyst gets predicate
pushdown / column pruning for free, and ``register_views`` exposes the
same names SQL-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tiny dimensions worth broadcast-hinting when joined against facts.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # ensure the nanos-timestamp workaround is active even under a
        # driver-owned session that didn't use our factory
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is parquet TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as epoch-nanos.
        # Truncate to micros (integer div — double math would lose
        # precision at 1e18) to match DuckDB's microsecond TIMESTAMP.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL-facing queries)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
