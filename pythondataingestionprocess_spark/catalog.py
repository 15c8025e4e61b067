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


# Session-keyed LAZY reader memo — the engine's catalog. One
# ``spark.read.parquet`` costs ~150 ms of driver-side work (file
# listing, footer read, schema resolution) and the query surface
# re-loads the same ten immutable tables hundreds of times per session
# (~27 s of a 91-query bench sweep, r17 measurement). A real engine
# resolves a table through its metastore once; this memo is that, and
# nothing more: the cached object is an UNMATERIALIZED DataFrame —
# no rows are computed or pinned, every query still executes from the
# parquet inputs. Keyed on session IDENTITY (the bench's drift retry
# cycles the SparkSession precisely to evict per-session memos) and
# bounded FIFO so long-lived multi-corpus processes can't accrete
# entries. Safe because the sf corpora are immutable once generated
# (generation happens in a subprocess before any load; the committed
# testdata is read-only).
_READER_MEMO: list[tuple[SparkSession, str, dict[str, DataFrame]]] = []
_READER_MEMO_MAX = 8


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    for sess, cached_dir, tables in _READER_MEMO:
        if sess is spark and cached_dir == sf_dir:
            df = tables.get(name)
            if df is None:
                df = _read_table(spark, sf_dir, name)
                tables[name] = df
            return df
    df = _read_table(spark, sf_dir, name)
    _READER_MEMO.append((spark, sf_dir, {name: df}))
    if len(_READER_MEMO) > _READER_MEMO_MAX:
        del _READER_MEMO[0]
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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
