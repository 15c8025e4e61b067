"""Live JDBC sink tests (VERDICT r1 item 8): the S9 path exercised for
real against embedded Derby (ships with Spark), proving the MERGE-shaped
semantics survive the swap from the parquet stand-in to df.write.jdbc.

Skipped automatically if the Derby driver is absent from the classpath.
"""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.pipeline.jdbc_store import (
    JdbcTableStore,
    derby_url,
)
from pythondataingestionprocess_spark.pipeline.store import apply_price_scd

D = date(2024, 6, 1)


@pytest.fixture
def jdbc_store(spark, tmp_path):
    url = derby_url(str(tmp_path / "derbydb"))
    store = JdbcTableStore(spark, url)
    try:
        probe = spark.createDataFrame([(1,)], "x long")
        probe.write.jdbc(url, "probe_tbl", mode="overwrite", properties=store.properties)
    except Exception as e:  # pragma: no cover - driver missing in some envs
        pytest.skip(f"Derby JDBC driver unavailable: {e}")
    return store


def test_jdbc_roundtrip_types(spark, jdbc_store):
    df = spark.createDataFrame(
        [(1, "Store A", "amazon.com.mx", True)],
        schema="id_store long, store_name string, store_url string, status boolean",
    )
    jdbc_store.overwrite("store", df)
    back = jdbc_store.read("store")
    assert [tuple(r) for r in back.collect()] == [(1, "Store A", "amazon.com.mx", True)]


def test_jdbc_insert_if_absent_catalog_cache(spark, jdbc_store):
    first = spark.createDataFrame(
        [(1, "Store A", "amazon.com.mx", True)],
        schema="id_store long, store_name string, store_url string, status boolean",
    )
    jdbc_store.insert_if_absent("store", first, ["store_name"])
    # second batch: same key with different attrs (must NOT update) + a new key
    second = spark.createDataFrame(
        [
            (9, "Store A", "CHANGED.example", False),
            (2, "Store B", "mercadolibre.com.mx", True),
        ],
        schema="id_store long, store_name string, store_url string, status boolean",
    )
    jdbc_store.insert_if_absent("store", second, ["store_name"])
    rows = {r.store_name: r for r in jdbc_store.read("store").collect()}
    assert rows["Store A"].id_store == 1  # cached row untouched
    assert rows["Store A"].store_url == "amazon.com.mx"
    assert rows["Store B"].id_store == 2


def test_jdbc_upsert_incoming_wins(spark, jdbc_store):
    jdbc_store.overwrite(
        "payment_type",
        spark.createDataFrame([(1, "card")], "id_payment_type long, payment_type string"),
    )
    jdbc_store.upsert(
        "payment_type",
        spark.createDataFrame(
            [(1, "credit card"), (2, "cash")],
            "id_payment_type long, payment_type string",
        ),
        ["id_payment_type"],
    )
    rows = {r.id_payment_type: r.payment_type for r in jdbc_store.read("payment_type").collect()}
    assert rows == {1: "credit card", 2: "cash"}


def test_jdbc_price_scd_matches_parquet_semantics(spark, jdbc_store):
    """The SCD stamping (database_utils.py:260-280 semantics) must be
    IO-layer-independent: run it through the JDBC store and check the
    restamp-only-on-change rule."""
    initial = spark.createDataFrame(
        [(10, 100.0, 90.0, date(2024, 1, 1), None)],
        "id_product long, price double, offer_price double, start_date date, end_date date",
    )
    jdbc_store.overwrite("price", initial)
    incoming = spark.createDataFrame(
        [(10, 120.0, 90.0), (11, 50.0, None)],
        "id_product long, price double, offer_price double",
    )
    merged = apply_price_scd(jdbc_store.read("price"), incoming, D)
    jdbc_store.overwrite("price", merged)
    rows = {r.id_product: r for r in jdbc_store.read("price").collect()}
    assert rows[10].price == 120.0 and rows[10].start_date == D  # changed → restamped
    assert rows[11].price == 50.0 and rows[11].end_date is None  # fresh insert
    # idempotent re-apply: same price → no restamp
    merged2 = apply_price_scd(
        jdbc_store.read("price"),
        spark.createDataFrame([(10, 120.0, 90.0)], "id_product long, price double, offer_price double"),
        date(2024, 7, 1),
    )
    jdbc_store.overwrite("price", merged2)
    assert {r.id_product: r.start_date for r in jdbc_store.read("price").collect()}[10] == D


def test_streaming_foreachbatch_upserts_into_jdbc(spark, jdbc_store, tmp_path):
    """End-to-end: checkpointed file stream → foreachBatch →
    JdbcTableStore.insert_if_absent against live Derby — the streaming
    face of the reference's per-file transaction loop, with the real
    DB sink instead of the parquet stand-in. Two micro-batches; the
    second re-sends a key that must NOT be updated (catalog-cache
    semantics) plus a fresh one."""
    import json
    import os

    from pythondataingestionprocess_spark.streaming import file_ingest

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox, exist_ok=True)
    rows1 = [{"id_store": 1, "store_name": "Store A", "store_url": "a.example", "status": True}]
    rows2 = [
        {"id_store": 9, "store_name": "Store A", "store_url": "CHANGED", "status": False},
        {"id_store": 2, "store_name": "Store B", "store_url": "b.example", "status": True},
    ]
    with open(os.path.join(inbox, "b1.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows1))
    with open(os.path.join(inbox, "b2.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows2))

    schema = "id_store long, store_name string, store_url string, status boolean"
    stream = file_ingest.file_stream(spark, inbox, schema, fmt="json", max_files_per_trigger=1)

    def process(batch_df, batch_id):
        jdbc_store.insert_if_absent("store", batch_df, ["store_name"])

    q = file_ingest.run_ingestion(
        stream, process, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    rows = {r.store_name: r for r in jdbc_store.read("store").collect()}
    assert rows["Store A"].id_store == 1 and rows["Store A"].store_url == "a.example"
    assert rows["Store B"].id_store == 2


def test_delete_keys_erasure_roundtrip(spark, tmp_path):
    """Right-to-erasure sweep on the parquet store: deleting a key
    frame removes exactly those rows (count returned), leaves everyone
    else untouched, and is idempotent — a second sweep deletes 0."""
    from pythondataingestionprocess_spark.pipeline.store import ParquetTableStore

    store = ParquetTableStore(spark, str(tmp_path / "s"))
    rows = [(i, f"u{i}", float(i)) for i in range(20)]
    store.overwrite(
        "purchase_like",
        spark.createDataFrame(rows, "user_id long, name string, total double"),
    )
    victims = spark.createDataFrame([(3,), (7,), (99,)], "user_id long")

    n = store.delete_keys("purchase_like", victims, ["user_id"])
    assert n == 2  # id 99 never existed
    left = store.read("purchase_like")
    assert left.count() == 18
    assert left.filter(F.col("user_id").isin(3, 7)).count() == 0
    assert store.delete_keys("purchase_like", victims, ["user_id"]) == 0


def test_dialect_descriptors_urls_and_drivers(spark):
    """S9 cluster face (VERDICT r6 item 4): the reference's RDS
    targets — SQL Server (import_files_to_rds.py per README.md:77-79)
    and Postgres (import_files_to_postgre.py) — resolve to the right
    JDBC URL grammar and driver class through one dialect-
    parameterized store constructor; Derby is the live-tested one."""
    from pythondataingestionprocess_spark.pipeline import rds_import

    ss = rds_import.store_for_dialect(
        spark, "sqlserver", "rds.example.com", "meddb"
    )
    assert ss.url == (
        "jdbc:sqlserver://rds.example.com:1433;databaseName=meddb;encrypt=true"
    )
    assert ss.properties["driver"] == (
        "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    )

    pg = rds_import.store_for_dialect(
        spark, "postgresql", "pg.example.com", "meddb", port=5433
    )
    assert pg.url == "jdbc:postgresql://pg.example.com:5433/meddb"
    assert pg.properties["driver"] == "org.postgresql.Driver"

    db = rds_import.store_for_dialect(spark, "derby", "/tmp/somedb")
    assert db.url == "jdbc:derby:/tmp/somedb;create=true"
    assert db.properties["driver"] == "org.apache.derby.jdbc.EmbeddedDriver"


def test_s3_scheme_path_normalization():
    """The boto3/EMR ``s3://`` spelling maps to the Hadoop-connector
    ``s3a://`` scheme; every other scheme (and plain paths) passes
    through untouched."""
    from pythondataingestionprocess_spark.pipeline.rds_import import (
        normalize_object_path,
    )

    assert normalize_object_path("s3://bkt/prefix/a.csv") == (
        "s3a://bkt/prefix/a.csv"
    )
    assert normalize_object_path("s3a://bkt/a.csv") == "s3a://bkt/a.csv"
    assert normalize_object_path("file:///tmp/a.csv") == "file:///tmp/a.csv"
    assert normalize_object_path("/tmp/a.csv") == "/tmp/a.csv"
    assert normalize_object_path("hdfs://nn/a.csv") == "hdfs://nn/a.csv"


def test_import_files_to_rds_end_to_end(spark, jdbc_store, tmp_path):
    """The full import_files_to_rds shape against live Derby: a
    multi-file CSV drop read through a file:// glob (same Hadoop
    path machinery as s3a://) → one distributed read → keyed MERGE.
    Re-running the same prefix is idempotent; a corrected file
    upserts in place — the reference's per-row ON CONFLICT loop as
    two set operations."""
    from pythondataingestionprocess_spark.pipeline import rds_import

    src = tmp_path / "drop"
    src.mkdir()
    (src / "part1.csv").write_text("id_store,store_name\n1,Store A\n2,Store B\n")
    (src / "part2.csv").write_text("id_store,store_name\n3,Store C\n")
    glob = "file://" + str(src / "*.csv")
    schema = "id_store long, store_name string"

    n = rds_import.import_files_to_rds(
        spark, glob, jdbc_store, "rds_stores", keys=["id_store"],
        fmt="csv", schema=schema, options={"header": "true"},
    )
    assert n == 3
    rows = {r.id_store: r.store_name for r in jdbc_store.read("rds_stores").collect()}
    assert rows == {1: "Store A", 2: "Store B", 3: "Store C"}

    # idempotent re-run of the same prefix
    rds_import.import_files_to_rds(
        spark, glob, jdbc_store, "rds_stores", keys=["id_store"],
        fmt="csv", schema=schema, options={"header": "true"},
    )
    assert jdbc_store.read("rds_stores").count() == 3

    # corrected file → upsert in place
    (src / "part2.csv").write_text("id_store,store_name\n3,Store C v2\n")
    rds_import.import_files_to_rds(
        spark, glob, jdbc_store, "rds_stores", keys=["id_store"],
        fmt="csv", schema=schema, options={"header": "true"},
    )
    rows = {r.id_store: r.store_name for r in jdbc_store.read("rds_stores").collect()}
    assert rows == {1: "Store A", 2: "Store B", 3: "Store C v2"}


def test_exists_reraises_non_missing_probe_failures(spark):
    """r7 code review: a probe failure that is NOT 'table missing'
    (wrong driver, network, auth) must raise — returning False routed
    existing tables into destructive first-load/overwrite paths."""
    from pythondataingestionprocess_spark.pipeline.jdbc_store import (
        JdbcTableStore,
    )

    bogus = JdbcTableStore(
        spark,
        "jdbc:nosuchscheme://db.example.com/x",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    with pytest.raises(Exception) as ei:
        bogus.exists("any_table")
    assert "does not exist" not in str(ei.value)


def test_exists_false_only_for_missing_table(spark, jdbc_store):
    assert jdbc_store.exists("never_written_table") is False
    df = spark.createDataFrame([(1,)], "x long")
    jdbc_store.overwrite("now_written", df)
    assert jdbc_store.exists("now_written") is True


def test_relation_missing_matches_sqlstate_not_message(spark):
    """r7 ADVICE: classification must come from the SQLException
    cause chain's SQLState / vendor code, never message text. A
    Derby 'connection does not exist' (08003) whose message contains
    the old substring must NOT classify as relation-missing; 42X05 /
    42P01 / S0002 / vendor 208 must — including when wrapped in a
    non-SQL exception."""
    from pythondataingestionprocess_spark.pipeline.jdbc_store import (
        JdbcTableStore,
    )

    jvm = spark._jvm

    class Captured(Exception):
        def __init__(self, jt):
            super().__init__("probe failed")
            self.java_exception = jt

    dead_conn = jvm.java.sql.SQLException("connection does not exist", "08003")
    assert not JdbcTableStore._is_relation_missing(Captured(dead_conn))

    assert JdbcTableStore._is_relation_missing(
        Captured(jvm.java.sql.SQLException("x", "42X05"))
    )
    wrapped = jvm.java.lang.RuntimeException(
        "wrap", jvm.java.sql.SQLException("relation missing", "42P01")
    )
    assert JdbcTableStore._is_relation_missing(Captured(wrapped))
    assert JdbcTableStore._is_relation_missing(
        Captured(jvm.java.sql.SQLException("Invalid object name", "S0002", 208))
    )
    # no java exception attached at all → not provably missing
    assert not JdbcTableStore._is_relation_missing(ValueError("boom"))


def test_jdbc_exists_on_table_created_elsewhere(spark, tmp_path):
    """r9 regression: exists() must return True for a table that
    exists but was created OUTSIDE this store instance (fresh process
    after a crash, a second consumer, raw-DDL tables). The unaliased
    probe `SELECT 1 FROM t` surfaced a column literally named "1" and
    the collect's SELECT "1" then made exists() RAISE on live Derby."""
    from pythondataingestionprocess_spark.pipeline.jdbc_store import (
        JdbcTableStore,
        derby_url,
    )

    url = derby_url(str(tmp_path / "derbydb_e"))
    writer = JdbcTableStore(spark, url)
    writer.append("made_elsewhere", spark.createDataFrame([(1,)], "id long"))
    fresh = JdbcTableStore(spark, url)  # empty _known cache
    assert fresh.exists("made_elsewhere") is True
    assert fresh.exists("never_made") is False
