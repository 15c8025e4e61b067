"""S3 → RDS batch import, Spark-first (the reference's documented
``import_files_to_rds.py`` proof-of-concept — README.md:77-79 — whose
source is absent from the snapshot: boto3 downloads S3 objects one by
one and pyodbc INSERTs rows into SQL Server one at a time).

The Spark shape replaces both loops with set operations:

- **object listing/download** → a distributed ``spark.read`` over the
  object-store path glob. Spark's Hadoop S3A connector streams objects
  straight into executors — no driver-side download, and a 100 TB
  prefix splits into ``spark.sql.files.maxPartitionBytes``-sized tasks
  across the cluster. ``normalize_object_path`` rewrites ``s3://`` to
  ``s3a://`` (the OSS-Spark scheme; EMR's EMRFS serves ``s3://``
  natively — both spellings land on the same objects).
- **per-row INSERT** → ``JdbcTableStore`` set-oriented MERGE: one
  ``df.write.jdbc`` per table per batch, dedup + anti-join semantics
  shared with the parquet store.

Dialects: the store itself is dialect-agnostic (Spark JDBC speaks to
anything with a driver jar); what differs per target is the URL
grammar and driver class, captured in ``DIALECTS``:

- ``sqlserver`` — the reference's RDS target (msodbcsql17 via pyodbc
  → here the ``mssql-jdbc`` driver). Writes at scale want
  ``batchsize`` (default 1000 rows/statement) and a staging table +
  server-side ``MERGE`` instead of Spark's DROP+CREATE overwrite.
- ``postgresql`` — the reference's other sink
  (import_files_to_postgre.py via psycopg2). Same notes;
  ``ON CONFLICT DO UPDATE`` is the server-side merge.
- ``derby`` — embedded, ships with Spark; the dialect the test suite
  drives LIVE end-to-end in this container.

Credentials: never in the URL. S3A reads AWS creds from the default
provider chain (env/instance profile — the ``aws configure`` step in
the reference README); JDBC passwords belong in ``properties`` from a
secrets manager.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from pythondataingestionprocess_spark.pipeline.jdbc_store import JdbcTableStore


@dataclass(frozen=True)
class Dialect:
    """JDBC dialect descriptor: driver class + URL grammar."""

    name: str
    driver: str
    default_port: int | None
    url_of: Callable[..., str]


DIALECTS: dict[str, Dialect] = {
    "sqlserver": Dialect(
        name="sqlserver",
        driver="com.microsoft.sqlserver.jdbc.SQLServerDriver",
        default_port=1433,
        # encrypt=true is the RDS default posture; trustServerCertificate
        # stays false — supply the RDS CA bundle to the JVM truststore.
        url_of=lambda host, database, port=1433: (
            f"jdbc:sqlserver://{host}:{port};databaseName={database};encrypt=true"
        ),
    ),
    "postgresql": Dialect(
        name="postgresql",
        driver="org.postgresql.Driver",
        default_port=5432,
        url_of=lambda host, database, port=5432: (
            f"jdbc:postgresql://{host}:{port}/{database}"
        ),
    ),
    "derby": Dialect(
        name="derby",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        default_port=None,
        # embedded: "host" is a filesystem path, no port
        url_of=lambda host, database=None, port=None: (
            f"jdbc:derby:{host};create=true"
        ),
    ),
}


def store_for_dialect(
    spark: SparkSession,
    dialect: str,
    host: str,
    database: str | None = None,
    port: int | None = None,
    properties: dict[str, str] | None = None,
) -> JdbcTableStore:
    """A ``JdbcTableStore`` wired for the named dialect — URL grammar
    and driver class resolved from ``DIALECTS``, everything else
    (MERGE semantics, read/overwrite discipline) shared."""
    d = DIALECTS[dialect]
    kwargs = {"host": host, "database": database}
    if port is not None:
        kwargs["port"] = port
    url = d.url_of(**{k: v for k, v in kwargs.items() if v is not None})
    return JdbcTableStore(spark, url, driver=d.driver, properties=properties)


def normalize_object_path(path: str) -> str:
    """Map an ``s3://bucket/key`` URI (the reference/boto3 spelling,
    and EMR's) to ``s3a://bucket/key`` — the Hadoop connector scheme
    OSS Spark reads natively. ``s3a://``, ``file://``, plain paths,
    and every other Hadoop scheme pass through untouched."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


def read_objects(
    spark: SparkSession,
    paths: str | list[str],
    fmt: str = "csv",
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Distributed read of the import file set (the boto3
    list+download loop, as one scan). Always pass ``schema`` for csv/
    json at scale — inference is an extra full pass over the prefix."""
    if isinstance(paths, str):
        paths = [paths]
    paths = [normalize_object_path(p) for p in paths]
    reader = spark.read.format(fmt).options(**(options or {}))
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(paths)


def import_files_to_rds(
    spark: SparkSession,
    src_paths: str | list[str],
    store: JdbcTableStore,
    table: str,
    keys: list[str] | None = None,
    fmt: str = "csv",
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> int:
    """The full reference pipeline shape: object-store files → one
    distributed read → one set-oriented MERGE into the RDS table.
    With ``keys`` the import is idempotent (re-running the same prefix
    upserts, matching the per-row ON CONFLICT the reference's Postgres
    twin uses); without keys it appends. Returns rows read."""
    df = read_objects(spark, src_paths, fmt=fmt, schema=schema, options=options)
    df = df.localCheckpoint(eager=True)  # count + write: scan source once
    n = df.count()
    if keys:
        if store.exists(table):
            store.upsert(table, df, keys)
        else:
            # first load CREATEs the table; keep the key-uniqueness
            # contract upsert guarantees from then on
            store.overwrite(table, df.dropDuplicates(keys))
    else:
        store.append(table, df)
    return n
