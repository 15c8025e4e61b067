"""Exactly-once streaming sink into a JDBC store (foreachBatch).

Spark's JDBC writer is not a streaming sink, and ``foreachBatch`` only
guarantees AT-LEAST-once: after a crash the restarted query replays the
last uncommitted micro-batch into the function. This sink makes the
effect exactly-once with two standard pieces:

1. a **batch ledger** table keyed (sink_id, batch_id): a batch id
   present in the ledger was durably committed in full, so a replay
   returns immediately;
2. **idempotent writes** for the window where the crash hit AFTER the
   data write but BEFORE the ledger row:
   - ``mode="upsert"`` is naturally idempotent (key-matched MERGE);
   - ``mode="append"`` stamps every row with ``batch_seq`` and the
     replay path DELETEs ``WHERE batch_seq = N`` first — one
     metadata-grain statement, never a table rewrite.

The ledger insert runs on the DRIVER over a plain ``java.sql``
connection (a one-row statement does not deserve a Spark job); the
data write is the executor-parallel ``df.write.jdbc`` the batch store
already uses. Against embedded Derby this is all testable in-container
(tests/test_streaming_jdbc_sink.py, incl. simulated replay and the
crash-between-write-and-ledger window); against Postgres/SQL Server
the same statements run unchanged on a networked URL.

Reference anchor: the reference's sink IS a JDBC database written
row-at-a-time with no retry story (import_files_to_postgre.py:145-227)
— a crashed half-written file imports twice. This module is that
sink's streaming face with the dedup discipline the reference lacked,
next to streaming/file_ingest.py's checkpointed source side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.pipeline.jdbc_store import JdbcTableStore

LEDGER_TABLE = "stream_batch_ledger"

# "table already exists" SQLStates: Derby X0Y32, Postgres 42P07,
# SQL Server S0001/2714 — the create-if-absent race is benign.
_EXISTS_STATES = frozenset({"X0Y32", "42P07", "S0001"})


class StreamingJdbcSink:
    """``foreachBatch`` callable writing a micro-batch stream into one
    JDBC table exactly once. ``sink_id`` names this (query, table)
    pair in the shared ledger — two queries feeding the same store
    must use distinct sink_ids."""

    def __init__(
        self,
        store: JdbcTableStore,
        table: str,
        sink_id: str,
        mode: str = "append",
        keys: list[str] | None = None,
    ):
        if mode not in ("append", "upsert"):
            raise ValueError(f"mode must be append|upsert, got {mode!r}")
        if mode == "upsert" and not keys:
            raise ValueError("upsert mode requires keys")
        self.store = store
        self.table = table
        self.sink_id = sink_id
        self.mode = mode
        self.keys = keys or []
        self._ensure_ledger()

    # ---- driver-side single-statement JDBC ---------------------------

    def _connection(self):
        jvm = self.store.spark._jvm
        driver = self.store.properties.get("driver")
        if driver:
            jvm.java.lang.Class.forName(driver)
        return jvm.java.sql.DriverManager.getConnection(self.store.url)

    def _execute(self, sql: str, ignore_states: frozenset = frozenset()) -> None:
        conn = self._connection()
        try:
            st = conn.createStatement()
            try:
                st.execute(sql)
            except Exception as exc:  # py4j wraps java.sql.SQLException
                jt = getattr(exc, "java_exception", None)
                state = jt.getSQLState() if jt is not None else None
                if state not in ignore_states:
                    raise
            finally:
                st.close()
        finally:
            conn.close()

    def _query_one(self, sql: str):
        conn = self._connection()
        try:
            st = conn.createStatement()
            rs = st.executeQuery(sql)
            try:
                return rs.getLong(1) if rs.next() else None
            finally:
                rs.close()
                st.close()
        finally:
            conn.close()

    def _ensure_ledger(self) -> None:
        self._execute(
            # quoted lowercase identifiers so Spark reads the ledger
            # back with the same names the tests (and any downstream
            # audit query) use — unquoted DDL would uppercase them
            f'CREATE TABLE {LEDGER_TABLE} ('
            '"sink_id" VARCHAR(128) NOT NULL, '
            '"batch_id" BIGINT NOT NULL, '
            '"n_rows" BIGINT NOT NULL, '
            'PRIMARY KEY ("sink_id", "batch_id"))',
            ignore_states=_EXISTS_STATES,
        )

    def _committed(self, batch_id: int) -> bool:
        got = self._query_one(
            f'SELECT COUNT(*) FROM {LEDGER_TABLE} '
            f'WHERE "sink_id" = \'{self.sink_id}\' '
            f'AND "batch_id" = {int(batch_id)}'
        )
        return bool(got)

    # ---- the foreachBatch contract ------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._committed(batch_id):
            return  # durably done — checkpoint-recovery replay
        if self.mode == "upsert":
            incoming = batch_df.dropDuplicates(self.keys)
            if self.store.exists(self.table):
                self.store.upsert(self.table, incoming, self.keys)
            else:
                # first batch bootstraps the table (store.read's typed
                # empty-frame fallback only knows the pipeline SCHEMAS)
                self.store.overwrite(self.table, incoming)
        else:
            stamped = batch_df.withColumn("batch_seq", F.lit(int(batch_id)))
            if self.store.exists(self.table):
                # crash-window replay: remove any half-written rows of
                # THIS batch before re-appending (one indexed delete).
                # Spark's JDBC writer creates columns QUOTED, so the
                # lowercase name must be quoted here too (Derby would
                # otherwise look up BATCH_SEQ).
                self._execute(
                    f'DELETE FROM {self.table} '
                    f'WHERE "batch_seq" = {int(batch_id)}'
                )
            self.store.append(self.table, stamped)
        n = batch_df.count()
        self._execute(
            f'INSERT INTO {LEDGER_TABLE} ("sink_id", "batch_id", "n_rows") '
            f"VALUES ('{self.sink_id}', {int(batch_id)}, {n})"
        )
