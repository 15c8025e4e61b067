"""Structured Streaming integration tests (SURVEY.md §2.9): the window
transforms running behind real file-source streams, checkpointed
exactly-once file ingestion with dead-letter routing, bounded-state
dedup, and the keyed-state operator."""

from __future__ import annotations

import json
import time
import os

import pytest
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.streaming import file_ingest, windows as sw

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _write_json_batch(path: str, name: str, rows: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _rows(n0: int, n: int, user: int = 1) -> list[dict]:
    return [
        {
            "event_id": i,
            "ts": f"2024-01-01T00:{i:02d}:00.000Z",
            "user_id": user,
            "event_type": "click",
            "value": float(i),
        }
        for i in range(n0, n0 + n)
    ]


def test_file_stream_ingestion_exactly_once(spark, tmp_path):
    """Two drops into the inbox → both batches processed, none twice
    (checkpointed file tracking replaces the reference's
    move-on-success bookkeeping)."""
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_json_batch(inbox, "a.json", _rows(0, 3))

    def process(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
    file_ingest.run_ingestion(stream, process, ckpt).awaitTermination(60)
    assert spark.read.parquet(out).count() == 3

    # second drop; restart with same checkpoint → only new file read
    _write_json_batch(inbox, "b.json", _rows(10, 2))
    stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
    file_ingest.run_ingestion(stream, process, ckpt).awaitTermination(60)
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert got.select(F.count_distinct("event_id")).first()[0] == 5


def test_dead_letter_routing(spark, tmp_path):
    """A poison batch lands in the dead-letter dir; the stream
    finishes instead of aborting (the reference's data_errors/
    routing, utils_tools.py:199-231, without data loss)."""
    inbox = str(tmp_path / "inbox")
    dlq = str(tmp_path / "dlq")
    _write_json_batch(inbox, "a.json", _rows(0, 4))

    def process(batch_df, batch_id):
        raise RuntimeError("sink down")

    stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
    file_ingest.run_ingestion(
        stream, process, str(tmp_path / "ckpt"), dead_letter_dir=dlq
    ).awaitTermination(60)
    dead = spark.read.parquet(os.path.join(dlq, "batch_0"))
    assert dead.count() == 4


def test_streaming_tumbling_window_with_watermark(spark, tmp_path):
    """The SAME tumbling_agg transform that the batch oracle checks,
    behind readStream + watermark, complete mode to a memory sink."""
    inbox = str(tmp_path / "inbox")
    _write_json_batch(inbox, "a.json", _rows(0, 30))  # minutes 0..29

    stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
    agg = sw.tumbling_agg(sw.with_watermark(stream), duration="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (str(r["window_start"]), r["n_events"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", 10),
        ("2024-01-01 00:10:00", 10),
        ("2024-01-01 00:20:00", 10),
    }


def test_streaming_session_window(spark, tmp_path):
    """session_window behind a stream: two bursts 40 min apart with a
    30-min gap → two sessions for the user."""
    inbox = str(tmp_path / "inbox")
    rows = _rows(0, 3) + [
        dict(r, event_id=r["event_id"] + 100, ts=r["ts"].replace("T00:", "T01:"))
        for r in _rows(0, 3)
    ]
    _write_json_batch(inbox, "a.json", rows)

    stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
    agg = sw.session_agg(sw.with_watermark(stream, delay="1 hour"), gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("session_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(
        (str(r["session_start"]), r["n_events"])
        for r in spark.sql("SELECT * FROM session_test").collect()
    )
    assert got == [("2024-01-01 00:00:00", 3), ("2024-01-01 01:00:00", 3)]


def test_dedup_within_watermark_stream(spark, tmp_path):
    """Duplicate event_ids inside the watermark window are dropped
    across micro-batches (bounded-state J5)."""
    inbox = str(tmp_path / "inbox")
    _write_json_batch(inbox, "a.json", _rows(0, 3) + _rows(0, 2))  # dups in-file

    stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
    deduped = sw.dedup_within_watermark(stream, key_cols=("event_id",), delay="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.sql("SELECT count(*) n FROM dedup_test").first()["n"] == 3


def test_dedup_within_watermark_batch_equivalent(spark):
    """Batch fallback of the same operator is a plain dropDuplicates."""
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:01"), (2, "2024-01-01 00:00:02")],
        "event_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert sw.dedup_within_watermark(df).count() == 2


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: two
    files forced into separate batches via maxFilesPerTrigger."""
    pytest.importorskip("pandas")
    from pythondataingestionprocess_spark.streaming.stateful import running_user_totals

    inbox = str(tmp_path / "inbox")
    _write_json_batch(inbox, "a.json", _rows(0, 2, user=7))
    _write_json_batch(inbox, "b.json", _rows(10, 3, user=7))

    stream = file_ingest.file_stream(
        spark, inbox, EVENTS_SCHEMA, max_files_per_trigger=1
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM state_test").collect()
    # one emission per micro-batch; the final one carries the full total
    assert max(r["n_events"] for r in rows) == 5
    assert any(abs(r["sum_value"] - (0 + 1 + 10 + 11 + 12)) < 1e-9 for r in rows)


@pytest.mark.slow
def test_streaming_workbook_ingestion_into_store(spark, tmp_path):
    """Streaming twin of EP1: workbook-shaped rows arrive as files,
    each micro-batch deep-cleans and ingests into the star-schema
    store via foreachBatch — per-batch transaction semantics replacing
    the reference's per-file one, J5 dedup working ACROSS batches."""
    from datetime import date

    from pythondataingestionprocess_spark.pipeline import (
        ParquetTableStore,
        ingest_batch,
    )
    from pythondataingestionprocess_spark.sources import workbook as wb

    inbox = str(tmp_path / "inbox")
    store = ParquetTableStore(spark, str(tmp_path / "warehouse"))

    raw_schema = (
        "`Descripción` string, `Cant` string, `C. Unit` string, "
        "`Total Cmpr` string, `Fch Cmpr` string, `Fch Entrga` string, "
        "`Liga` string, src_file string, row_idx long"
    )

    def row(desc, cant, cunit, serial, liga, src, idx):
        return {
            "Descripción": desc, "Cant": cant, "C. Unit": cunit,
            "Total Cmpr": "0", "Fch Cmpr": serial, "Fch Entrga": None,
            "Liga": liga, "src_file": src, "row_idx": idx,
        }

    amz = "https://www.amazon.com.mx/dp/B0X/"
    _write_json_batch(inbox, "f1.json", [
        row("Toy A", "2", "93,35", "45369", amz, "f1", 0),
        row("Toy B", "1", "10", "45370", amz, "f1", 1),
    ])

    def process(batch_df, batch_id):
        cleaned = wb.clean_compras(batch_df)
        from pyspark.sql import functions as F

        for col, typ in [
            ("Precio", "double"), ("% Desc", "double"), ("C. Unit US", "double"),
            ("Envio", "double"), ("Dólar", "double"), ("Desct", "double"),
            ("Pzs", "long"), ("Costo Final", "double"), ("Picture_URL", "string"),
        ]:
            cleaned = cleaned.withColumn(col, F.lit(None).cast(typ))
        precios = spark.createDataFrame([], tests_precios_schema())
        ingest_batch(cleaned, precios, store, current_date=date(2024, 6, 1))

    def tests_precios_schema():
        from tests.fixtures import PRECIOS_SCHEMA

        return PRECIOS_SCHEMA

    stream = file_ingest.file_stream(spark, inbox, raw_schema)
    file_ingest.run_ingestion(stream, process, str(tmp_path / "ckpt")).awaitTermination(120)
    assert store.read("operation").count() == 2
    assert store.read("store").count() == 1

    # second drop: one duplicate of Toy A (J5-skips) + one new row
    _write_json_batch(inbox, "f2.json", [
        row("Toy A", "2", "93,35", "45369", amz, "f2", 0),  # dup across batches
        row("Toy C", "3", "7", "45371", amz, "f2", 1),
    ])
    stream = file_ingest.file_stream(spark, inbox, raw_schema)
    file_ingest.run_ingestion(stream, process, str(tmp_path / "ckpt")).awaitTermination(120)
    assert store.read("operation").count() == 3  # dup skipped
    assert store.read("product").count() == 3


@pytest.mark.slow
def test_stream_stream_interval_join(spark, tmp_path):
    """Both sides streaming with watermarks: a click 5 min before the
    error joins; a click 30 min before does not (outside the window)."""
    from pythondataingestionprocess_spark.streaming.joins import clicks_then_errors

    inbox_c = str(tmp_path / "clicks")
    inbox_e = str(tmp_path / "errors")
    _write_json_batch(inbox_c, "c.json", [
        {"event_id": 1, "ts": "2024-01-01T00:25:00.000Z", "user_id": 7,
         "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01T00:00:00.000Z", "user_id": 7,
         "event_type": "click", "value": 1.0},
    ])
    _write_json_batch(inbox_e, "e.json", [
        {"event_id": 9, "ts": "2024-01-01T00:30:00.000Z", "user_id": 7,
         "event_type": "error", "value": 0.0},
    ])
    clicks = file_ingest.file_stream(spark, inbox_c, EVENTS_SCHEMA)
    errors = file_ingest.file_stream(spark, inbox_e, EVENTS_SCHEMA)
    joined = clicks_then_errors(clicks, errors, window_minutes=10)
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ssj_test").collect()
    assert {(r["error_id"], r["click_id"]) for r in rows} == {(9, 1)}


def test_transform_with_state_locf(spark, tmp_path):
    """Spark-4 transformWithStateInPandas: LOCF state survives ACROSS
    micro-batches — batch 2's leading NULL inherits batch 1's last
    value for the same user."""
    import pytest as _pytest

    from pythondataingestionprocess_spark.streaming import stateful

    # modern API is protobuf-gated in this container; same semantics
    # via the legacy API below
    try:
        import google.protobuf  # noqa: F401
        locf = stateful.locf_fill_stream
    except ImportError:
        with _pytest.raises(ImportError):
            stateful.locf_fill_stream(None)
        locf = stateful.locf_fill_stream_legacy

    inbox = str(tmp_path / "inbox")
    schema = "user_id long, event_id long, ts timestamp, props string"
    _write_json_batch(inbox, "a.json", [
        {"user_id": 7, "event_id": 1, "ts": "2024-01-01T00:00:00Z", "props": "A"},
        {"user_id": 7, "event_id": 2, "ts": "2024-01-01T00:01:00Z", "props": None},
    ])
    _write_json_batch(inbox, "b.json", [
        {"user_id": 7, "event_id": 3, "ts": "2024-01-01T00:02:00Z", "props": None},
        {"user_id": 7, "event_id": 4, "ts": "2024-01-01T00:03:00Z", "props": "B"},
        {"user_id": 8, "event_id": 5, "ts": "2024-01-01T00:04:00Z", "props": None},
    ])
    stream = file_ingest.file_stream(
        spark, inbox, schema, max_files_per_trigger=1
    )
    q = (
        locf(stream)
        .writeStream.format("memory")
        .queryName("locf_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"]: r["props"] for r in spark.sql("SELECT * FROM locf_test").collect()}
    assert got == {1: "A", 2: "A", 3: "A", 4: "B", 5: None}


def test_kafka_parse_json_events_batch(spark):
    """parse_json_events is source-agnostic — exercised on a batch
    frame shaped like Kafka output (no broker in this container);
    PERMISSIVE: bad payloads → NULL columns, stream survives."""
    from pythondataingestionprocess_spark.streaming.kafka import parse_json_events

    raw = spark.createDataFrame(
        [
            (bytearray(b'{"event_id": 1, "value": 2.5}'), "2024-01-01 00:00:00"),
            (bytearray(b"not json at all"), "2024-01-01 00:00:01"),
        ],
        "value binary, timestamp string",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    out = parse_json_events(raw, "event_id long, value double").collect()
    by_ts = sorted(out, key=lambda r: r["kafka_ts"])
    assert by_ts[0]["event_id"] == 1 and by_ts[0]["value"] == 2.5
    assert by_ts[1]["event_id"] is None  # fault-isolated, not failed


def test_streaming_funnel_cross_batch_conversion(spark, tmp_path):
    """View in micro-batch 1, purchase in micro-batch 2 within the
    30-min window → conversion emitted from keyed state (the case the
    batch join can't handle incrementally). A purchase outside the
    window or without a prior view emits nothing."""
    pytest.importorskip("pandas")
    from pythondataingestionprocess_spark.streaming.stateful import funnel_stream

    inbox = str(tmp_path / "inbox")
    schema = "user_id long, event_id long, ts timestamp, event_type string, value double"
    _write_json_batch(inbox, "a.json", [
        {"user_id": 7, "event_id": 1, "ts": "2024-01-01T00:00:00Z",
         "event_type": "view", "value": 0.0},
        {"user_id": 9, "event_id": 2, "ts": "2024-01-01T00:00:30Z",
         "event_type": "view", "value": 0.0},
    ])
    _write_json_batch(inbox, "b.json", [
        # user 7: purchase 10 min after batch-1 view → converts
        {"user_id": 7, "event_id": 3, "ts": "2024-01-01T00:10:00Z",
         "event_type": "purchase", "value": 42.5},
        # user 9: purchase 2 h after its view → outside window
        {"user_id": 9, "event_id": 4, "ts": "2024-01-01T02:00:00Z",
         "event_type": "purchase", "value": 5.0},
        # user 8: purchase with no view at all
        {"user_id": 8, "event_id": 5, "ts": "2024-01-01T00:11:00Z",
         "event_type": "purchase", "value": 1.0},
    ])
    stream = file_ingest.file_stream(
        spark, inbox, schema, max_files_per_trigger=1
    )
    q = (
        funnel_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM funnel_test").collect()
    assert len(rows) == 1
    (conv,) = rows
    assert conv.user_id == 7 and abs(conv.value - 42.5) < 1e-9
    assert conv.view_ts.minute == 0 and conv.purchase_ts.minute == 10


def test_streaming_funnel_state_expiry(spark, tmp_path):
    """ProcessingTimeTimeout variant: a user idle past the expiry has
    their view-state dropped, so a later purchase (still inside the
    EVENT-time window) no longer converts — while a fresh user's
    view→purchase in the second batch converts normally, proving the
    expiry didn't break the operator."""
    pytest.importorskip("pandas")
    from pythondataingestionprocess_spark.streaming.stateful import (
        funnel_stream_expiring,
    )

    inbox = str(tmp_path / "inbox")
    schema = "user_id long, event_id long, ts timestamp, event_type string, value double"
    _write_json_batch(inbox, "a.json", [
        {"user_id": 7, "event_id": 1, "ts": "2024-01-01T00:00:00Z",
         "event_type": "view", "value": 0.0},
    ])
    # ProcessingTimeTimeout needs a continuous trigger (no-data batches
    # fire the timers), and every no-data batch runs the stateful
    # operator over ALL state partitions — at the suite's 32 shuffle
    # partitions that churn starves processAllAvailable, so run this
    # query on 2 partitions.
    n_part = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = file_ingest.file_stream(spark, inbox, schema, max_files_per_trigger=1)
        q = (
            funnel_stream_expiring(stream, idle_expiry_ms=1500)
            .writeStream.format("memory")
            .queryName("funnel_expiry_test")
            .outputMode("append")
            .trigger(processingTime="500 millisecond")
            .start()
        )
        try:
            # processAllAvailable is unusable here: with
            # ProcessingTimeTimeout every finished batch "requires
            # another batch" (a timer may fire later), so the no-new-data
            # latch never sets — poll progress instead.
            def wait_until(pred, timeout_s=90):
                deadline = time.time() + timeout_s
                while time.time() < deadline:
                    if pred():
                        return True
                    if q.exception() is not None:
                        raise AssertionError(q.exception())
                    time.sleep(0.5)
                return False

            # batch 0 (a.json, the view) committed
            assert wait_until(
                lambda: (q.lastProgress or {}).get("batchId", -1) >= 0
            )
            # idle long past the 1.5 s expiry; no-data micro-batches
            # fire the timeout and drop user 7's state
            time.sleep(6)
            _write_json_batch(inbox, "b.json", [
                # user 7: purchase 10 min after the view in event time —
                # inside the 30-min window, but the state expired
                {"user_id": 7, "event_id": 2, "ts": "2024-01-01T00:10:00Z",
                 "event_type": "purchase", "value": 99.0},
                # user 8: fresh view + purchase in this batch → converts
                {"user_id": 8, "event_id": 3, "ts": "2024-01-01T00:11:00Z",
                 "event_type": "view", "value": 0.0},
                {"user_id": 8, "event_id": 4, "ts": "2024-01-01T00:12:00Z",
                 "event_type": "purchase", "value": 7.0},
            ])
            assert wait_until(
                lambda: spark.sql("SELECT * FROM funnel_expiry_test").count() >= 1
            ), "user 8's conversion never arrived"
            time.sleep(3)  # settle: give a late user-7 row time to (not) appear
            rows = spark.sql("SELECT * FROM funnel_expiry_test").collect()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", n_part)
    assert [r.user_id for r in rows] == [8]
    assert abs(rows[0].value - 7.0) < 1e-9


def test_streaming_funnel_watermarked_late_drop(spark, tmp_path):
    """EventTimeTimeout variant: the watermark (10 min behind max
    event time) advances past a late purchase's timestamp between
    micro-batches, so the late row is dropped BEFORE the stateful
    operator and its conversion never fires — while an on-time
    purchase in the same batch converts normally. Deterministic
    w.r.t. the data, unlike the processing-time expiry test above.
    Batch-face oracle twin: events_funnel_watermark."""
    pytest.importorskip("pandas")
    from pythondataingestionprocess_spark.streaming.stateful import (
        funnel_stream_watermarked,
    )

    inbox = str(tmp_path / "inbox")
    schema = "user_id long, event_id long, ts timestamp, event_type string, value double"
    _write_json_batch(inbox, "a.json", [
        {"user_id": 7, "event_id": 1, "ts": "2024-01-01T00:00:00Z",
         "event_type": "view", "value": 0.0},
        {"user_id": 9, "event_id": 2, "ts": "2024-01-01T01:00:00Z",
         "event_type": "view", "value": 0.0},
    ])
    # After batch a the watermark is 01:00:00 - 10 min = 00:50:00.
    # The file source orders batches by modification time — tie-broken
    # arbitrarily — so give b.json a strictly later mtime.
    time.sleep(1.1)
    _write_json_batch(inbox, "b.json", [
        # user 7: purchase at 00:05 — inside the 30-min window of its
        # view, but OLDER than the watermark → dropped as late, no
        # conversion.
        {"user_id": 7, "event_id": 3, "ts": "2024-01-01T00:05:00Z",
         "event_type": "purchase", "value": 42.5},
        # user 9: purchase at 01:10 — on time, 10 min after its view →
        # converts.
        {"user_id": 9, "event_id": 4, "ts": "2024-01-01T01:10:00Z",
         "event_type": "purchase", "value": 5.0},
    ])
    stream = file_ingest.file_stream(
        spark, inbox, schema, max_files_per_trigger=1
    )
    q = (
        funnel_stream_watermarked(stream, delay="10 minutes")
        .writeStream.format("memory")
        .queryName("funnel_wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM funnel_wm_test").collect()
    assert [r.user_id for r in rows] == [9]
    assert abs(rows[0].value - 5.0) < 1e-9
    assert rows[0].view_ts.hour == 1 and rows[0].purchase_ts.minute == 10


def test_streaming_funnel_watermarked_state_is_bounded(spark, tmp_path):
    """The event-time timer must actually EVICT state: a user's
    one-timestamp slot dies once the watermark clears
    last_view + 30 min. Three data micro-batches advance the watermark
    past users 7's and 9's windows; availableNow then runs one FINAL
    no-data batch whose watermark (02:50, from batch c's max) fires
    user 8's timer as well. The state-operator metrics must show
    exactly those three removals and a final state of just user 10 —
    the 100 TB guarantee that state tracks the active window, not the
    all-time key set."""
    pytest.importorskip("pandas")
    from pythondataingestionprocess_spark.streaming.stateful import (
        funnel_stream_watermarked,
    )

    inbox = str(tmp_path / "inbox")
    schema = "user_id long, event_id long, ts timestamp, event_type string, value double"
    _write_json_batch(inbox, "a.json", [
        {"user_id": 7, "event_id": 1, "ts": "2024-01-01T00:00:00Z",
         "event_type": "view", "value": 0.0},   # timer: 00:30
        {"user_id": 9, "event_id": 2, "ts": "2024-01-01T01:00:00Z",
         "event_type": "view", "value": 0.0},   # timer: 01:30
    ])
    time.sleep(1.1)
    # batch b: watermark is now 00:50 → user 7's timer fires (00:30).
    _write_json_batch(inbox, "b.json", [
        {"user_id": 8, "event_id": 3, "ts": "2024-01-01T02:00:00Z",
         "event_type": "view", "value": 0.0},   # timer: 02:30
    ])
    time.sleep(1.1)
    # batch c: watermark is now 01:50 → user 9's timer fires (01:30);
    # user 8 (02:30) survives.
    _write_json_batch(inbox, "c.json", [
        {"user_id": 10, "event_id": 4, "ts": "2024-01-01T03:00:00Z",
         "event_type": "view", "value": 0.0},
        # purchase-only user: must leave NO state behind — a (None,)
        # slot carries no event-time timer and would otherwise live
        # forever (the all-time-key-set leak).
        {"user_id": 11, "event_id": 5, "ts": "2024-01-01T03:00:00Z",
         "event_type": "purchase", "value": 1.0},
    ])
    stream = file_ingest.file_stream(
        spark, inbox, schema, max_files_per_trigger=1
    )
    q = (
        funnel_stream_watermarked(stream, delay="10 minutes")
        .writeStream.format("memory")
        .queryName("funnel_wm_state_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    assert progresses, "no state-operator progress recorded"
    removed = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0) for p in progresses
    )
    final_total = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    # 7, 9, 8 evicted by their event-time timers; 11's transient
    # (None,) slot — created by the shared update, removed by the
    # watermarked wrapper in the same batch — counts as the fourth.
    assert removed == 4, f"expected 4 evictions, got {removed}"
    assert final_total == 1, f"expected only user 10 live, got {final_total}"


def test_rate_source_windowed_agg(spark):
    """The built-in rate source (the load-generator for streaming
    smoke tests): rows/sec → 5-second tumbling counts → memory sink.
    Proves the engine's windowed aggregation runs on a pure-streaming
    source with no files involved."""
    from pythondataingestionprocess_spark.streaming import windows as swin

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .option("numPartitions", 2)
        .load()
        .withColumnRenamed("timestamp", "ts")
    )
    agg = stream.groupBy(F.window("ts", "5 seconds")).count()
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_test")
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM rate_test").collect()
            if rows and sum(r["count"] for r in rows) >= 50:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert rows, "rate source produced no windows"
    assert all(r["window"].end > r["window"].start for r in rows)


def test_streaming_dedup_against_signature_store(spark, tmp_path):
    """The daily-ingest dedup pipeline end-to-end: drop 1 (docs 1, 2 —
    near-dups of each other) yields a within-batch pair and seeds the
    signature store; drop 2 (doc 11 ≈ docs 1 AND 2 — one word changed
    at the start vs their end-changes, trigram Jaccard 27/29 and 26/30
    — doc 12 novel) yields exactly the two cross-batch pairs from the
    band-bucket join against the store — no corpus recompute, no pair
    involving the novel doc."""
    from pythondataingestionprocess_spark.streaming.dedup_ingest import (
        dedup_batch_fn,
    )

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four"
    ).split()
    a_text = " ".join(base)
    b_text = " ".join(base[:-1] + ["changedlast"])
    c_text = " ".join(["changedfirst"] + base[1:])
    d_text = " ".join(f"novel{i}" for i in range(30))

    inbox = str(tmp_path / "inbox")
    store = str(tmp_path / "store")
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    fn = dedup_batch_fn(store, pairs_out)

    _write_json_batch(inbox, "a.json", [
        {"doc_id": 1, "text": a_text},
        {"doc_id": 2, "text": b_text},
    ])
    stream = file_ingest.file_stream(spark, inbox, schema)
    file_ingest.run_ingestion(stream, fn, ckpt).awaitTermination(120)

    batch0 = spark.read.parquet(pairs_out + "/batch_id=0").collect()
    assert {(r.id_a, r.id_b, r.kind) for r in batch0} == {(1, 2, "within")}
    assert all(r.jaccard >= 0.5 for r in batch0)

    _write_json_batch(inbox, "b.json", [
        {"doc_id": 11, "text": c_text},
        {"doc_id": 12, "text": d_text},
    ])
    stream = file_ingest.file_stream(spark, inbox, schema)
    file_ingest.run_ingestion(stream, fn, ckpt).awaitTermination(120)

    batch1 = spark.read.parquet(pairs_out + "/batch_id=1").collect()
    assert {(r.id_a, r.id_b, r.kind) for r in batch1} == {
        (11, 1, "cross"),
        (11, 2, "cross"),
    }
    # the store now holds signatures for all four docs
    n_sig = spark.read.parquet(store + "/shingles").count()
    assert n_sig == 4


def test_dedup_ingest_retry_is_idempotent(spark, tmp_path):
    """foreachBatch retry semantics (ADVICE r2, medium): replaying a
    batch whose append_to_store already committed must (a) not emit
    spurious self 'cross' pairs from finding its own signatures in the
    store, (b) not leave duplicate signature rows behind, and (c) not
    multiply pair output for later batches."""
    from pythondataingestionprocess_spark.streaming.dedup_ingest import (
        dedup_batch_fn,
    )

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()
    a_text = " ".join(base)
    b_text = " ".join(base[:-1] + ["changedlast"])
    c_text = " ".join(["changedfirst"] + base[1:])

    store = str(tmp_path / "store")
    pairs_out = str(tmp_path / "pairs")
    fn = dedup_batch_fn(store, pairs_out)
    batch0 = spark.createDataFrame(
        [(1, a_text), (2, b_text)], "doc_id long, text string"
    )

    fn(batch0, 0)
    fn(batch0, 0)  # crash-after-store-append replay of the same batch

    replayed = spark.read.parquet(pairs_out + "/batch_id=0").collect()
    assert {(r.id_a, r.id_b, r.kind) for r in replayed} == {(1, 2, "within")}
    assert all(r.id_a != r.id_b for r in replayed)
    # idempotent subdir overwrite: one signature row set, not two
    shingles = spark.read.parquet(store + "/shingles")
    assert shingles.count() == 2
    buckets = spark.read.parquet(store + "/buckets")
    assert buckets.groupBy("doc_id", "band").count().filter("count > 1").count() == 0

    # a later batch still sees exactly its true cross pairs, once each
    batch1 = spark.createDataFrame([(11, c_text)], "doc_id long, text string")
    fn(batch1, 1)
    b1 = spark.read.parquet(pairs_out + "/batch_id=1").collect()
    assert {(r.id_a, r.id_b, r.kind) for r in b1} == {
        (11, 1, "cross"),
        (11, 2, "cross"),
    }


def test_rate_source_tumbling_window(spark, tmp_path):
    """The built-in rate source (synthetic load generator — the
    standard way to smoke a streaming topology without external
    systems) driving the shared tumbling transform: rows arrive at a
    fixed rows/sec, get bucketed into 1-second event-time windows, and
    the windowed counts must account for every generated row exactly
    once. Proves the window transforms are source-agnostic (file
    source elsewhere, rate source here, kafka in production — same
    plan)."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .option("numPartitions", 2)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.lit("rate").alias("event_type"),
            (F.col("value") % 10).cast("double").alias("value"),
        )
    )
    agg = sw.tumbling_agg(stream, ts_col="ts", duration="1 second")
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_tumbling")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # Poll the sink with a hard deadline (the sibling rate test's
        # shape) instead of q.processAllAvailable(): a rate source
        # never runs dry, so on a host where one micro-batch takes
        # longer than the generation interval processAllAvailable can
        # chase the tail FOREVER and the deadline at the loop top is
        # never reached again (observed: 1,500+ micro-batches / 30+
        # stuck minutes under heavy ambient load, r17).
        deadline = time.time() + 60
        total, n_windows = 0, 0
        while time.time() < deadline:
            row = spark.sql(
                "SELECT SUM(n_events) AS n, COUNT(*) AS w FROM rate_tumbling"
            ).collect()[0]
            total, n_windows = row.n or 0, row.w or 0
            # ≥4 windows guarantees at least two INTERIOR ones — with
            # only a count floor, 200 rows can land as exactly two
            # FULL windows and leave nothing interior to assert on
            # (observed flake)
            if total >= 150 and n_windows >= 4:
                break
            time.sleep(0.5)
        assert total >= 150 and n_windows >= 4, (
            f"rate source produced only {total} rows / {n_windows} windows"
        )
        per_window = spark.sql(
            "SELECT window_start, n_events FROM rate_tumbling ORDER BY window_start"
        ).collect()
        # interior windows (not first/last, which are partially filled
        # at stop time) must hold exactly rowsPerSecond rows each
        interior = [r.n_events for r in per_window[1:-1]]
        assert interior and all(n == 100 for n in interior), per_window
    finally:
        q.stop()


class _StubState:
    """Minimal GroupState stand-in for driving the pure update
    functions without a streaming query."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    @property
    def hasTimedOut(self):
        return False

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None


def test_locf_update_deterministic_on_timestamp_ties():
    """ADVICE r3: rows with identical ts must fill deterministically —
    (ts, event_id) stable sort, regardless of chunk boundaries or
    within-chunk order."""
    import pandas as pd
    from pythondataingestionprocess_spark.streaming.stateful import _locf_update

    t = pd.Timestamp("2024-01-01 00:00:00")
    # two chunks; the tied-ts rows arrive in scrambled order
    chunk_a = pd.DataFrame(
        {"user_id": [1, 1], "event_id": [3, 1], "ts": [t, t], "props": [None, "a"]}
    )
    chunk_b = pd.DataFrame(
        {"user_id": [1], "event_id": [2], "ts": [t], "props": ["b"]}
    )
    out = pd.concat(list(_locf_update((1,), iter([chunk_a, chunk_b]), _StubState())))
    got = dict(zip(out["event_id"], out["props"]))
    # event 3's NULL must inherit from event 2 ("b") — the highest
    # event_id below it at the same ts — never from event 1
    assert got == {1: "a", 2: "b", 3: "b"}


def test_funnel_update_deterministic_on_timestamp_ties():
    """A view and a purchase at the SAME ts: (ts, event_id) ordering
    decides — view (lower event_id) anchors first, so the purchase
    converts; reversed ids mean the purchase precedes the view and must
    NOT convert against it."""
    import pandas as pd
    from pythondataingestionprocess_spark.streaming.stateful import _funnel_update

    t = pd.Timestamp("2024-01-01 00:00:00")

    def run(view_id, purchase_id):
        pdf = pd.DataFrame(
            {
                "user_id": [7, 7],
                "event_id": [purchase_id, view_id],
                "ts": [t, t],
                "event_type": ["purchase", "view"],
                "value": [9.9, 0.0],
            }
        )
        return list(_funnel_update((7,), iter([pdf]), _StubState()))

    converted = run(view_id=1, purchase_id=2)
    assert len(converted) == 1 and converted[0]["value"].iloc[0] == 9.9
    not_converted = run(view_id=2, purchase_id=1)
    assert not_converted == []


def test_stream_static_dim_enrichment_rollup(spark, tmp_path):
    """Stream-STATIC join (the streaming face of the catalog's
    broadcast-dim star): a live event feed is stamped with its user's
    static segment, then rolled into a tumbling revenue window per
    segment. Left semantics: a user missing from the dim flows through
    with a NULL segment instead of vanishing — dims may lag the
    stream."""
    from pythondataingestionprocess_spark.streaming.joins import (
        enrich_with_static_dim,
    )

    inbox = str(tmp_path / "inbox")
    rows = _rows(0, 4, user=1) + [
        dict(r, event_id=r["event_id"] + 50, user_id=2) for r in _rows(0, 4)
    ]
    rows.append(
        {"event_id": 99, "ts": "2024-01-01T00:01:00.000Z", "user_id": 777,
         "event_type": "click", "value": 5.0}
    )
    _write_json_batch(inbox, "a.json", rows)
    dim = spark.createDataFrame(
        [(1, "retail"), (2, "wholesale"), (3, "unused")],
        "user_id long, segment string",
    )

    stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
    enriched = enrich_with_static_dim(stream, dim, "user_id")
    agg = (
        sw.with_watermark(enriched)
        .groupBy(F.window("ts", "10 minutes"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("revenue"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "segment",
            "n_events",
            "revenue",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("stream_static_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["segment"], r["n_events"], r["revenue"])
        for r in spark.sql("SELECT * FROM stream_static_test").collect()
    }
    # events 0..3 carry value 0+1+2+3 = 6.0 per user
    assert got == {
        ("retail", 4, 6.0),
        ("wholesale", 4, 6.0),
        (None, 1, 5.0),  # user 777 absent from the dim — left join
    }

    # batch face of the same function: the dim probe must be a
    # broadcast hash join (no shuffle of the fact side)
    batch = spark.createDataFrame(
        [(1, 1.0)], "user_id long, value double"
    )
    plan = enrich_with_static_dim(batch, dim, "user_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_streaming_agg_on_rocksdb_state_store(spark, tmp_path):
    """The tumbling aggregation running on the RocksDB state store
    provider — the 100 TB state choice: the default HDFS-backed
    provider holds every key's state in executor HEAP (double-buffered
    maps), which caps keyed-state cardinality at memory; RocksDB keeps
    the working set on local disk with block-cache reads, so state
    scales with SSD, not heap. Functional parity is asserted on the
    same windows as the default-provider test; the progress metrics
    must prove RocksDB actually served the state ops."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(provider_key, None)
    inbox = str(tmp_path / "inbox")
    _write_json_batch(inbox, "a.json", _rows(0, 30))
    try:
        spark.conf.set(
            provider_key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
        agg = sw.tumbling_agg(sw.with_watermark(stream), duration="10 minutes")
        q = (
            agg.writeStream.format("memory")
            .queryName("rocksdb_tumbling")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (str(r["window_start"]), r["n_events"])
            for r in spark.sql("SELECT * FROM rocksdb_tumbling").collect()
        }
        assert got == {
            ("2024-01-01 00:00:00", 10),
            ("2024-01-01 00:10:00", 10),
            ("2024-01-01 00:20:00", 10),
        }
        progress = json.dumps(
            [json.loads(p.json) for p in q.recentProgress]
        ).lower()
        assert "rocksdb" in progress, (
            "state operator metrics show no RocksDB involvement — "
            "provider conf was not picked up"
        )
    finally:
        if saved is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, saved)


def test_streaming_partitioned_parquet_sink_exactly_once(spark, tmp_path):
    """Stream → day-partitioned parquet table, exactly-once: the
    built-in file sink commits each micro-batch through its
    _spark_metadata transaction log, so a restart from the same
    checkpoint neither re-writes batch 1 nor loses batch 2 — the
    streaming face of the warehouse's partitioned layout
    (storage.write_partitioned covers the batch reload face).
    Downstream readers get partition pruning on the day directories
    immediately."""
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    day1 = _rows(0, 3)  # 2024-01-01
    day2 = [dict(r, event_id=r["event_id"] + 50,
                 ts=r["ts"].replace("-01T", "-02T")) for r in _rows(0, 2)]
    _write_json_batch(inbox, "a.json", day1 + day2[:1])

    def start():
        stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
        return (
            stream.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .partitionBy("day")
            .trigger(availableNow=True)
            .start()
        )

    start().awaitTermination(60)
    time.sleep(1.1)  # distinct mtime for the second inbox file
    _write_json_batch(inbox, "b.json", day2[1:])
    start().awaitTermination(60)

    got = spark.read.parquet(out)
    assert got.count() == 5
    assert got.select(F.count_distinct("event_id")).first()[0] == 5
    # partition values are read back type-INFERRED (yyyy-MM-dd → DATE)
    per_day = {str(r["day"]): r["n"] for r in
               got.groupBy("day").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_day == {"2024-01-01": 3, "2024-01-02": 2}
    import os as _os
    assert _os.path.isdir(_os.path.join(out, "day=2024-01-02"))


def test_row_level_malformed_quarantine(spark, tmp_path):
    """PERMISSIVE parse + row-level quarantine: two poison lines in a
    four-line file divert to quarantine/batch_0 WITH their raw text
    (replayable), while the two clean rows reach the sink — one bad
    row no longer dead-letters its whole batch. The stream finishes
    normally."""
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    quarantine = str(tmp_path / "quarantine")
    os.makedirs(inbox, exist_ok=True)
    good = _rows(0, 2)
    with open(os.path.join(inbox, "a.json"), "w") as f:
        f.write(json.dumps(good[0]) + "\n")
        f.write('{"event_id": 7, "ts": "2024-01-01T00:07:00.000Z", "user_id"\n')
        f.write(json.dumps(good[1]) + "\n")
        f.write("not json at all\n")

    def process(batch_df, batch_id):
        clean = file_ingest.quarantine_malformed(batch_df, quarantine, batch_id)
        clean.write.mode("append").parquet(out)

    stream = file_ingest.file_stream(
        spark, inbox, file_ingest.with_corrupt_capture(EVENTS_SCHEMA)
    )
    file_ingest.run_ingestion(
        stream, process, str(tmp_path / "ckpt")
    ).awaitTermination(60)

    clean = spark.read.parquet(out)
    assert sorted(r["event_id"] for r in clean.collect()) == [0, 1]
    assert "_corrupt_record" not in clean.columns
    quarantined = spark.read.parquet(os.path.join(quarantine, "batch_0"))
    raws = [r["_corrupt_record"] for r in quarantined.collect()]
    assert len(raws) == 2
    assert any("not json at all" in r for r in raws)


def test_progress_listener_logs_metrics_as_queryable_table(spark, tmp_path):
    """The ops surface: a session-attached listener persists every
    micro-batch's StreamingQueryProgress as JSON lines that read back
    as a normal DataFrame — rows/sec, batch duration, state and
    watermark metrics become warehouse-queryable with no pipeline
    instrumentation."""
    from pythondataingestionprocess_spark.streaming.monitoring import (
        attach_progress_log,
    )

    inbox = str(tmp_path / "inbox")
    log_dir = str(tmp_path / "qlog")
    _write_json_batch(inbox, "a.json", _rows(0, 10))
    listener = attach_progress_log(spark, log_dir)
    try:
        stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
        agg = sw.tumbling_agg(sw.with_watermark(stream), duration="10 minutes")
        q = (
            agg.writeStream.format("memory")
            .queryName("progress_log_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener callbacks are async — give the driver thread a beat
        deadline = time.time() + 20
        while time.time() < deadline and not os.listdir(log_dir):
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    log = spark.read.json(log_dir)
    assert log.count() >= 1
    assert "numInputRows" in log.columns and "batchId" in log.columns
    mine = log.filter(F.col("name") == "progress_log_test")
    assert mine.agg(F.sum("numInputRows")).first()[0] == 10


def test_streaming_ewma_matches_exact_recursion(spark, tmp_path):
    """The keyed-state EWMA carries the EXACT recursion across
    micro-batches: two files forced into separate batches must yield
    the same per-event scores as folding the whole series at once
    (no truncation — the state is the whole history), with a second
    interleaved user confirming key isolation."""
    pytest.importorskip("pandas")
    from pythondataingestionprocess_spark.streaming.stateful import (
        decayed_feature_stream,
    )

    inbox = str(tmp_path / "inbox")
    _write_json_batch(inbox, "a.json", _rows(0, 3, user=7) + _rows(0, 2, user=8))
    time.sleep(1.1)  # FileStreamSource orders same-mtime files arbitrarily
    _write_json_batch(inbox, "b.json", _rows(10, 3, user=7))

    stream = file_ingest.file_stream(
        spark, inbox, EVENTS_SCHEMA, max_files_per_trigger=1
    )
    q = (
        decayed_feature_stream(stream, half_life_rows=4.0)
        .writeStream.format("memory")
        .queryName("ewma_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_id"]): r["decayed"]
        for r in spark.sql("SELECT * FROM ewma_test").collect()
    }
    a = 0.5 ** (1.0 / 4.0)
    for user, ids in ((7, [0, 1, 2, 10, 11, 12]), (8, [0, 1])):
        s = None
        for i in ids:
            v = float(i)
            s = v if s is None else v + a * s
            assert got[(user, i)] == pytest.approx(s, abs=1e-12), (user, i)
    assert len(got) == 8


def test_stream_scd2_pit_enrichment_event_time_correct(spark, tmp_path):
    """SCD2 point-in-time enrichment on a stream: each event joins the
    dimension VERSION valid at its event time, so a late event from
    before a price change still enriches with the old version —
    event-time-correct and replay-deterministic, where a
    current-version join would stamp whatever happens to be current at
    processing time. Unknown keys and pre-history events flow through
    NULL (left join)."""
    from pythondataingestionprocess_spark.streaming.joins import enrich_with_scd2_dim

    inbox = str(tmp_path / "inbox")
    # user 1: events at :00..:03; user 2 same shape; user 777 unknown
    rows = _rows(0, 4, user=1) + [
        dict(r, event_id=r["event_id"] + 50, user_id=2) for r in _rows(0, 4)
    ]
    rows.append(
        {"event_id": 99, "ts": "2024-01-01T00:01:00.000Z", "user_id": 777,
         "event_type": "click", "value": 5.0}
    )
    _write_json_batch(inbox, "a.json", rows)

    # user 1's tier changes at :02 (SCD2: two contiguous versions);
    # user 2 has a single version starting at :01 — the :00 event
    # PRE-DATES it and must enrich NULL
    versions = spark.createDataFrame(
        [
            (1, "bronze", "2024-01-01T00:00:00", "2024-01-01T00:02:00"),
            (1, "gold", "2024-01-01T00:02:00", "2099-01-01T00:00:00"),
            (2, "silver", "2024-01-01T00:01:00", "2099-01-01T00:00:00"),
        ],
        "user_id long, tier string, valid_from string, valid_to string",
    ).select(
        "user_id",
        "tier",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )

    stream = file_ingest.file_stream(spark, inbox, EVENTS_SCHEMA)
    enriched = enrich_with_scd2_dim(stream, versions, "user_id", "ts").select(
        "event_id", "tier"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("scd2_pit_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["event_id"]: r["tier"]
        for r in spark.sql("SELECT * FROM scd2_pit_test").collect()
    }
    assert got == {
        0: "bronze", 1: "bronze",        # user 1 before the change
        2: "gold", 3: "gold",            # user 1 after the change
        50: None,                        # user 2 pre-history event
        51: "silver", 52: "silver", 53: "silver",
        99: None,                        # unknown key
    }


def test_streaming_weighted_sample_matches_batch_face(spark, tmp_path):
    """Online/offline parity for A-ES weighted sampling: stream the
    sf0.001 documents in three micro-batches through the keyed-state
    sampler; each source's LATEST emission must equal the batch
    query's top-10 for that source over the full corpus (state is
    cumulative, so the last touch of a source has seen all its docs)."""
    pytest.importorskip("pandas")
    from pythondataingestionprocess_spark.plans import REGISTRY
    from pythondataingestionprocess_spark.streaming.stateful import (
        weighted_sample_stream,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "source", "doc_id", "n_chars"
    )
    rows = [r.asDict() for r in docs.collect()]
    inbox = str(tmp_path / "inbox")
    third = (len(rows) + 2) // 3
    for i in range(3):
        _write_json_batch(
            inbox, f"{chr(97 + i)}.json", rows[i * third : (i + 1) * third]
        )

    stream = file_ingest.file_stream(
        spark, inbox, "source string, doc_id long, n_chars long",
        max_files_per_trigger=1,
    )
    latest: dict[str, object] = {}
    batch_no: dict[str, int] = {}

    def capture(batch_df, batch_id):
        pdf = batch_df.toPandas()
        for src, grp in pdf.groupby("source"):
            latest[src] = grp.sort_values("rn", ignore_index=True)
            batch_no[src] = batch_id

    q = (
        weighted_sample_stream(stream)
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    expect = (
        REGISTRY["corpus_weighted_sample"]
        .fn(spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    assert latest, "stream emitted nothing"
    assert set(latest) == set(expect["source"])
    for src, got in latest.items():
        want = (
            expect[expect["source"] == src]
            .sort_values("rn", ignore_index=True)[
                ["source", "doc_id", "n_chars", "sample_key", "rn"]
            ]
        )
        got = got[["source", "doc_id", "n_chars", "sample_key", "rn"]]
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True)), src


def test_streaming_block_dedup_matches_batch_operator(spark, tmp_path):
    """Streaming C4-style block dedup equals the batch operator run
    over the concatenation of the batches in arrival order: per-doc
    retention unioned across micro-batches must match
    block_dedup_retention on all docs at once. A same-batch duplicate
    block, a cross-batch duplicate, and a fresh doc are all exercised;
    a manual RETRY of the last batch (after its store append landed)
    must reproduce identical retention — the ingest_batch partition
    exclusion at work."""
    from pythondataingestionprocess_spark.operators.dedup import (
        block_dedup_retention,
    )
    from pythondataingestionprocess_spark.streaming.dedup_ingest import (
        block_dedup_batch_fn,
    )

    b1 = " ".join(f"a{i}" for i in range(10))
    b2 = " ".join(f"b{i}" for i in range(10))
    b3 = " ".join(f"c{i}" for i in range(10))
    docs = [
        {"doc_id": 1, "text": f"{b1} {b2}"},   # batch 0
        {"doc_id": 2, "text": f"{b1} {b3}"},   # batch 0: b1 dup within batch
        {"doc_id": 3, "text": f"{b2} {b3}"},   # batch 1: both cross-batch dups
        {"doc_id": 4, "text": " ".join(f"d{i}" for i in range(10))},  # fresh
    ]

    inbox = str(tmp_path / "inbox")
    store = str(tmp_path / "store")
    out = str(tmp_path / "retention")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    fn = block_dedup_batch_fn(store, out)

    _write_json_batch(inbox, "a.json", docs[:2])
    stream = file_ingest.file_stream(spark, inbox, schema)
    file_ingest.run_ingestion(stream, fn, ckpt).awaitTermination(120)
    _write_json_batch(inbox, "b.json", docs[2:])
    stream = file_ingest.file_stream(spark, inbox, schema)
    file_ingest.run_ingestion(stream, fn, ckpt).awaitTermination(120)

    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["kept_chars"])
        for r in spark.read.parquet(out).collect()
    }
    full = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in docs], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["kept_chars"])
        for r in block_dedup_retention(full, "doc_id", "text").collect()
    }
    assert got == want
    assert got[2] == (2, 1, len(b3))  # within-batch dup dropped b1
    assert got[3] == (2, 0, 0)        # fully screened by the store

    # retry the last batch: its own ingest_batch=1 hashes are in the
    # store, but the exclusion makes the re-run reproduce batch output
    batch1 = full.filter(F.col("doc_id").isin(3, 4)).localCheckpoint()
    fn(batch1, 1)
    retry = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["kept_chars"])
        for r in spark.read.parquet(out).collect()
    }
    assert retry == want

    # VERDICT r6 item 2: the PERSISTENT store key must be 128-bit
    # (16-byte binary md5), not xxhash64 — a 64-bit key has an
    # expected birthday collision at C4-scale block counts and would
    # silently drop a never-ingested block.
    store_df = spark.read.parquet(str(tmp_path / "store" / "blocks"))
    assert dict(store_df.dtypes)["block_hash"] == "binary"
    key_lens = {r[0] for r in store_df.select(F.length("block_hash")).collect()}
    assert key_lens == {16}, key_lens


def test_legacy_block_store_is_refused_with_actionable_error(spark, tmp_path):
    """r7 code review: a store written by the pre-r7 64-bit key scheme
    must fail FAST with rebuild instructions — not an AnalysisException
    in the semi-join, and never a mixed-type append."""
    import pytest as _pytest

    from pythondataingestionprocess_spark.streaming.dedup_ingest import (
        append_blocks_to_store,
        block_screen_batch,
    )

    store = tmp_path / "store"
    legacy = spark.createDataFrame([(123456789,)], "block_hash long")
    legacy.write.parquet(str(store / "blocks"))

    batch = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))], "doc_id long, text string"
    )
    with _pytest.raises(RuntimeError, match="legacy block store"):
        block_screen_batch(spark, batch, str(store))
    with _pytest.raises(RuntimeError, match="legacy block store"):
        append_blocks_to_store(batch, str(store))


def test_half_written_first_store_does_not_wedge_screen(spark, tmp_path):
    """r10 review (third pass): a crash DURING the very first store
    write leaves only the committer's _temporary dir — bare-existence
    gating then wedges every retry on an unreadable parquet path. The
    committed-part probe must treat it as 'no store yet' (within-batch
    screening only) and the subsequent retry must complete normally."""
    import os as _os

    from pythondataingestionprocess_spark.streaming import dedup_ingest as di2

    store = str(tmp_path / "store")
    for sub in ("buckets", "shingles"):
        _os.makedirs(_os.path.join(store, sub, "ingest_batch=0", "_temporary", "0"))
        with open(
            _os.path.join(store, sub, "ingest_batch=0", "_temporary", "0", "x"),
            "wb",
        ) as f:
            f.write(b"partial")
    text = " ".join(f"tok{i}" for i in range(12))
    batch = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    pairs = di2.screen_batch(spark, batch, store).collect()  # must not raise
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    # the retry then lands committed state and later batches see it
    di2.append_to_store(batch, store, batch_id=0)
    assert di2._store_has_committed(spark, _os.path.join(store, "buckets"))
    cross = di2.screen_batch(
        spark,
        spark.createDataFrame([(3, text)], "doc_id long, text string"),
        store,
    ).collect()
    assert {(r["id_a"], r["id_b"], r["kind"]) for r in cross} >= {
        (3, 1, "cross"), (3, 2, "cross"),
    }


@pytest.mark.slow
def test_streaming_embedding_dedup_matches_incremental_operator(spark, tmp_path):
    """The embedding twin of the minhash ingest pipeline: two
    micro-batches of vectors through a real file stream; the persisted
    pair output must carry exactly the planted within-batch and
    cross-batch duplicates, the cross side must equal the batch
    incremental operator over the same split, and a manual RETRY of
    the last batch (after its store append landed) must reproduce
    identical pairs — the self-screen exclusion at work."""
    import numpy as np

    from pythondataingestionprocess_spark.operators.dedup import (
        cosine_near_dup_pairs_incremental,
    )
    from pythondataingestionprocess_spark.streaming.embedding_ingest import (
        embedding_dedup_batch_fn,
    )

    rng = np.random.default_rng(11)
    vecs = [[float(x) for x in rng.standard_normal(64)] for _ in range(10)]
    b0 = [{"vec_id": i, "embedding": vecs[i]} for i in range(8)]
    b1 = [
        {"vec_id": 102, "embedding": vecs[2]},      # cross dup of 2
        {"vec_id": 200, "embedding": vecs[9]},      # fresh
        {"vec_id": 201, "embedding": vecs[9]},      # within dup of 200
    ]

    inbox = str(tmp_path / "inbox")
    store = str(tmp_path / "store")
    out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    schema = "vec_id long, embedding array<float>"
    fn = embedding_dedup_batch_fn(store, out)

    _write_json_batch(inbox, "a.json", b0)
    stream = file_ingest.file_stream(spark, inbox, schema)
    file_ingest.run_ingestion(stream, fn, ckpt).awaitTermination(120)
    _write_json_batch(inbox, "b.json", b1)
    stream = file_ingest.file_stream(spark, inbox, schema)
    file_ingest.run_ingestion(stream, fn, ckpt).awaitTermination(120)

    got = {
        (r["id_a"], r["id_b"], r["kind"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(102, 2, "cross"), (200, 201, "within")}

    # cross face equals the batch incremental operator over the split
    corpus = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in b0], schema
    )
    new = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in b1], schema
    )
    incr = {
        (r["new_id"], r["corpus_id"])
        for r in cosine_near_dup_pairs_incremental(
            corpus, new, "vec_id", "embedding"
        ).collect()
    }
    assert incr == {(a, b) for a, b, k in got if k == "cross"}

    # retry batch 1: its vectors are already in the store; the screen's
    # own-id exclusion must keep the output identical
    batch1 = new.localCheckpoint()
    fn(batch1, 1)
    retry = {
        (r["id_a"], r["id_b"], r["kind"])
        for r in spark.read.parquet(out).collect()
    }
    assert retry == got


@pytest.mark.slow
def test_compact_store_preserves_screen_results(spark, tmp_path):
    """Store maintenance: after folding the per-batch ingest subdirs
    into one consolidated layout, a later batch screens IDENTICALLY
    (same cross pairs) and the file count shrinks."""
    from pythondataingestionprocess_spark.streaming import dedup_ingest as di

    store = str(tmp_path / "store")
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one two three four five six seven eight"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
    ]
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(docs[:1], schema)
    b1 = spark.createDataFrame(docs[1:2], schema)
    di.append_to_store(b0, store, batch_id=0)
    di.append_to_store(b1, store, batch_id=1)

    probe = spark.createDataFrame(docs[2:], schema)
    before = {
        (r["id_a"], r["id_b"], r["kind"])
        for r in di.screen_batch(spark, probe, store).collect()
    }
    assert before == {(3, 1, "cross")}

    stats = di.compact_store(spark, store)
    assert set(stats) == {"buckets", "shingles"}
    for table, (n_before, n_after) in stats.items():
        assert n_after <= n_before, table

    after = {
        (r["id_a"], r["id_b"], r["kind"])
        for r in di.screen_batch(spark, probe, store).collect()
    }
    assert after == before

    # the stream continues: a post-compaction append composes normally
    di.append_to_store(probe, store, batch_id=2)
    fresh = spark.createDataFrame(
        [(9, "one two three four five six seven eight")], schema
    )
    final = {
        (r["id_a"], r["id_b"])
        for r in di.screen_batch(spark, fresh, store).collect()
    }
    assert final == {(9, 2)}


def test_streaming_screen_caps_megabucket_expansion(spark, tmp_path):
    """A duplicate-heavy store bucket (the expected input of a dedup
    pipeline) must expand to at most bucket_cap candidates per new
    doc — min-id anchoring, identical to the batch incremental
    operators — while the duplicate is still detected."""
    from pythondataingestionprocess_spark.streaming import dedup_ingest as di

    clone_text = "exact same boilerplate page body repeated verbatim again"
    corpus = spark.createDataFrame(
        [(i, clone_text) for i in range(300)], "doc_id long, text string"
    )
    di.append_to_store(corpus, str(tmp_path / "store"), batch_id=0)

    probe = spark.createDataFrame(
        [(9000, clone_text)], "doc_id long, text string"
    )
    pairs = di.screen_batch(
        spark, probe, str(tmp_path / "store"), bucket_cap=4
    ).filter("kind = 'cross'")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # capped to the 4 min-id anchors of the mega-bucket — dup found,
    # expansion bounded
    assert got == {(9000, i) for i in range(4)}


def test_streaming_screen_capped_set_equals_incremental_operator(spark, tmp_path):
    """The docstring claim pinned: under an ACTIVE cap, the streaming
    screen's cross pairs equal minhash_lsh_pairs_incremental's with
    the same bucket_cap — the min-id ranking runs over the same
    per-bucket membership on both paths."""
    from pythondataingestionprocess_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )
    from pythondataingestionprocess_spark.streaming import dedup_ingest as di

    clone = "exact same boilerplate page body repeated verbatim again"
    corpus_rows = [(i, clone) for i in range(50)] + [
        (100 + i, " ".join(f"u{100 + i}w{j}" for j in range(30)))
        for i in range(20)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    di.append_to_store(corpus, str(tmp_path / "store"), batch_id=0)

    probe_rows = [(9000, clone), (9001, corpus_rows[-1][1])]
    probe = spark.createDataFrame(probe_rows, "doc_id long, text string")

    stream_cross = {
        (r["id_a"], r["id_b"])
        for r in di.screen_batch(
            spark, probe, str(tmp_path / "store"), bucket_cap=7
        ).filter("kind = 'cross'").collect()
    }
    operator = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_lsh_pairs_incremental(
            corpus, probe, "doc_id", "text", bucket_cap=7
        ).collect()
    }
    assert stream_cross == operator
    # the cap actually bit: clone cluster is 50 wide, kept 7
    assert len([p for p in stream_cross if p[0] == 9000]) == 7


def test_embedding_store_dim_mismatch_fails_loudly(spark, tmp_path):
    """Second r7 review: a store built at one dimension must REFUSE a
    differently-dimensioned screen/append with a clear error — the
    silent alternative was meaningless buckets and null-padded
    cosines reporting zero duplicates forever."""
    import numpy as np
    import pytest as _pytest

    from pythondataingestionprocess_spark.streaming import embedding_ingest as ei

    rng = np.random.default_rng(5)
    store = str(tmp_path / "store")
    b32 = spark.createDataFrame(
        [(1, [float(x) for x in rng.standard_normal(32)])],
        "vec_id long, embedding array<float>",
    )
    ei.append_to_store(b32, store, batch_id=0, dim=32)

    b64 = spark.createDataFrame(
        [(2, [float(x) for x in rng.standard_normal(64)])],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="built with dim=32"):
        ei.append_to_store(b64, store, batch_id=1, dim=64)
    with _pytest.raises(ValueError, match="built with dim=32"):
        ei.screen_batch(spark, b64, store, dim=64)
    # a mixed-dimension batch is caught by the min/max check
    mixed = spark.createDataFrame(
        [(3, [1.0] * 32), (4, [1.0] * 16)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="dimensions"):
        ei._check_dim(mixed, "embedding", 32)
    # r7 ADVICE: min/max(size) skip NULLs — a null embedding row must
    # raise the same clear error, not the opaque in-UDF NPE
    with_null = spark.createDataFrame(
        [(5, [1.0] * 32), (6, None)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="NULL"):
        ei._check_dim(with_null, "embedding", 32)


def test_compact_store_folds_leftover_siblings(spark, tmp_path):
    """Second r7 review (the heal-defeat data-loss path): leftovers
    are INPUTS — a mid-swap crash leaving history only in __old (or
    __next) while the stream recreates a thin live table must fold
    ALL copies together on the next compact_store run, never delete
    them."""
    from pythondataingestionprocess_spark.streaming import dedup_ingest as di

    store = str(tmp_path / "store")
    old_docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    di.append_to_store(old_docs, store, batch_id=0)

    # simulate the crash: live buckets/shingles renamed aside to
    # __old, live table then recreated by a post-crash batch
    import os
    import shutil

    for table in ("buckets", "shingles"):
        shutil.move(os.path.join(store, table), os.path.join(store, table + "__old"))
    new_docs = spark.createDataFrame(
        [(2, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    di.append_to_store(new_docs, store, batch_id=1)

    di.compact_store(spark, store)

    # BOTH histories must screen: dups of doc 1 (pre-crash) and doc 2
    probe = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),
         (11, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in di.screen_batch(spark, probe, store)
        .filter("kind = 'cross'").collect()
    }
    assert got == {(10, 1), (11, 2)}


def test_compact_store_recovers_orphaned_building_dir(spark, tmp_path):
    """The __building staging dir is a compaction INPUT too: when a
    crash left the only complete copy there (stale __next deleted,
    promotion not reached) and the live table was recreated thin, the
    next run must fold it back."""
    import os
    import shutil

    from pythondataingestionprocess_spark.streaming import dedup_ingest as di

    store = str(tmp_path / "store")
    old_docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    di.append_to_store(old_docs, store, batch_id=0)
    # simulate: history moved into __building (as the crash leaves it),
    # live table recreated by a later batch
    for table in ("buckets", "shingles"):
        shutil.move(
            os.path.join(store, table), os.path.join(store, table + "__building")
        )
    di.append_to_store(
        spark.createDataFrame(
            [(2, "one two three four five six seven eight")],
            "doc_id long, text string",
        ),
        store,
        batch_id=1,
    )
    di.compact_store(spark, store)
    probe = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),
         (11, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in di.screen_batch(spark, probe, store)
        .filter("kind = 'cross'").collect()
    }
    assert got == {(10, 1), (11, 2)}


def test_compact_store_folds_multiple_staging_leftovers(spark, tmp_path):
    """r7 ADVICE (medium): the consolidated copy must be durably
    written BEFORE any staging leftover is deleted, so staging now
    goes to a fresh uuid-suffixed __building_<id> name and EVERY
    __building* leftover (legacy unsuffixed and suffixed alike) is a
    compaction input. Two leftovers holding disjoint history halves
    must both fold back, and no __building* dir may survive the run."""
    import glob
    import os
    import shutil

    from pythondataingestionprocess_spark.streaming import dedup_ingest as di

    store = str(tmp_path / "store")
    di.append_to_store(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        ),
        store,
        batch_id=0,
    )
    # first crash leftover: legacy unsuffixed __building name
    for table in ("buckets", "shingles"):
        shutil.move(
            os.path.join(store, table), os.path.join(store, table + "__building")
        )
    di.append_to_store(
        spark.createDataFrame(
            [(2, "one two three four five six seven eight")],
            "doc_id long, text string",
        ),
        store,
        batch_id=1,
    )
    # second crash leftover: uuid-suffixed staging name
    for table in ("buckets", "shingles"):
        shutil.move(
            os.path.join(store, table),
            os.path.join(store, table + "__building_deadbeef"),
        )
    di.append_to_store(
        spark.createDataFrame(
            [(3, "nine ten eleven twelve thirteen fourteen fifteen sixteen")],
            "doc_id long, text string",
        ),
        store,
        batch_id=2,
    )

    di.compact_store(spark, store)

    assert not glob.glob(os.path.join(store, "*__building*"))
    probe = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),
         (11, "one two three four five six seven eight"),
         (12, "nine ten eleven twelve thirteen fourteen fifteen sixteen")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in di.screen_batch(spark, probe, store)
        .filter("kind = 'cross'").collect()
    }
    assert got == {(10, 1), (11, 2), (12, 3)}


def test_compact_store_skips_debris_only_staging_dir(spark, tmp_path):
    """A staging dir killed mid-write may hold only _temporary debris
    (zero complete parquet files): compaction must skip it — not fail
    schema inference — while still folding the real sources."""
    import os

    from pythondataingestionprocess_spark.streaming import dedup_ingest as di

    store = str(tmp_path / "store")
    di.append_to_store(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        ),
        store,
        batch_id=0,
    )
    debris = os.path.join(store, "buckets__building_0badc0de", "_temporary")
    os.makedirs(debris)
    with open(os.path.join(debris, "part-0000.parquet.crc"), "w") as f:
        f.write("junk")

    di.compact_store(spark, store)

    probe = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in di.screen_batch(spark, probe, store)
        .filter("kind = 'cross'").collect()
    }
    assert got == {(10, 1)}


# ---- r13 streaming review regression pins ---------------------------


def test_scd2_enrich_open_ended_null_valid_to(spark):
    """r13 review: an OPEN current version (valid_to IS NULL — the
    standard SCD2 convention) must enrich every event at/after its
    valid_from; the bare `ts < valid_to` residual was NULL there and
    silently dropped the match."""
    from pythondataingestionprocess_spark.streaming.joins import (
        enrich_with_scd2_dim,
    )

    events = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:03:00"), (2, 1, "2024-01-01 00:00:30"),
         (3, 2, "2024-01-01 00:05:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    versions = spark.createDataFrame(
        [(1, "bronze", "2024-01-01 00:00:00", "2024-01-01 00:02:00"),
         (1, "gold", "2024-01-01 00:02:00", None),   # OPEN current row
         (2, "silver", "2024-01-01 00:01:00", None)],
        "user_id long, tier string, valid_from string, valid_to string",
    ).select(
        "user_id", "tier",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    got = {
        r["event_id"]: r["tier"]
        for r in enrich_with_scd2_dim(events, versions, "user_id", "ts")
        .select("event_id", "tier").collect()
    }
    assert got == {1: "gold", 2: "bronze", 3: "silver"}


def test_compact_store_heals_under_glob_metachar_store_dir(spark, tmp_path):
    """r13 review: __building leftovers are found by LISTING the
    parent dir — a Hadoop glob built from a store path containing
    metacharacters ('run[2026]') would throw or silently match
    nothing, orphaning the only complete history copy after the traced
    crash sequence."""
    import shutil

    from pythondataingestionprocess_spark.streaming import dedup_ingest as di

    store = str(tmp_path / "run[2026]" / "store")
    old_docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    di.append_to_store(old_docs, store, batch_id=0)
    for table in ("buckets", "shingles"):
        shutil.move(
            os.path.join(store, table),
            os.path.join(store, table + "__building_deadbeef"),
        )
    new_docs = spark.createDataFrame(
        [(2, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    di.append_to_store(new_docs, store, batch_id=1)

    di.compact_store(spark, store)

    probe = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),
         (11, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in di.screen_batch(spark, probe, store)
        .filter("kind = 'cross'").collect()
    }
    assert got == {(10, 1), (11, 2)}


def test_stateful_running_totals_late_batch_keeps_last_ts(spark, tmp_path):
    """r13 review: last_ts is RUNNING state — a later micro-batch
    carrying only EARLIER (late) events must not move the emitted
    last-event-ts backward while the counters move forward."""
    import time as _time

    pytest.importorskip("pandas")
    from pythondataingestionprocess_spark.streaming.stateful import (
        running_user_totals,
    )

    inbox = str(tmp_path / "inbox")
    _write_json_batch(inbox, "a.json", _rows(10, 2, user=7))  # :10, :11
    _time.sleep(1.1)  # FileStreamSource orders batches by mtime
    _write_json_batch(inbox, "b.json", _rows(0, 1, user=7))   # LATE :00

    stream = file_ingest.file_stream(
        spark, inbox, EVENTS_SCHEMA, max_files_per_trigger=1
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("state_late_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM state_late_test ORDER BY n_events"
    ).collect()
    final = rows[-1]
    assert final["n_events"] == 3
    # the late-only batch must keep the running max (:11), not :00
    assert final["last_ts"].minute == 11


def test_progress_logger_rejects_object_store_scheme(spark, tmp_path):
    """r13 review: ProgressFileLogger writes through the LOCAL
    filesystem — an s3:// log_dir used to silently create a local
    directory named 's3:/...' and lose every event; now it refuses
    loudly. file:// is accepted (and stripped)."""
    from pythondataingestionprocess_spark.streaming.monitoring import (
        ProgressFileLogger,
    )

    with pytest.raises(ValueError, match="local filesystem"):
        ProgressFileLogger("s3://bucket/streamlogs")
    local = ProgressFileLogger(f"file://{tmp_path}/logs")
    assert os.path.isdir(f"{tmp_path}/logs")
    assert local.log_dir == f"{tmp_path}/logs"


def test_funnel_update_vectorized_matches_loop_reference():
    """r16 (r15 VERDICT item 6): the ffill/mask formulation that
    replaced the per-row iterrows scan must emit the identical
    conversion rows AND leave identical state for random streams —
    including the carry-in case where the state's view postdates early
    batch rows. The reference loop below is the retired
    implementation, kept verbatim as the semantic pin."""
    import random

    import pandas as pd

    from pythondataingestionprocess_spark.streaming.stateful import _funnel_update

    def loop_reference(pdf, last_view):
        window = pd.Timedelta(minutes=30)
        out = []
        for _, row in pdf.iterrows():
            if row["event_type"] == "view":
                last_view = row["ts"]
            elif (
                row["event_type"] == "purchase"
                and last_view is not None
                and row["ts"] >= last_view
                and row["ts"] - last_view <= window
            ):
                out.append((last_view, row["ts"], row["value"]))
        return out, last_view

    rng = random.Random(420)
    base = pd.Timestamp("2024-03-01 12:00:00")
    for trial in range(40):
        n = rng.randrange(1, 60)
        rows = [
            {
                "user_id": 7,
                "event_id": i,
                "ts": base + pd.Timedelta(minutes=rng.randrange(0, 120)),
                "event_type": rng.choice(["view", "purchase", "click"]),
                "value": float(i),
            }
            for i in range(n)
        ]
        carry = (
            None
            if rng.random() < 0.3
            else base + pd.Timedelta(minutes=rng.randrange(-40, 90))
        )
        pdf = pd.DataFrame(rows).sort_values(
            ["ts", "event_id"], kind="stable"
        )
        want, want_state = loop_reference(pdf, carry)
        st = _StubState((carry,) if carry is not None else None)
        got_frames = list(
            _funnel_update((7,), iter([pd.DataFrame(rows)]), st)
        )
        got = [
            (r.view_ts, r.purchase_ts, r.value)
            for f in got_frames
            for r in f.itertuples()
        ]
        assert got == want, trial
        assert st._v == (want_state,), trial


def test_funnel_update_adversarial_fixed_fixtures():
    """r16 VERDICT item 7: the two self-review edge families as FIXED
    fixtures (the randomized pin above may or may not draw them):
    (a) a carried view that POSTDATES early batch rows must not
    convert purchases that happened before it, while still anchoring
    later ones — including a purchase exactly AT the carry ts (>=)
    and exactly at the 30-min window edge (<=); (b) equal-ts
    view/purchase ties resolve by event_id under the stable
    (ts, event_id) sort — purchase AFTER the view converts at zero
    delay, purchase BEFORE it anchors to the carry instead."""
    import pandas as pd

    from pythondataingestionprocess_spark.streaming.stateful import _funnel_update

    t = lambda m: pd.Timestamp("2024-03-01 12:00:00") + pd.Timedelta(minutes=m)

    def run(rows, carry):
        st = _StubState((carry,) if carry is not None else None)
        frames = list(_funnel_update((7,), iter([pd.DataFrame(rows)]), st))
        got = [
            (r.view_ts, r.purchase_ts)
            for f in frames
            for r in f.itertuples()
        ]
        return got, st._v[0]

    def ev(i, m, kind):
        return {
            "user_id": 7, "event_id": i, "ts": t(m),
            "event_type": kind, "value": float(i),
        }

    # (a) carry-in postdating early rows: carry at 12:50
    rows = [
        ev(0, 10, "purchase"),   # predates the carried view -> no
        ev(1, 50, "purchase"),   # ts == carry exactly -> converts (>=)
        ev(2, 80, "purchase"),   # 30 min after carry exactly -> converts (<=)
        ev(3, 81, "purchase"),   # 31 min after carry -> outside window
        ev(4, 90, "view"),
        ev(5, 95, "purchase"),   # converts vs the in-batch view
    ]
    got, state = run(rows, carry=t(50))
    assert got == [(t(50), t(50)), (t(50), t(80)), (t(90), t(95))]
    assert state == t(90)  # the in-batch view replaced the carry

    # (b) equal-ts ties: event_id orders the tie under the stable sort
    rows = [
        ev(0, 60, "purchase"),   # same ts as the view, SMALLER id ->
                                 # sorts first -> anchors to carry 12:00
                                 # (60 min back: outside the window)
        ev(1, 60, "view"),
        ev(2, 60, "purchase"),   # same ts, LARGER id -> zero-delay hit
    ]
    got, state = run(rows, carry=t(0))
    assert got == [(t(60), t(60))]
    assert state == t(60)

    # same tie with a FRESH carry: the pre-view purchase now converts
    # against the carry, the post-view one against the view
    got, state = run(rows, carry=t(40))
    assert got == [(t(40), t(60)), (t(60), t(60))]
    assert state == t(60)

    # no carry, purchase-only batch: nothing emitted, state stays None
    got, state = run([ev(0, 5, "purchase"), ev(1, 6, "click")], carry=None)
    assert got == [] and state is None
