"""Kafka source/sink factories (API surface; no broker in this
container — integration-gated, config documented).

The streaming window/join/state operators in this package are
source-agnostic DataFrame transforms; these factories produce the
standard Kafka-shaped frames they compose with. Requires the
spark-sql-kafka package on the cluster classpath
(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream from Kafka → (key, value bytes, topic, partition,
    offset, timestamp). ``maxOffsetsPerTrigger`` is the batch-size
    governor — size it so a micro-batch's shuffle fits executor memory."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()


def parse_json_events(raw: DataFrame, schema: str) -> DataFrame:
    """Kafka value bytes → typed event columns (PERMISSIVE: bad
    payloads yield NULL columns rather than failing the stream —
    the reference's row-level fault isolation, SURVEY §3)."""
    return raw.select(
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), schema).alias("e"),
    ).select("kafka_ts", "e.*")


def kafka_sink(df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str):
    """writeStream back to Kafka; payload = JSON of all columns."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
