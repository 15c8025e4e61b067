"""Scaling probe for the time-series feature family (measure, don't
guess): generate a deterministic synthetic event series at two sizes
and time subsequence_match / decayed_feature / resample_interpolate /
the next-event window, so the family has the same empirical scaling
evidence as the dedup family (BASELINE.md).

All three operators are one-per-key-shuffle window pipelines, so wall
time should track input size ~linearly while the key count fixes the
parallelism grain; resample additionally depends on keys × span-hours
(the grid), which this generator holds constant by keeping the time
span fixed as rows grow (denser series, same grid).

Usage: python scripts/timeseries_scaling.py [rows ...]  (default 1M 2M)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pythondataingestionprocess_spark.operators.timeseries import (  # noqa: E402
    decayed_feature,
    resample_interpolate_hourly,
    subsequence_match,
)
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

SPAN_S = 30 * 24 * 3600  # 30 days, fixed across sizes
KEYS = 2000

sizes = [int(x) for x in sys.argv[1:]] or [1_000_000, 2_000_000]
spark = get_spark()


def gen(n: int):
    """Deterministic synthetic series: n rows, KEYS users, fixed span."""
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % KEYS).alias("user_id"),
            F.timestamp_seconds(
                F.unix_timestamp(base)
                + (F.xxhash64("id") % SPAN_S + SPAN_S) % SPAN_S
            ).alias("ts"),
            (F.sin(F.col("id").cast("double") / 97.0) * 50.0).alias("value"),
        )
    )
    df = df.repartition(32).localCheckpoint()  # materialize input off the clock
    df.count()
    return df


def run(ev, label):
    out = {"rows": label, "keys": KEYS}
    t0 = time.time()
    subsequence_match(ev, [1.0, 3.0, 2.0, 5.0, 4.0], k=10).collect()
    out["subsequence_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    decayed_feature(ev).agg(F.sum("decayed")).collect()
    out["decayed_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    resample_interpolate_hourly(ev).agg(F.sum("value")).collect()
    out["resample_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    (
        ev.withColumn("event_type", (F.col("event_id") % 5).cast("string"))
        .select(
            F.col("event_type").alias("label"),
            F.collect_list("event_type")
            .over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(-3, -1)
            )
            .alias("_ctx"),
        )
        .filter(F.size("_ctx") == 3)
        .groupBy(F.array_join("_ctx", ">").alias("context"), "label")
        .count()
        .collect()
    )
    out["next_event_s"] = round(time.time() - t0, 2)
    return out


# Untimed warm-up at a small size first: the first execution of each
# pipeline pays JIT/codegen/broadcast warm-up that would otherwise be
# misattributed to the smallest measured size.
run(gen(100_000), 0)
for n in sizes:
    print(json.dumps(run(gen(n), n)))
