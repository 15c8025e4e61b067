"""Stream-stream interval join (SURVEY.md §2.9 depth — no reference
counterpart).

``clicks_then_errors`` pairs each error with the same user's clicks in
the preceding ``window_minutes`` — the classic attribution join. The
SAME join expression runs:

- **batch**: a plain time-interval join (oracle-checked vs DuckDB
  inequality join in plans/streaming_queries.py);
- **streaming**: both sides watermarked; the time-range condition lets
  Spark bound each side's state (clicks older than the window +
  watermark are dropped) — without the range bound a stream-stream
  join would buffer forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    broadcast: bool = True,
) -> DataFrame:
    """Stream-STATIC enrichment join: every micro-batch probes the
    batch-side dimension table — the streaming face of the engine's
    broadcast-dim star joins (catalog pre-load, S10), e.g. a live
    event feed stamped with its user's segment before a windowed
    rollup.

    LEFT join so stream rows never block on dim lag (a user created
    milliseconds ago enriches as NULL now rather than vanishing);
    stateless on the stream side — unlike stream-stream joins nothing
    buffers, so watermarks are not required for the join itself.

    Scale shape: with ``broadcast`` (default) the dim ships to
    executors once per micro-batch and the probe is map-side — no
    shuffle of the stream. That is the right plan while the dim fits
    the broadcast budget (dims here are the catalog tables); for a
    huge dim, pass ``broadcast=False`` and pre-bucket both sides on
    the key so the per-batch shuffle is co-located."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, "left")


def clicks_then_errors(
    clicks: DataFrame,
    errors: DataFrame,
    window_minutes: int = 10,
    watermark: str = "1 hour",
) -> DataFrame:
    """(error_id, user_id, error_ts, click_id, click_ts) for every
    click within [error_ts - window, error_ts], inner join."""
    # distinct column names on each side — both frames may derive from
    # the SAME source (batch self-join), where qualified refs are
    # ambiguous
    c = clicks.select(
        F.col("user_id").alias("click_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    e = errors.select(
        F.col("user_id"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if e.isStreaming:
        e = e.withWatermark("error_ts", watermark)
    cond = (
        (F.col("click_user_id") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("error_ts"))
        & (
            F.col("click_ts")
            >= F.col("error_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    return c.join(e, cond).select(
        "user_id", "error_id", "error_ts", "click_id", "click_ts"
    )


def enrich_with_scd2_dim(
    stream: DataFrame,
    versions: DataFrame,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    broadcast: bool = True,
) -> DataFrame:
    """Event-time-correct dimension enrichment: each stream row joins
    the SCD2 version whose [valid_from, valid_to) window contains the
    row's EVENT time — not whatever version is current when the batch
    happens to run. Late-arriving events therefore enrich against the
    historically correct attributes; replays are deterministic. The
    batch twin is `pit_scd2_price_join` (plans/asof_queries.py), whose
    scale note applies verbatim: the join is an EQUI join on the
    natural key with the validity window as a residual predicate —
    never a bare BETWEEN join.

    Stateless on the stream side (each micro-batch probes the version
    table), so no watermark is needed for the join itself. LEFT join:
    an event before its key's first version (or for an unknown key)
    flows through with NULL attributes rather than vanishing.

    Scale: with ``broadcast`` the version table ships once per
    micro-batch and the probe is map-side. SCD2 tables are
    |keys|×|versions| — usually broadcastable for catalog dims; for a
    huge one, pass ``broadcast=False`` and pre-bucket both sides on
    the key.

    Both sides are explicitly aliased: a version table DERIVED FROM
    the probe's own source (the batch face builds its dim from the
    same events relation) would otherwise resolve ``stream[key] ==
    versions[key]`` to one attribute — a trivially-true predicate and
    an ambiguous drop (r8, found registering events_scd2_enrich)."""
    s = stream.alias("__scd2_stream")
    d0 = versions.alias("__scd2_dim")
    d = F.broadcast(d0) if broadcast else d0
    # an OPEN current version (valid_to IS NULL — the standard SCD2
    # convention alongside far-future sentinels) must match every
    # event at/after its valid_from; a bare `ts < valid_to` is NULL
    # there and the residual silently drops the match (r13 review).
    # IS NULL OR < is type-agnostic (timestamp/date/epoch-numeric
    # version tables alike — a cast sentinel would NULL out on
    # numerics and reintroduce the bug).
    cond = (
        (F.col(f"__scd2_stream.{key}") == F.col(f"__scd2_dim.{key}"))
        & (F.col(f"__scd2_stream.{ts_col}") >= F.col(f"__scd2_dim.{valid_from}"))
        & (
            F.col(f"__scd2_dim.{valid_to}").isNull()
            | (F.col(f"__scd2_stream.{ts_col}") < F.col(f"__scd2_dim.{valid_to}"))
        )
    )
    return (
        s.join(d, cond, "left")
        .drop(F.col(f"__scd2_dim.{key}"))
        .drop(F.col(f"__scd2_dim.{valid_from}"))
        .drop(F.col(f"__scd2_dim.{valid_to}"))
    )
