"""Custom stateful streaming operator (SURVEY.md §2.9 tail).

The reference's one genuinely stateful computation is the cross-row
forward-fill (import_files_to_postgre.py:148-153) — in batch we do it
with a window (operators/window-wave), but a long-lived stream needs
explicit keyed state: ``applyInPandasWithState`` with one state slot
per key holding the last seen non-null value / running counters.

This module implements a per-user running aggregate (count + sum +
last-event-ts) as the canonical state demo; the same skeleton carries
any per-key running state (LOCF, running dedup sets, rate limiting).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, sum_value double, last_ts timestamp"
_STATE_SCHEMA = "n long, s double"


def _update_running(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, s))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": s, "last_ts": last_ts}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals with explicit keyed state. On a
    streaming DataFrame each micro-batch emits the updated totals per
    user seen in that batch; state never expires (NoTimeout) — a real
    deployment at 100 TB keys state by a bounded-cardinality entity
    and/or uses ProcessingTimeTimeout to shed idle keys."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
