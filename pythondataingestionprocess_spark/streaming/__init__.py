"""Structured Streaming surface (SURVEY.md §2.9).

The reference has no streaming engine; its streaming-shaped behaviors
(directory polling, file archiving, per-file transactions, dedup vs
history) map here onto file-source streams, ``foreachBatch`` with
dead-letter routing, checkpoints, and watermark-bounded state. The
event-time window operators (tumbling / sliding / session) are the
engine-added surface over the ``events`` table.

Window logic lives in :mod:`.windows` as plain DataFrame transforms so
the SAME code runs in batch (driver-oracle-checked) and behind
``readStream`` (integration-tested with availableNow triggers).
"""

from pythondataingestionprocess_spark.streaming import windows  # noqa: F401
