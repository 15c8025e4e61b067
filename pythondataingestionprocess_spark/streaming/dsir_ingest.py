"""Streaming DSIR curation — score every arriving micro-batch against
a FIXED target distribution and the EVOLVING raw-corpus distribution,
routing target-like documents onward (engine-added; the published
batch method is operators/dsir.py, Xie et al. arXiv:2302.03169; this
is its ingest-time face, same store discipline as dedup_ingest.py).

State under one root:

- ``target/``  (bucket, c) — the target corpus bucket counts, written
  ONCE at bootstrap (``init_target_state``) from the curated slice;
  m rows, never touched again.
- ``raw/ingest_batch=N/`` (bucket, c) — one mergeable count state per
  ingested batch (operators/dsir.bucket_counts — an integer monoid,
  so the fold over subdirs is exact, no float-order caveat).

Per micro-batch (``dsir_batch_fn``):

1. featurize the batch (map-side);
2. read the raw states of all PRIOR batches (``ingest_batch != N`` —
   a crashed retry's own partial write must not count itself twice),
   fold them with this batch's counts → the raw distribution over
   everything seen so far INCLUDING this batch (scores converge to
   the full-corpus DSIR weights as the stream drains);
3. score the batch (the m log-ratios collapse to a literal array —
   zero-shuffle scoring, m-row driver state, the method's contract);
4. write ``(id, n_feats, logw, selected)`` to
   ``scores/batch_id=N`` with overwrite (idempotent on retry), and
5. write this batch's count state to ``raw/ingest_batch=N`` with
   overwrite (same idempotence).

At 100 TB the raw state is m rows PER BATCH (kilobytes) — compaction
is a trivial re-sum; the documents themselves never ride the state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.operators import dsir
from pythondataingestionprocess_spark.streaming.dedup_ingest import (
    _glob_escape,
)


def _paths(store_dir: str) -> tuple[str, str]:
    return os.path.join(store_dir, "target"), os.path.join(store_dir, "raw")


def init_target_state(
    target_docs: DataFrame,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = 1024,
) -> None:
    """Fit the fixed target bucket counts once, at bootstrap."""
    target_path, _ = _paths(store_dir)
    dsir.bucket_counts(
        dsir.featurize(target_docs, id_col, text_col, m=m)
    ).write.mode("overwrite").parquet(target_path)


def _raw_state_excluding(
    spark: SparkSession, raw_path: str, batch_id: int
) -> DataFrame | None:
    """Fold of all prior batches' count states, excluding the current
    batch's own subdir (retry-proofing: a crash AFTER the state write
    but BEFORE the commit re-runs the batch — its earlier partial
    write must not make the batch count itself twice).

    First-batch detection probes for COMMITTED state (part files under
    an ingest_batch subdir), not a broad except and not bare directory
    existence: a broad except silently scores against the wrong
    distribution on any FS error, while an existence-only probe
    deadlocks the first batch forever — a crash mid-write leaves
    ``raw/`` holding only the committer's ``_temporary`` dir, which
    exists but cannot be read as parquet (r10 review, both passes).
    A genuine corrupt/unreadable COMMITTED subdir still raises. The
    probe is the shared ``dedup_ingest._store_has_committed`` (listing
    not globbing — glob metacharacters in the store path must not
    silently read as 'first batch'; third review pass)."""
    from pythondataingestionprocess_spark.streaming.dedup_ingest import (
        _store_has_committed,
    )

    if not _store_has_committed(spark, raw_path):
        return None  # first batch: no committed raw state yet
    # the READ path is glob-expanded by Spark (escape it); basePath is
    # a literal prefix for partition discovery and must stay raw
    prior = spark.read.option("basePath", raw_path).parquet(
        _glob_escape(raw_path)
    )
    prior = prior.filter(F.col("ingest_batch") != batch_id).select("bucket", "c")
    return prior.groupBy("bucket").agg(F.sum("c").alias("c"))


def score_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = 1024,
    batch_id: int = 0,
    threshold: float = 0.0,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(scores, batch_counts)``: per-doc
    ``(id, n_feats, logw, selected)`` against target vs all-seen-so-far
    (prior batches + this one), and this batch's mergeable count state
    (for the caller to persist). Docs with NULL/whitespace-only text
    have no features and no score row — route them through a
    quarantine screen upstream (file_ingest.quarantine_malformed) if
    they must be accounted for."""
    target_path, raw_path = _paths(store_dir)
    bucketed = dsir.featurize(batch_df, id_col, text_col, m=m).localCheckpoint(
        eager=True
    )
    batch_counts = dsir.bucket_counts(bucketed)
    prior = _raw_state_excluding(spark, raw_path, batch_id)
    raw_counts = (
        batch_counts
        if prior is None
        else dsir.merge_bucket_counts(prior, batch_counts)
    )
    target_counts = spark.read.parquet(_glob_escape(target_path))
    ratio = dsir.log_ratio_vector(
        dsir.log_dist_from_counts(target_counts, m=m),
        dsir.log_dist_from_counts(raw_counts, m=m),
        m=m,
    )
    scores = dsir.dsir_logweights(bucketed, ratio, id_col=id_col).withColumn(
        "selected", F.col("logw") >= F.lit(float(threshold))
    )
    return scores, batch_counts


def dsir_batch_fn(
    store_dir: str,
    scores_out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = 1024,
    threshold: float = 0.0,
):
    """foreachBatch factory: score → write scores (idempotent per-batch
    subdir) → persist this batch's count state. Wire it with
    file_ingest.file_stream + run_ingestion, after ``init_target_state``
    has been run once against the curated target corpus."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # read the source once
        scores, batch_counts = score_batch(
            spark, batch_df, store_dir, id_col, text_col,
            m=m, batch_id=batch_id, threshold=threshold,
        )
        scores.write.mode("overwrite").parquet(
            os.path.join(scores_out_dir, f"batch_id={batch_id}")
        )
        _, raw_path = _paths(store_dir)
        batch_counts.write.mode("overwrite").parquet(
            os.path.join(raw_path, f"ingest_batch={batch_id}")
        )

    return fn
