"""Streaming embedding near-dup screening against a persistent
hyperplane-bucket store — the vector twin of ``dedup_ingest``'s
minhash pipeline (engine-added; completes the daily-ingest dedup
architecture across both modalities a training-data pipeline dedups
on: text shingles and embedding vectors).

Each micro-batch of incoming vectors is:

1. screened WITHIN the batch (``cosine_near_dup_pairs`` on the batch
   alone);
2. screened AGAINST EVERYTHING PREVIOUSLY INGESTED via a
   (table, bucket) equi-join with the store — corpus×corpus work is
   never repeated, so the marginal cost of a batch stays proportional
   to the batch;
3. appended to the store (its bucket membership + its raw vectors),
   making it "corpus" for every later batch.

The store is two parquet tables under one root:

- ``vec_buckets/`` (id, table, bucket) — hyperplane-LSH membership
  rows the cross-batch candidate join probes;
- ``vectors/``     (id, embedding) — the verify-side representation
  (exact cosine without re-reading the source).

Scale/failure semantics are IDENTICAL to dedup_ingest (see its module
docstring): bucket the ``vec_buckets`` table BY (table, bucket) on a
metastore for a co-located candidate join; foreachBatch retries are
idempotent via ``ingest_batch=N`` overwrite subdirs; the batch's own
ids are anti-joined out of the store side so a crash after the store
append cannot screen a batch against itself; the store's vector
payloads are semi-pruned to candidate ids before the verify join so
payload movement is bounded by the batch, not the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.operators import dedup as dd
from pythondataingestionprocess_spark.operators.similarity import (
    hyperplane_bucket_rows,
)
from pythondataingestionprocess_spark.streaming.dedup_ingest import (
    _glob_escape,
    _store_has_committed,
    capped_store_candidates,
)

_DIM = 64
_BITS = 12
_TABLES = 8
_SEED = 7


def _store_paths(store_dir: str) -> tuple[str, str]:
    return os.path.join(store_dir, "vec_buckets"), os.path.join(store_dir, "vectors")


def _banded(df: DataFrame, id_col: str, vec_col: str, dim: int) -> DataFrame:
    # the ONE shared bucket construction (operators/similarity.py) —
    # the store and every probe must hash identically to the batch
    # operators or LSH recall silently diverges (r13 review)
    return hyperplane_bucket_rows(
        df, id_col, vec_col,
        dim=dim, bits_per_table=_BITS, n_tables=_TABLES, seed=_SEED,
    )


def _check_dim(batch_df: DataFrame, vec_col: str, dim: int) -> None:
    """Fail FAST with a clear message on a dimension mismatch instead
    of an opaque numpy shape error inside the pandas UDF (r7 review).
    One tiny aggregate over an already-checkpointed batch; min AND max
    so a single corrupt row inside an otherwise-clean batch is caught
    too (first-row sniffing was not enough — second r7 review). NULL
    vectors are counted separately: min/max skip NULLs, so a null
    embedding row would pass the size check and still blow up with
    the opaque shape/NPE inside the pandas UDF (r7 ADVICE)."""
    row = batch_df.select(
        F.min(F.size(F.col(vec_col))).alias("lo"),
        F.max(F.size(F.col(vec_col))).alias("hi"),
        F.count(F.when(F.col(vec_col).isNull(), 1)).alias("nulls"),
    ).first()
    if row is None:
        return  # empty batch
    if row["nulls"]:
        raise ValueError(
            f"{row['nulls']} row(s) have a NULL {vec_col}; drop or "
            f"impute them before ingest — the store cannot hash a "
            f"missing embedding"
        )
    if row["lo"] is None:
        return  # empty batch
    if row["lo"] != dim or row["hi"] != dim:
        raise ValueError(
            f"embedding dimensions [{row['lo']}, {row['hi']}] != store "
            f"dimension {dim}; pass dim= matching your model to the "
            f"ingest factory"
        )


def _store_dim(spark: SparkSession, store_dir: str) -> int | None:
    """The store's persisted dimension marker (None when the store is
    new). Without this, redeploying with a different model/dim would
    hash meaningless buckets and null-pad every verify cosine —
    silently reporting ZERO cross duplicates forever (second r7
    review); with it, the mismatch is one clear error."""
    meta = os.path.join(store_dir, "meta")
    if not _store_has_committed(spark, meta):
        return None
    return int(spark.read.parquet(_glob_escape(meta)).first()["dim"])


def _write_store_dim(spark: SparkSession, store_dir: str, dim: int) -> None:
    spark.createDataFrame([(int(dim),)], "dim int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(store_dir, "meta"))


def screen_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    dim: int = _DIM,
    bucket_cap: int = 1000,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs for one incoming vector batch: within-batch
    pairs plus cross pairs against the store (empty or half-written
    store → within-batch only — a crash between the two
    append_to_store writes must not wedge retries on the missing
    vectors table). Returns (id_a, id_b, cos, kind) with ``kind``
    'within' or 'cross'; for cross pairs id_a is the NEW vector. Does
    NOT mutate the store — append via :func:`append_to_store` after
    consuming the result. Cross candidates are per-bucket capped
    exactly like the batch operators (shared
    :func:`dedup_ingest.capped_store_candidates` — within a probed
    bucket the matched store subset IS the full bucket membership, so
    the kept set equals ``cosine_near_dup_pairs_incremental``'s)."""
    from pythondataingestionprocess_spark.functions.vectors import cosine

    buckets_path, vectors_path = _store_paths(store_dir)
    stored = _store_dim(spark, store_dir)
    if stored is not None and stored != dim:
        raise ValueError(
            f"store at {store_dir} was built with dim={stored}; "
            f"got dim={dim} — buckets would be meaningless"
        )
    if banded is None:
        banded = _banded(batch_df, id_col, vec_col, dim)
    within = dd.cosine_near_dup_pairs(
        batch_df, id_col, vec_col,
        threshold=threshold, dim=dim, bits_per_table=_BITS,
        n_tables=_TABLES, seed=_SEED,
        # the SAME cap as the cross-store probe: leaving the operator
        # default here made the tuning knob apply to only half the
        # screen (r13 review)
        bucket_cap=bucket_cap,
        # one hyperplane matmul per batch, shared with the cross probe
        # and the store append (r13 review)
        banded=banded,
    ).withColumn("kind", F.lit("within"))
    if not (_store_has_committed(spark, buckets_path)
            and _store_has_committed(spark, vectors_path)):
        return within  # first batch (or its crashed first write)
    new_banded = banded
    batch_ids = batch_df.select(F.col(id_col).alias("id_b")).distinct()
    store_buckets = spark.read.parquet(_glob_escape(buckets_path)).select(
        id_col, "table", "bucket"
    )
    candidates = capped_store_candidates(
        store_buckets, new_banded, batch_ids,
        ["table", "bucket"], id_col, bucket_cap,
    ).localCheckpoint(eager=True)  # probed twice below (reuse != CSE)
    va = batch_df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    cand_ids = candidates.select("id_b").distinct()
    vb = (
        spark.read.parquet(_glob_escape(vectors_path))
        .select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        .join(cand_ids, "id_b", "left_semi")
    )
    cross = (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", cosine("va", "vb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("kind", F.lit("cross"))
    )
    return within.unionByName(cross)


def append_to_store(
    batch_df: DataFrame,
    store_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
    dim: int = _DIM,
    banded: DataFrame | None = None,
) -> None:
    """Append this batch's bucket membership and vectors to the store.
    Same idempotency contract as dedup_ingest.append_to_store: with
    ``batch_id`` each batch owns an ``ingest_batch=N`` overwrite
    subdir. ``banded`` reuses a precomputed bucket frame (see
    screen_batch)."""
    buckets_path, vectors_path = _store_paths(store_dir)
    spark = batch_df.sparkSession
    stored = _store_dim(spark, store_dir)
    if stored is None:
        _write_store_dim(spark, store_dir, dim)
    elif stored != dim:
        raise ValueError(
            f"store at {store_dir} was built with dim={stored}; "
            f"got dim={dim} — buckets would be meaningless"
        )
    buckets = banded if banded is not None else _banded(
        batch_df, id_col, vec_col, dim
    )
    vectors = batch_df.select(id_col, vec_col)
    if batch_id is None:
        buckets.write.mode("append").parquet(buckets_path)
        vectors.write.mode("append").parquet(vectors_path)
    else:
        sub = f"ingest_batch={batch_id}"
        buckets.write.mode("overwrite").parquet(os.path.join(buckets_path, sub))
        vectors.write.mode("overwrite").parquet(os.path.join(vectors_path, sub))


def embedding_dedup_batch_fn(
    store_dir: str,
    pairs_out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    dim: int = _DIM,
    bucket_cap: int = 1000,
):
    """foreachBatch factory: screen → write pairs (idempotent
    per-batch subdir) → append bucket membership + vectors. Note the
    screen here does NOT need the batch-id store exclusion: the
    batch's own ids are anti-joined out of the store side inside
    screen_batch, which covers the crashed-append retry case.
    ``dim`` must match the embedding model; every batch is checked
    up-front (min AND max vector size) with a clear error, and the
    store persists its dimension so a redeploy with a different model
    fails loudly instead of silently finding zero duplicates."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # read the source once
        _check_dim(batch_df, vec_col, dim)
        # ONE hyperplane matmul per batch (the vector path's dominant
        # cost), threaded through within-screen, cross probe, and the
        # store append — it used to run three times per micro-batch
        # (r13 review); bucket rows are batch-proportional (n_tables
        # rows per vector), so eager materialization is bounded
        banded = _banded(batch_df, id_col, vec_col, dim).localCheckpoint(
            eager=True
        )
        pairs = screen_batch(
            spark, batch_df, store_dir, id_col, vec_col, threshold, dim=dim,
            bucket_cap=bucket_cap, banded=banded,
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_out_dir, f"batch_id={batch_id}")
        )
        append_to_store(
            batch_df, store_dir, id_col, vec_col, batch_id=batch_id, dim=dim,
            banded=banded,
        )

    return fn
