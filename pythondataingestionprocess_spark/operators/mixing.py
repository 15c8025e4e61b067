"""Corpus mixing: deterministic per-source up/down-sampling to hit
target mixture rates — the "data recipe" step of a pretraining pipeline
(e.g. 0.5× web crawl, 2.3× books) run as one pass over the corpus.

Design for 100 TB:

- No randomness: a rate r = k + f (integer + fraction) maps every doc
  to ``k`` copies plus one extra when ``doc_id % 10 < 10·f`` — an id
  stride, reproducible across runs/engines and free of RNG state. For
  finer grain swap the stride for ``pmod(xxhash64(id), 1000)``.
- Up-sampling is ``explode(array_repeat(...))`` — row amplification
  happens AFTER filters/projections, map-side, no shuffle at all;
  down-sampling is a plain filter (pushdown-friendly).
- ``copy_idx`` disambiguates replicas so downstream shuffles spread
  them (a training dataloader shards on (doc_id, copy_idx)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def n_copies_expr(rate_int: Column, rate_tenths: Column, id_col: Column) -> Column:
    """Copies for a doc under rate = rate_int + rate_tenths/10."""
    extra = F.when(F.pmod(id_col, F.lit(10)) < rate_tenths, 1).otherwise(0)
    return (rate_int + extra).cast("int")


def resample(
    df: DataFrame,
    id_col: str,
    rate_int: Column,
    rate_tenths: Column,
) -> DataFrame:
    """Replicate/drop rows to match the per-row rate; adds ``copy_idx``
    (0-based). Rows with 0 copies disappear (down-sampling)."""
    n = n_copies_expr(rate_int, rate_tenths, F.col(id_col))
    return (
        df.withColumn("_n", n)
        .select("*", F.posexplode(F.array_repeat(F.lit(1), F.col("_n"))).alias("copy_idx", "_one"))
        .drop("_n", "_one")
    )
