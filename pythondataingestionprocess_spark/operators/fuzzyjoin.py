"""Scalable fuzzy (edit-distance) self-join via symmetric-delete
blocking — the string-similarity member of the candidate-then-verify
family (MinHash bands for sets, hyperplanes for vectors, 16-bit chunks
for simhash, delete-neighborhoods for strings; all four share
``bucket_candidate_pairs`` and its bucket cap).

Soundness (SymSpell / Garbe's symmetric delete): if
levenshtein(a, b) ≤ k then the depth-k delete-neighborhoods of a and b
intersect — a substitution is a same-position delete on both sides, an
insert/delete is a delete on one side. So bucketing every string on its
delete-neighborhood strings and pairing within buckets finds EVERY pair
within distance k; exact levenshtein verification then removes the
false candidates. No O(n²) anywhere: candidate volume is bounded by
bucket sizes (neighborhood strings are near-unique for natural text).

Cost model at 100 TB: depth 1 explodes each string into L+1 bucket rows
(L = string length) — a ~30× row amplification of the KEY column only
(ids + short strings, never payloads), shuffled once. Depth-2 squares
the neighborhood; prefer restricting k=2 joins to a blocked subset
(e.g. same length band) or q-gram prefix filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.operators.dedup import bucket_candidate_pairs


def delete_neighborhood(col: str, text_expr: str | None = None) -> F.Column:
    """array<string>: the string plus every single-character deletion
    (depth-1 neighborhood), as a pure SQL expression (codegen, no UDF).
    """
    e = text_expr or col
    return F.expr(
        f"array_union(array({e}), "
        f"transform(sequence(1, length({e})), "
        f"i -> concat(substr({e}, 1, i - 1), substr({e}, i + 1, length({e})))))"
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    bucket_cap: int = 1000,
) -> DataFrame:
    """Pairs (id_a < id_b, edit_dist ≤ max_dist) over ``df``.

    max_dist=1 is exact-complete via depth-1 symmetric deletes (see
    module docstring). max_dist=2 with depth-1 blocking is a RECALL
    TRADE (pairs needing two same-side edits in distinct positions can
    miss); callers needing exact k=2 should explode depth-2.
    """
    banded = df.select(
        F.col(id_col), F.explode(delete_neighborhood(text_col)).alias("bucket")
    )
    candidates = bucket_candidate_pairs(banded, id_col, ("bucket",), bucket_cap)
    texts = df.select(F.col(id_col), F.col(text_col))
    ta = texts.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    tb = texts.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    return (
        candidates.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("edit_dist", F.levenshtein("_ta", "_tb"))
        .filter(F.col("edit_dist") <= max_dist)
        .select("id_a", "id_b", "edit_dist")
    )
