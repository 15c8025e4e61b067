"""Multi-stage dedup / ANN queries (the expensive tail of the LLM-ops
surface). Registered LAST in ``plans.__init__`` so a driver-side run-time
budget truncates here — on the queries with the deepest pytest evidence —
rather than on the cheap, otherwise-unverified surface (VERDICT r1 item 1).

Semantics and scale design live in ``operators/dedup.py``,
``operators/similarity.py`` and ``operators/ivf.py``; this module only
declares the driver-facing query + oracle pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.operators import dedup as dd
from pythondataingestionprocess_spark.operators import similarity as sim
from pythondataingestionprocess_spark.plans.registry import query

# ------------------------------------------------------- near-dup (jaccard)

_SHINGLE_SQL = """
  SELECT DISTINCT doc_id,
    unnest(list_transform(list_zip(w, w[2:], w[3:]),
           z -> z[1] || ' ' || z[2] || ' ' || z[3])[:greatest(len(w)-2,0)]) AS g
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
"""

_JACCARD_ORACLE = f"""
WITH sh AS ({_SHINGLE_SQL}),
sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id id_a, b.doc_id id_b, COUNT(*) inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter * 1.0 / (s1.n + s2.n - inter) AS jaccard
FROM pairs
JOIN sizes s1 ON id_a = s1.doc_id
JOIN sizes s2 ON id_b = s2.doc_id
WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.5
"""


@query("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE, tags=("dedup",))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard near-dup pairs (threshold 0.5; the
    corpus' seeded near-dups sit ≥0.8, background <0.3)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingle_sets(docs, "doc_id", "text", 3)
    return dd.jaccard_pairs(sh, "doc_id", 0.5)


# The LSH pair stage is the registry's single most expensive plan and
# two queries need its output (the pair list itself, and the connected-
# components grouping built on top of it). Memoize the persisted
# DataFrame per (session, sf_dir) so a full registry sweep — the
# driver's CORRECTNESS pass runs every query in one session — pays for
# signature+bucket+verify exactly once. Keyed on session identity, not
# id(), so a restarted session can never alias a dead entry. BOUNDED
# to one live entry with eviction, same as graph_queries._EDGE_MEMO
# (r7 ADVICE there; r13 review found this twin never got the
# back-port — a long-lived driver cycling sessions/sf_dirs accreted
# cached blocks and pinned dead sessions against GC).
_PAIR_MEMO: list[tuple[SparkSession, str, tuple[DataFrame, ...]]] = []

# The session's ONE tokenize+shingle pass over the documents table
# (r18): the full-corpus shingle-array table is the warehouse
# artifact every MinHash-family face derives from — the batch pair
# screen (signatures + both verify sides) AND the incremental face's
# corpus index (a doc-grain filter of the same table). One memo,
# same session-identity keying and one-entry eviction as _PAIR_MEMO.
_DOC_SH_MEMO: list[tuple[SparkSession, str, DataFrame]] = []


def _doc_sh_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    for sess, cached_dir, df in _DOC_SH_MEMO:
        if sess is spark and cached_dir == sf_dir:
            return df
    for _sess, _cached_dir, df in _DOC_SH_MEMO:
        try:
            df.unpersist()
        except Exception:
            pass  # a stopped session can't (and needn't) unpersist
    _DOC_SH_MEMO.clear()
    docs = load_table(spark, sf_dir, "documents")
    doc_sh = dd.shingle_array_table(docs, "doc_id", "text", 3).persist()
    _DOC_SH_MEMO.append((spark, sf_dir, doc_sh))
    return doc_sh


def _lsh_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    for sess, cached_dir, frames in _PAIR_MEMO:
        if sess is spark and cached_dir == sf_dir:
            return frames[0]
    for _sess, _cached_dir, frames in _PAIR_MEMO:
        for df in frames:
            try:
                df.unpersist()
            except Exception:
                pass  # a stopped session can't (and needn't) unpersist
    _PAIR_MEMO.clear()
    docs = load_table(spark, sf_dir, "documents")
    # One tokenize+shingle pass, not three (r18): the shared
    # shingle-array table feeds BOTH verify-side joins and, via
    # banded_from_shingle_arrays, the signature stage — Spark
    # recomputes common subtrees per reference, so without the persist
    # the text-processing pipeline ran once under the banded subtree
    # and once per verify join side. persist() keeps lineage
    # recomputable; the table itself rides _DOC_SH_MEMO so the
    # incremental face's corpus index shares the same pass.
    doc_sh = _doc_sh_cached(spark, sf_dir)
    banded = dd.banded_from_shingle_arrays(
        doc_sh, "doc_id", num_hashes=64, bands=16, seed=42
    )
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, banded=banded, doc_sh=doc_sh
    ).persist()
    _PAIR_MEMO.append((spark, sf_dir, (pairs,)))
    return pairs


@query("dedup_minhash_lsh", oracle=_JACCARD_ORACLE, tags=("dedup", "lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (64 hashes, 16 bands × 4) with
    exact-Jaccard verification of candidates — oracle is the *exact*
    pair list. ORACLE-CONTRACT BOUND (r13 review): the equivalence
    holds because LSH recall at the registered corpora's similarity
    profile is effectively 1 — every planted pair sits at j >= 0.90,
    where the per-pair miss probability (1-j^4)^16 <= 4e-8, so ~1e2
    pairs all surface. At 100 TB (~1e6+ near-dup pairs, some near the
    0.8 floor where misses run ~2e-4) the operator is what it says on
    the tin — a probabilistic candidate GENERATOR with recall < 1 —
    and the exact oracle would catch real misses; production dedup at
    that scale accepts the recall trade by design (the groups/keep-one
    consumers downstream inherit it). The scale path: candidate
    generation is a band-bucket join, never O(n²)."""
    return _lsh_pairs_cached(spark, sf_dir)


# Full replay of the simhash pipeline in SQL: md5-basis per-token bit
# votes (the portable basis simhash_table uses — two 32-bit halves keep
# every value positive in signed BIGINT, so bit arithmetic never fights
# sign extension), fingerprint assembly, 16-bit chunk buckets, and the
# hamming filter via bit_count(xor) on each half.
_SIMHASH_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
), h AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS th_hi,
         ('0x' || substr(md5(tok), 9, 8))::BIGINT AS th_lo
  FROM tok
), votes AS (
  SELECT doc_id, i,
         SUM(CASE WHEN ((th_lo >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v_lo,
         SUM(CASE WHEN ((th_hi >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v_hi
  FROM h, (SELECT unnest(range(0, 32)) AS i)
  GROUP BY doc_id, i
), fp AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v_hi > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS hi,
         CAST(SUM(CASE WHEN v_lo > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS lo
  FROM votes GROUP BY doc_id
), chunks AS (
  SELECT doc_id, hi, lo,
         unnest([lo & 65535, (lo >> 16) & 65535, hi & 65535, (hi >> 16) & 65535]) AS chunk,
         unnest([0, 1, 2, 3]) AS chunk_idx
  FROM fp
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b)) AS BIGINT)
         AS hamming
FROM cand
WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b)) <= 12
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE, tags=("dedup", "simhash"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs (hamming ≤ 12 via 16-bit chunk
    buckets). Promoted from rows-only to a full oracle in r4: the
    fingerprint basis is now the first/second 32 bits of md5(token)
    (portable — xxhash64 has no DuckDB twin) held as two 32-bit halves,
    so DuckDB replays the ENTIRE pipeline — per-token bit votes, sign
    assembly, chunk buckets, hamming-via-bit_count(xor) — and the
    candidate semantics (bucket recall included) are checked exactly,
    not just the distance math."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_pairs(docs, "doc_id", "text", max_hamming=12)


# ------------------------------------------------------- embedding near-dup

# r17 (VERDICT r16 item 2): the oracle replays the ENTIRE capped LSH
# pipeline — integer-Rademacher bucket assignment (bit-exact in any
# engine; operators/similarity.py module comment), per-bucket cap 64
# with anchor-star overflow (the bucket_candidate_pairs contract),
# pair dedup, exact-cosine verify. The candidate bound is therefore
# ENFORCED AND HASH-CHECKED, not trusted recall-neutral — the fuzzy
# r16 pattern. A separate pytest certificate keeps the recall story
# honest (capped output == the exact O(n²) scan on the planted-dup
# corpus at sf0.001/sf0.01).
_COSINE_CAP = 64
_COSINE_TABLES = 8
_COSINE_SEED = 7
_COSINE_MASKS = sim.rademacher_masks(_COSINE_TABLES, 30, _COSINE_SEED)

_COSINE_DUP_ORACLE = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000000000, embedding FROM embeddings WHERE vec_id % 10 = 0
), nb AS (
  SELECT GREATEST(12, LEAST(30, CAST(CEILING(LOG2(COUNT(*))) AS INTEGER) + 9)) AS nbits
  FROM corpus
), q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
  FROM corpus
), masks(t, j, m) AS (
  VALUES {sim.rademacher_masks_sql_values(_COSINE_MASKS)}
), dots AS (
  SELECT q.vec_id, masks.t, masks.j,
         list_sum(list_transform(range(1, 65),
           i -> qv[i] * (CASE WHEN ((m >> (i - 1)) & 1) = 1 THEN 1 ELSE -1 END))) AS dot
  FROM q, masks, nb
  WHERE masks.j < nb.nbits
), buckets AS (
  SELECT vec_id, t,
         CAST(SUM(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << j)
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, t
), sized AS (
  SELECT vec_id, t, bucket,
         COUNT(*) OVER (PARTITION BY t, bucket) AS bsz,
         MIN(vec_id) OVER (PARTITION BY t, bucket) AS anchor
  FROM buckets
), cand AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM sized a JOIN sized b
      ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE a.bsz > 1 AND a.bsz <= {_COSINE_CAP}
    UNION ALL
    SELECT anchor AS id_a, vec_id AS id_b
    FROM sized WHERE bsz > {_COSINE_CAP} AND vec_id <> anchor
  )
), v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM corpus
)
SELECT c.id_a, c.id_b,
  list_sum(list_transform(list_zip(a.e, b.e), z -> z[1] * z[2]))
    / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
       * sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS cos
FROM cand c JOIN v a ON a.vec_id = c.id_a JOIN v b ON b.vec_id = c.id_b
WHERE list_sum(list_transform(list_zip(a.e, b.e), z -> z[1] * z[2]))
    / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
       * sqrt(list_sum(list_transform(b.e, x -> x * x)))) >= 0.99
"""


# Sizing-count memo for the cosine face — table statistics, not result
# caching (the catalog-memo rationale): the auto-bits rule needs ONE
# scalar, the corpus row count, which is fully determined by the
# immutable embeddings table; re-running the count job on every
# invocation is a per-query profiling pass an engine would serve from
# stats. Session-identity keyed like every other memo.
_COSINE_N_MEMO: list[tuple[SparkSession, str, int]] = []


def _cosine_corpus_count(spark: SparkSession, sf_dir: str, corpus: DataFrame) -> int:
    for sess, cached_dir, n in _COSINE_N_MEMO:
        if sess is spark and cached_dir == sf_dir:
            return n
    n = corpus.count()
    _COSINE_N_MEMO.append((spark, sf_dir, n))
    if len(_COSINE_N_MEMO) > 8:
        del _COSINE_N_MEMO[0]
    return n


@query("dedup_embedding_cosine", oracle=_COSINE_DUP_ORACLE, tags=("dedup", "similarity"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup over a corpus with planted duplicate
    vectors — the one-shot batch face, r17 basis: replayable
    integer-Rademacher LSH + per-bucket candidate cap 64, with the
    DuckDB oracle replaying the FULL capped pipeline (bucket
    assignment is bit-exact cross-engine: quantized int dots, md5
    masks — operators/similarity.py). The output contract is the
    capped pipeline's pair set; on this corpus it coincides with the
    exact O(n²) scan (pytest-certified at sf0.001/sf0.01 — every
    qualifying pair is a planted exact copy at cos = 1, identical
    vectors share every bucket, and dup-bearing buckets sit far
    under the cap at auto bit depths).

    bits_per_table stays AUTO (operators/dedup.auto_lsh_bits =
    ceil(log2 n)+9 clamped [12, 30]; the oracle computes the same
    rule from COUNT(*)): candidate volume is Σ bucket² and the
    generator's Gaussian clusters re-quadraticize any fixed depth at
    the next magnitude (r15/r16 ledger). The cap is the ENFORCED
    bound the bit rule alone can't give (r16 VERDICT item 2): a
    cluster bucket beyond 64 members star-expands against its anchor
    — linear, constant row width — instead of pairing quadratically,
    the same contract as the MinHash family
    (operators/dedup.bucket_candidate_pairs). Auto bits are sound
    ONLY for one-shot batch dedup; the incremental/streaming twins
    pin their bits AND keep the Gaussian scheme (index contract)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dupes = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000000000
    )
    corpus = emb.select("vec_id", "embedding").unionAll(
        dupes.select("vec_id", "embedding")
    )
    bits = dd.auto_lsh_bits(_cosine_corpus_count(spark, sf_dir, corpus))
    banded = sim.rademacher_bucket_rows(
        corpus, "vec_id", "embedding",
        bits_per_table=bits, n_tables=_COSINE_TABLES, seed=_COSINE_SEED,
    )
    return dd.cosine_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.99,
        bits_per_table=bits, n_tables=_COSINE_TABLES, seed=_COSINE_SEED,
        bucket_cap=_COSINE_CAP, banded=banded,
    )


# ------------------------------------------------------ SemDeDup screen

# Corpus plants exact copies (groups of 2 at vec_id%10, of 3 at %20 —
# the triple exercises one-pass transitive resolution). Centroids are
# the 16 lowest-md5 BASE vectors (zero k-means iterations — the
# deterministic quantizer both engines can recompute; dedup semantics
# only need bit-identical embeddings to share a cell, which any fixed
# centroid set guarantees). Cross-engine safety: noise vectors can in
# principle argmin-flip cells on a distance ulp, but noise never
# passes the cosine threshold, and copy groups move cells TOGETHER
# (bit-identical input -> bit-identical distances within an engine),
# so the dropped set is assignment-divergence-proof by construction.
_SEMDEDUP_ORACLE = """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000000000, embedding FROM embeddings WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 2000000000000, embedding FROM embeddings WHERE vec_id % 20 = 0
), v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM corpus
), cent AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
), dist AS (
  SELECT v.vec_id, cent.cid,
         list_sum(list_transform(list_zip(v.e, cent.c),
                                 z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d,
         list_sum(list_transform(list_zip(v.e, cent.c), z -> z[1] * z[2]))
           / (sqrt(list_sum(list_transform(v.e, x -> x * x)))
              * sqrt(list_sum(list_transform(cent.c, x -> x * x)))) AS cos_c
  FROM v, cent
), assigned AS (
  SELECT vec_id, cid AS cluster, cos_c
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) rn
        FROM dist)
  WHERE rn = 1
), pairs AS (
  SELECT b.vec_id AS id_b, a.vec_id AS id_a, a.cos_c AS cos_a
  FROM assigned a
  JOIN assigned b ON a.cluster = b.cluster
   AND (a.cos_c < b.cos_c OR (a.cos_c = b.cos_c AND a.vec_id < b.vec_id))
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id
  WHERE list_sum(list_transform(list_zip(va.e, vb.e), z -> z[1] * z[2]))
      / (sqrt(list_sum(list_transform(va.e, x -> x * x)))
         * sqrt(list_sum(list_transform(vb.e, x -> x * x)))) >= 0.99
)
SELECT id_b AS vec_id,
       (SELECT p2.id_a FROM pairs p2 WHERE p2.id_b = p.id_b
        ORDER BY p2.cos_a, p2.id_a LIMIT 1) AS dup_of
FROM (SELECT DISTINCT id_b FROM pairs) p
"""


@query("dedup_semantic_semdedup", oracle=_SEMDEDUP_ORACLE, tags=("dedup", "similarity"))
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (staged NEW_R11, r10 — Abbas et al.,
    arXiv:2303.09540): cluster-scoped cosine screen with the paper's
    low-centroid-similarity keep-rule, over a corpus with planted copy
    groups of 2 and 3. ``(vec_id, dup_of)`` per dropped member; the
    triple pins one-pass transitive resolution (both later copies name
    the base). Spark side (operators/semdedup.py): assignment is a
    pure column expression (array_min over literal struct(dist, cid,
    cos) candidates — no join/UDF/shuffle, codegen end to end), then
    ONE cluster-grain self-join bounds the quadratic to cluster size —
    never all-pairs; at paper scale k grows with the corpus and the
    assigner swaps to the Arrow GEMM kernel (``assigner="gemm"``,
    operators/semdedup._assign_gemm_udf — same struct(c, cos)
    contract; ivf._assign_udf lacks the cos_c keep-rank output). The
    oracle replays everything relationally — md5 centroid pick,
    argmin-(d, cid) assignment, keep-rank dominance, min-rank dup_of —
    on explicit sequential double folds (functions/vectors.py parity
    note)."""
    from pythondataingestionprocess_spark.operators import semdedup as sd

    emb = load_table(spark, sf_dir, "embeddings")
    copies2 = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000000000
    )
    copies3 = emb.filter(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 2000000000000
    )
    corpus = (
        emb.select("vec_id", "embedding")
        .unionAll(copies2.select("vec_id", "embedding"))
        .unionAll(copies3.select("vec_id", "embedding"))
    )
    cents = sd.md5_centroids(emb, k=16)
    return sd.semdedup_dropped(corpus, cents, threshold=0.99)


# ----------------------------------------------------------- approximate NN


@query("embedding_ann_lsh", oracle=None, tags=("similarity", "lsh"))
def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH buckets (4 tables ×
    6 bits, fixed seed). Rows-only: approximate recall is the point —
    compared against the brute-force baseline in tests instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ann_lsh(emb, emb.filter(F.col("vec_id") < 10), k=5)


_ANN_COS = (
    "list_sum(list_transform(list_zip({q}, {c}), "
    "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({q}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform({c}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


# Full relational replay of the IVF SEARCH pipeline (r15 VERDICT
# item 5 — the embedding_ann_recall pattern applied to the IVF
# family): the coarse quantizer is kmeans_fit at max_iter=0, i.e. the
# 16 lowest-md5(vec_id) corpus vectors in md5 order — engine-portable
# DATA, not float GEMM output — so DuckDB independently re-executes
# every search step: squared-L2 list assignment (|c|² - 2 x·c argmin,
# ties to the lowest list id, numpy argmin's rule), n_probe=4 probe
# ranking, the probed-list candidate join, the self filter, exact
# cosine, and the (cos DESC, neighbor_id) top-5. Parity class is the
# documented ann_recall one: numpy computes the distances in one
# float64 GEMM, DuckDB folds sequentially — ~1-ulp divergence flips an
# argmin only when two distances collide within ulps (~1e-15/compare).
_ANN_IVF_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
cent AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
           AS list_id, e
  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16
),
dist AS (
  SELECT v.vec_id, c.list_id,
         list_sum(list_transform(c.e, x -> x * x))
           - 2 * list_sum(list_transform(list_zip(v.e, c.e),
                          z -> z[1] * z[2])) AS d
  FROM v CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d, list_id) AS rn
    FROM dist
  ) t WHERE rn = 1
),
probe AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d, list_id) AS rn
    FROM dist WHERE vec_id < 10
  ) t WHERE rn <= 4
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN assigned a ON a.list_id = p.list_id
  WHERE a.vec_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id, {_ANN_COS.format(q="vq.e", c="vn.e")} AS cos
  FROM cand c
  JOIN v vq ON vq.vec_id = c.query_id
  JOIN v vn ON vn.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rnk
  FROM scored
) t WHERE rnk <= 5
"""


@query("embedding_ann_ivf", oracle=_ANN_IVF_ORACLE, tags=("similarity", "ivf"))
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (16 inverted lists, probe 4) for the same
    10 query vectors as the brute/LSH paths. Promoted from rows-only
    to a FULL oracle in r16 (r15 VERDICT item 5): the driver corpus'
    embeddings are structureless noise, where a k-means-trained
    quantizer and the deterministic md5-seeded one (kmeans_fit at
    max_iter=0 — the real operator init path) give the same MECHANICS,
    so the face certifies exactly what is certifiable here — list
    assignment, probe ranking, probed-list scan, self filter, cosine
    top-k ordering — via a complete DuckDB replay (_ANN_IVF_ORACLE).
    The Lloyd-iteration training path keeps its evidence in pytest on
    CLUSTERED corpora (test_pq.py::test_ivfadc_composition*,
    test_llm_operators IVF recall), where training actually moves
    recall."""
    from pythondataingestionprocess_spark.operators import ivf

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = ivf.kmeans_fit(emb, k=16, max_iter=0)
    return ivf.ivf_search(
        emb, emb.filter(F.col("vec_id") < 10), centroids, k=5, n_probe=4
    )


# Full relational replay of the PQ encode + ADC search pipeline (r15
# VERDICT item 5, the _ANN_IVF_ORACLE pattern): codebooks are pq_fit
# at max_iter=0 — the 16 lowest-md5(vec_id) corpus vectors,
# full-vector L2-normalized, sliced into 8 subspaces — portable data,
# not GEMM output. DuckDB then re-executes encoding (per-subspace
# |c|²-2x·c argmin, ties to the lowest code, numpy's rule), the
# per-query ADC lookup tables ((q-c)² form, exactly as
# _adc_scores_udf builds them), the lookup-sum scoring, and the
# (dist ASC, vec_id ASC) top-5. The raw adc_dist is NOT exposed:
# numpy sums the 8 partials pairwise while SQL SUM folds in engine
# order, a 1-ulp class that would false-negative the hash on values
# while the RANKING (gaps ~1e-2 on this corpus vs ~1e-16 ulps) is
# stable — the output contract is (q_id, vec_id, rank).
_ANN_PQ_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
nrm AS (
  SELECT vec_id,
         CASE WHEN sqrt(list_sum(list_transform(e, x -> x * x))) = 0
              THEN 1.0
              ELSE sqrt(list_sum(list_transform(e, x -> x * x))) END AS nn,
         e
  FROM v
),
u AS (SELECT vec_id, list_transform(e, x -> x / nn) AS e FROM nrm),
seeds AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
           AS seed_rank, e
  FROM u ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16
),
subs AS (SELECT unnest(range(0, 8)) AS s),
cb AS (
  SELECT seed_rank AS j, s, e[s * 8 + 1 : s * 8 + 8] AS ce
  FROM seeds CROSS JOIN subs
),
vsub AS (
  SELECT vec_id, s, e[s * 8 + 1 : s * 8 + 8] AS ve
  FROM u CROSS JOIN subs
),
enc_d AS (
  SELECT vs.vec_id, vs.s, cb.j,
         list_sum(list_transform(cb.ce, x -> x * x))
           - 2 * list_sum(list_transform(list_zip(vs.ve, cb.ce),
                          z -> z[1] * z[2])) AS d
  FROM vsub vs JOIN cb ON cb.s = vs.s
),
codes AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                 ORDER BY d, j) AS rn
    FROM enc_d
  ) t WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS q_id, cb.s, cb.j,
         list_sum(list_transform(
           list_zip(q.e[cb.s * 8 + 1 : cb.s * 8 + 8], cb.ce),
           z -> (z[1] - z[2]) * (z[1] - z[2]))) AS pd
  FROM u q CROSS JOIN cb
  WHERE q.vec_id < 10
),
adc AS (
  -- ORDER BY inside the aggregate: an unordered SUM folds the 8
  -- partials in hash-arrival order PER GROUP, so rows with IDENTICAL
  -- codes can land 1 ulp apart and break the exact plateau equality
  -- the id tiebreak depends on; the s-ordered fold is also numpy's
  -- accumulation order in _adc_scores_udf
  SELECT l.q_id, c.vec_id, SUM(l.pd ORDER BY l.s) AS dist
  FROM codes c JOIN lut l ON l.s = c.s AND l.j = c.code
  GROUP BY 1, 2
)
SELECT q_id, vec_id, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY dist, vec_id) AS rnk
  FROM adc
) t WHERE rnk <= 5
"""


@query("embedding_ann_pq", oracle=_ANN_PQ_ORACLE, tags=("similarity", "pq"))
def embedding_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-5 (staged NEW_R11, r10) for the same 10
    query vectors as the brute/LSH/IVF paths: 8x8-dim subspaces, 16
    centroids each, corpus held as array<smallint> codes (~30x
    smaller at rest — BASELINE.md PQ probe), search by per-query ADC
    lookup tables with per-partition top-k. Promoted from rows-only
    to a FULL oracle in r16 (r15 VERDICT item 5, same reasoning as
    embedding_ann_ivf): on the driver corpus' structureless noise a
    Lloyd-trained codebook and the deterministic md5-seeded one
    (pq_fit at max_iter=0, the real init path) exercise identical
    MECHANICS, so the face certifies encode + LUT + ADC ranking via a
    complete DuckDB replay (_ANN_PQ_ORACLE); Lloyd training keeps its
    evidence in pytest on graded corpora (test_pq.py) where training
    moves recall. adc_dist stays internal (cross-engine summation
    order differs by ulps); the driver-hashed contract is the
    RANKING."""
    from pythondataingestionprocess_spark.operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    codebooks = pq.pq_fit(emb, m=8, ksub=16, max_iter=0)
    codes = pq.pq_encode(emb, codebooks)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return pq.pq_search(codes, queries, codebooks, k=5).select(
        "q_id", "vec_id", "rank"
    )




def _ann_recall_oracle() -> str:
    """Full relational replay of the REGISTERED LSH configuration
    (8 tables × 4 bits, dim 64, seed 7 — identical to
    ``embedding_ann_lsh``): the seeded hyperplanes are engine INPUT,
    not computation, so they ride the SQL as exact literals
    (shortest-roundtrip float repr — DuckDB parses back the identical
    double). DuckDB then independently executes every algorithmic
    step: sign-bit bucket assignment, the bucket-equality candidate
    join, candidate dedup, exact cosine, deterministic (cos DESC, id)
    top-5, and the recall join against its own brute-force top-5.

    Parity note: the Spark side computes the 32 plane dots per vector
    in one float64 GEMM (operators/similarity._buckets_udf) while the
    oracle folds each dot sequentially; the orders differ by ~1 ulp,
    which flips a sign only when |dot| is within ulps of zero —
    probability ~1e-15 per dot (~6e-11 per full sf0.01 run),
    negligible against the driver's per-round check.
    """
    from pythondataingestionprocess_spark.operators.similarity import (
        hyperplanes,
    )

    rows = []
    for t in range(8):
        for b, plane in enumerate(hyperplanes(64, 4, 7 + 101 * t)):
            lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
            rows.append(f"({t}, {b}, {lit}::DOUBLE[])")
    planes_values = ",\n".join(rows)
    cos_qc = _ANN_COS.format(q="vq.embedding", c="vn.embedding")
    return f"""
WITH planes(tbl, bit, w) AS (VALUES
{planes_values}
),
v AS (SELECT vec_id, embedding FROM embeddings),
dots AS (
  SELECT v.vec_id, p.tbl, p.bit,
         list_sum(list_transform(list_zip(v.embedding, p.w),
                  z -> CAST(z[1] AS DOUBLE) * z[2])) AS d
  FROM v CROSS JOIN planes p
),
buckets AS (
  SELECT vec_id, tbl,
         CAST(SUM(CASE WHEN d >= 0 THEN (1 << bit) ELSE 0 END) AS INT) AS bucket
  FROM dots GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM buckets qb
  JOIN buckets cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
  WHERE qb.vec_id < 10 AND cb.vec_id <> qb.vec_id
),
ann_scored AS (
  SELECT c.query_id, c.neighbor_id, {cos_qc} AS cos
  FROM cand c
  JOIN v vq ON vq.vec_id = c.query_id
  JOIN v vn ON vn.vec_id = c.neighbor_id
),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rnk
    FROM ann_scored
  ) t WHERE rnk <= 5
),
brute_scored AS (
  SELECT vq.vec_id AS query_id, vn.vec_id AS neighbor_id, {cos_qc} AS cos
  FROM v vq CROSS JOIN v vn
  WHERE vq.vec_id < 10 AND vn.vec_id <> vq.vec_id
),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rnk
    FROM brute_scored
  ) t WHERE rnk <= 5
)
SELECT b.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS recall_at_5
FROM brute b
LEFT JOIN ann a
  ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
GROUP BY b.query_id
"""


@query(
    "embedding_ann_recall",
    oracle=_ann_recall_oracle(),
    tags=("similarity", "lsh", "certificate"),
)
def embedding_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN family's oracle-checked recall certificate (staged
    NEW_R15, r14 — r13 VERDICT item 5): per query id, how many of the
    brute-force cosine top-5 the REGISTERED LSH configuration
    (``sim.ann_lsh`` defaults — the exact path ``embedding_ann_lsh``
    runs) recovers. Both sides are deterministic, so unlike the
    rows-only ANN faces this one hash-matches: the oracle replays the
    full LSH pipeline relationally with the seeded hyperplanes
    embedded as exact literals (see ``_ann_recall_oracle``),
    converting the family's weakest evidence class to hash-green
    while the raw top-k faces stay rows-only by contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    ann = sim.ann_lsh(emb, q, k=5)
    brute = sim.knn_bruteforce(emb, q, k=5)
    hits = brute.select("query_id", "neighbor_id").join(
        ann.select("query_id", "neighbor_id").withColumn("hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
    ).withColumn(
        "recall_at_5",
        F.col("n_hit").cast("double") / F.col("n_true"),
    )


# -------------------------------------------------- dedup groups (CC)

# Oracle: recursive min-label propagation over the exact-Jaccard pair
# graph (both directions), then min reachable id per vertex. DuckDB's
# recursive CTE UNION-dedups states, so the fixpoint is the transitive
# closure of label flow — the same labeling the Spark loop converges to.
_CC_ORACLE = f"""
WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, MIN(label) AS group_id
FROM reach GROUP BY id
"""


@query("dedup_groups_cc", oracle=_CC_ORACLE, tags=("dedup", "graph"))
def dedup_groups_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS, not just pairs: connected components over the
    MinHash-LSH pair graph labels every paired document with the min
    doc id reachable through any chain of near-dup pairs — the step
    that turns pair detection into corpus dedup (keep-one-per-group,
    transitive closure of A~B~C). Iterative min-label propagation,
    O(diameter) join rounds (operators/components.py); the oracle is a
    recursive CTE over the exact pair list."""
    from pythondataingestionprocess_spark.operators.components import (
        connected_components,
    )

    pairs = _lsh_pairs_cached(spark, sf_dir)
    return connected_components(pairs).withColumnRenamed("id", "doc_id")


# ------------------------------------------- incremental dedup / keep-one

_INCR_ORACLE = f"""
WITH sh AS ({_SHINGLE_SQL}),
sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, COUNT(*) inter
  FROM sh a JOIN sh b ON a.g = b.g
  WHERE a.doc_id % 7 = 3 AND b.doc_id % 7 <> 3
  GROUP BY 1, 2
)
SELECT new_id, corpus_id, inter * 1.0 / (s1.n + s2.n - inter) AS jaccard
FROM pairs
JOIN sizes s1 ON new_id = s1.doc_id
JOIN sizes s2 ON corpus_id = s2.doc_id
WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.5
"""


_COSINE_INCR_ORACLE = """
WITH corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
  FROM embeddings
), batch AS (
  SELECT vec_id + 1000000000000 AS vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) e
  FROM embeddings WHERE vec_id % 10 = 0
)
SELECT b.vec_id AS new_id, c.vec_id AS corpus_id,
  list_sum(list_transform(list_zip(b.e, c.e), z -> z[1] * z[2]))
    / (sqrt(list_sum(list_transform(b.e, x -> x * x)))
       * sqrt(list_sum(list_transform(c.e, x -> x * x)))) AS cos
FROM batch b JOIN corpus c ON true
WHERE list_sum(list_transform(list_zip(b.e, c.e), z -> z[1] * z[2]))
    / (sqrt(list_sum(list_transform(b.e, x -> x * x)))
       * sqrt(list_sum(list_transform(c.e, x -> x * x)))) >= 0.99
"""


@query("dedup_cosine_incremental", oracle=_COSINE_INCR_ORACLE, tags=("dedup", "similarity"))
def dedup_cosine_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-ingest twin of dedup_embedding_cosine (registered
    net-new at the tail of r8 WITHOUT the offsetting retirement the
    capacity rule requires — flagged in the r8 VERDICT; staged into
    the r9 driver window, capacity restored by the r9 retirements):
    near-dup pairs between a NEW embedding batch (copies of every
    vec_id ≡ 0 mod 10, re-keyed +1e6 — the corpus is near-orthogonal
    noise, so natural pairs don't exist and LSH recall at the planted
    dup end is exactly 1) and the existing corpus, via a hyperplane
    bucket equi-join of the batch's LSH membership against the
    corpus's (operators/dedup.cosine_near_dup_pairs_incremental).
    Corpus×corpus candidates are never generated — per-batch cost is
    one matmul over the batch plus a batch-sized bucket join,
    independent of corpus growth; at 100 TB the corpus bucket table is
    precomputed at index build. Oracle is the exact batch×corpus scan.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding")
    batch = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .withColumn("vec_id", F.col("vec_id") + 1000000000000)
        .select("vec_id", "embedding")
    )
    return dd.cosine_near_dup_pairs_incremental(
        corpus, batch, "vec_id", "embedding", threshold=0.99
    )


# Corpus-side LSH index for the incremental face (r18, mirroring the
# graph-chain/_PAIR_MEMO pattern): the corpus's banded signatures and
# shingle arrays are a PRECOMPUTED index at scale — built once when
# the corpus is indexed, not once per ingest batch — so the session
# builds them once and every batch screen pays only the NEW side's
# tokenize + shingle + minhash. persist() keeps lineage recomputable;
# bounded to one live entry with eviction, keyed on session identity.
_INCR_INDEX_MEMO: list[tuple[SparkSession, str, tuple[DataFrame, ...]]] = []


def _incr_corpus_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    for sess, cached_dir, frames in _INCR_INDEX_MEMO:
        if sess is spark and cached_dir == sf_dir:
            return frames[0], _doc_sh_cached(spark, sf_dir).filter(
                F.col("doc_id") % 7 != 3
            )
    for _sess, _cached_dir, frames in _INCR_INDEX_MEMO:
        for df in frames:
            try:
                df.unpersist()
            except Exception:
                pass  # a stopped session can't (and needn't) unpersist
    _INCR_INDEX_MEMO.clear()
    # the corpus's shingle arrays are a doc-grain FILTER of the
    # session's shared full-corpus shingle table (r18): filter
    # commutes with the row-wise tokenize+shingle map, so the rows
    # are identical to shingle_array_table(corpus, ...) while the
    # expensive text pass is shared with the batch pair screen
    # instead of run a second time per session. (A lone incremental
    # call in a fresh session now shingles all docs rather than 6/7
    # of them — +1/7 of one map stage, against −1 full pass whenever
    # any pairs-family face shares the session, which the bench,
    # driver sweep and any realistic warehouse session do.)
    sh = _doc_sh_cached(spark, sf_dir).filter(F.col("doc_id") % 7 != 3)
    banded = dd.banded_from_shingle_arrays(
        sh, "doc_id", num_hashes=64, bands=16, seed=42
    ).persist()
    _INCR_INDEX_MEMO.append((spark, sf_dir, (banded,)))
    return banded, sh


@query("dedup_incremental_minhash", oracle=_INCR_ORACLE, tags=("dedup", "lsh"))
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-ingest dedup shape: near-dup pairs between a NEW batch
    (doc_id ≡ 3 mod 7 stands in for today's crawl) and the existing
    corpus (the rest), via a band-bucket equi-join of the new batch's
    LSH membership against the corpus's — corpus×corpus pairs are never
    generated, so per-batch cost is linear in batch size. The corpus
    side's signature/shingle frames come from the session's
    precomputed-index memo (r18): only the new batch's signature stage
    runs per invocation, which is the marginal cost the face models.
    Oracle is the exact cross-side Jaccard pair list."""
    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 7 == 3)
    corpus = docs.filter(F.col("doc_id") % 7 != 3)
    corpus_banded, corpus_sh = _incr_corpus_index(spark, sf_dir)
    return dd.minhash_lsh_pairs_incremental(
        corpus, new_docs, "doc_id", "text", threshold=0.5,
        corpus_banded=corpus_banded, corpus_sh=corpus_sh,
    )


_KEEP_ONE_ORACLE = f"""
WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
),
grp AS (SELECT id, MIN(label) AS root FROM reach GROUP BY id),
dropped AS (SELECT id FROM grp WHERE id <> root)
SELECT d.source AS source,
       CAST(SUM(CASE WHEN dr.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN dr.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.id
GROUP BY d.source
"""


@query("dedup_keep_one", oracle=_KEEP_ONE_ORACLE, tags=("dedup", "graph"))
def dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step that actually SHRINKS the corpus: per source, how many
    documents survive keep-one-per-near-dup-group (the CC group's min
    id is the kept representative; every other member drops). Composes
    the cached LSH pair stage + connected components + one anti-join —
    the full dedup pipeline a pretraining corpus goes through, as one
    query."""
    from pythondataingestionprocess_spark.operators.components import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = _lsh_pairs_cached(spark, sf_dir)
    groups = connected_components(pairs)
    dropped = (
        groups.filter(F.col("id") != F.col("group_id"))
        .select(F.col("id").alias("doc_id"), F.lit(1).alias("_dropped"))
    )
    return (
        # join strategy left to AQE: the dropped set is tiny here but can
        # be a large fraction of the corpus at real dedup rates — a
        # forced broadcast would be wrong at 100 TB
        docs.join(dropped, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("_dropped").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("_dropped").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
        )
    )


# ------------------------------------- incremental group maintenance


@query("dedup_incremental_components", oracle=_CC_ORACLE, tags=("dedup", "graph"))
def dedup_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-group LABEL MAINTENANCE under a batch pair feed (staged
    NEW_R11, r10): the stored (id, group_id) labeling — built from
    roughly two-thirds of the LSH pair list, standing in for the
    corpus history — is folded with the remaining third as today's
    batch via operators/components.incremental_components: each batch
    endpoint CONTRACTS to its stored label (one lookup join per side),
    components are solved on the batch-sized contracted graph only,
    and one remap join updates the stored table. The oracle is the
    FULL recompute over the entire pair list (the same recursive CTE
    as dedup_groups_cc), so the driver checks the fold identity
    incremental = full — the maintenance contract itself, not just
    row shape. Per-batch cost at 100 TB: one labels-table pass +
    CC(|batch|), never O(rounds x |all edges ever|)."""
    from pythondataingestionprocess_spark.operators.components import (
        connected_components_star,
        incremental_components,
    )

    pairs = _lsh_pairs_cached(spark, sf_dir)
    batch_pred = (F.col("id_a") + F.col("id_b")) % 3 == 0
    labels = connected_components_star(pairs.filter(~batch_pred))
    updated = incremental_components(labels, pairs.filter(batch_pred))
    return updated.withColumnRenamed("id", "doc_id")


# -------------------------------------------------- pagerank (iterative)

# Weighted PageRank on the nation trade graph (customer nation →
# supplier nation, edge weight = lineitem count), 3 power iterations,
# damping 0.85. Per-edge contribution arithmetic is plain double math
# in IDENTICAL expression shape on both engines (deterministic); the
# per-node incoming SUM — the only order-sensitive op — accumulates in
# DECIMAL(25,9) per the registry's determinism convention.
_PAGERANK_EDGES = """
edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY 1),
e AS (SELECT edges.src, edges.dst, edges.w, outw.wout
      FROM edges JOIN outw USING (src))
"""

# Teleport term (1−d)/N computed from the node COUNT on both engines
# with the same IEEE double ops ((1 − 0.85) then the divide), not a
# pre-rounded literal — 0.15/25 is NOT representable exactly, so a
# hand-inlined 0.006 would diverge in the last ulp (VERDICT r2 item 6).
_PAGERANK_ITER = """
r{next} AS (
  SELECT n.n_nationkey AS id,
         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
           + 0.85 * COALESCE(
           CAST(SUM(CAST(r{prev}.rank * e.w / e.wout AS DECIMAL(25,9))) AS DOUBLE),
           0.0) AS rank
  FROM nation n CROSS JOIN nn
  LEFT JOIN e ON e.dst = n.n_nationkey
  LEFT JOIN r{prev} ON r{prev}.id = e.src
  GROUP BY 1, nn.n
)
"""

_PAGERANK_ORACLE = (
    "WITH "
    + _PAGERANK_EDGES
    + ", nn AS (SELECT COUNT(*) AS n FROM nation)"
    + ", r0 AS (SELECT n_nationkey AS id, CAST(1 AS DOUBLE) / nn.n AS rank"
    + "          FROM nation CROSS JOIN nn), "
    + ", ".join(_PAGERANK_ITER.format(prev=i, next=i + 1) for i in range(3))
    + """
SELECT n.n_name AS nation, r3.rank AS pagerank
FROM nation n JOIN r3 ON r3.id = n.n_nationkey
"""
)


@query("pagerank_nations", oracle=_PAGERANK_ORACLE, tags=("graph", "iterative"))
def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 power iterations, damping 0.85) over the
    nation trade graph — who sits at the center of the money flow. The
    iterative-numeric-fixpoint workload on an engine with no iteration
    construct: the rank frame is NODE-sized, so each round is one
    edges⋈ranks join + one decimal-accumulated incoming sum; the
    oracle is the same three iterations as chained CTEs. At a 100 TB
    edge set the per-round shape is unchanged (edges partition by src;
    ranks broadcast — node-sized) with a localCheckpoint per round to
    truncate lineage; 25 nodes here don't need it."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    e = edges.join(outw, "src")
    nodes = nation.select(F.col("n_nationkey").alias("id"), "n_name")
    # node count is the one legitimate driver-side scalar (a 25-row
    # dim); teleport (1−d)/N and the uniform init derive from it with
    # the same IEEE ops as the oracle — no pre-rounded 0.006 literal.
    n_nodes = float(nodes.count())
    teleport = (1.0 - 0.85) / n_nodes
    ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(3):
        contrib = e.join(
            ranks.select(F.col("id").alias("src"), "rank"), "src"
        ).select(
            "dst",
            (F.col("rank") * F.col("w") / F.col("wout")).alias("contrib"),
        )
        incoming = contrib.groupBy("dst").agg(
            F.sum(F.col("contrib").cast("decimal(25,9)")).cast("double").alias("s")
        )
        ranks = nodes.join(incoming, nodes.id == incoming.dst, "left").select(
            "id",
            (F.lit(teleport) + F.lit(0.85) * F.coalesce("s", F.lit(0.0))).alias("rank"),
        )
    return ranks.join(nodes, "id").select(
        F.col("n_name").alias("nation"), F.col("rank").alias("pagerank")
    )


# -------------------------------------------------- hierarchy (recursive)

_HIERARCHY_ORACLE = """
WITH RECURSIVE r(id, root_id, depth) AS (
  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 10
  UNION ALL
  SELECT p.p_partkey, r.root_id, r.depth + 1
  FROM part p JOIN r ON p.p_partkey // 10 = r.id
  WHERE p.p_partkey >= 10
)
SELECT CAST(depth AS BIGINT) AS depth,
       COUNT(*) AS n_nodes,
       CAST(COUNT(DISTINCT root_id) AS BIGINT) AS n_roots
FROM r GROUP BY depth
"""


@query("hierarchy_depth_rollup", oracle=_HIERARCHY_ORACLE, tags=("hierarchy", "recursive"))
def hierarchy_depth_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recursive-CTE workload solved WITHOUT recursion: a
    parent-pointer forest synthesized from part keys (parent = key
    DIV 10, roots below 10) resolved to (root, depth) via PATH DOUBLING
    (operators/hierarchy.py) — O(log depth) self-joins, not one join
    per level, which is what survives a deep hierarchy at 100 TB.
    Oracle is DuckDB's actual recursive CTE, so the doubling loop is
    checked against the real SQL-standard semantics. (Spark 4 also
    executes WITH RECURSIVE natively — `recursive_cte_subtree_rollup`
    is that face, identical SQL text on both engines.)"""
    from pythondataingestionprocess_spark.operators.hierarchy import resolve_roots

    part = load_table(spark, sf_dir, "part")
    nodes = part.select(
        F.col("p_partkey").alias("id"),
        F.when(F.col("p_partkey") < 10, F.lit(None).cast("long"))
        .otherwise((F.col("p_partkey") / 10).cast("long"))
        .alias("parent_id"),
    )
    resolved = resolve_roots(nodes)
    return resolved.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.countDistinct("root_id").alias("n_roots"),
    )


# The IDENTICAL statement runs on both engines (the spark.sql face,
# like not_in_null_semantics): Spark 4 executes WITH RECURSIVE
# natively (UnionLoop — one join per level), DuckDB likewise.
# floor()+CAST for the parent derivation because DuckDB's
# INT CAST rounds-half-up while Spark's truncates — floor first makes
# them agree; `//`/DIV spellings differ per dialect, floor() doesn't.
_REC_SQL = """
WITH RECURSIVE r(id, root_id, depth, price) AS (
  SELECT p_partkey, p_partkey, 0, p_retailprice FROM part WHERE p_partkey < 10
  UNION ALL
  SELECT p.p_partkey, r.root_id, r.depth + 1, p.p_retailprice
  FROM part p JOIN r ON CAST(floor(p.p_partkey / 10) AS BIGINT) = r.id
  WHERE p.p_partkey >= 10
)
SELECT root_id,
       COUNT(*) AS n_nodes,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       CAST(CAST(SUM(CAST(price AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS subtree_value
FROM r
GROUP BY root_id
"""


@query("recursive_cte_subtree_rollup", oracle=_REC_SQL, tags=("hierarchy", "recursive", "sql"))
def recursive_cte_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive CTE (Spark 4's WITH RECURSIVE), same statement
    text on both engines: walk the synthesized part forest (parent =
    floor(key/10), roots below 10) and roll up each root's subtree —
    node count, max depth, exact-decimal subtree value.

    Complements `hierarchy_depth_rollup`, which solves the same
    reachability problem with the PATH-DOUBLING operator: native
    recursion iterates one join per level (fine for the ~4-level
    forest here; at a 20-level 100 TB hierarchy that is 20 fact-sized
    joins), while doubling needs O(log depth) self-joins — keep both,
    and this query cross-checks Spark's recursion semantics against
    DuckDB's on identical SQL.
    """
    from pythondataingestionprocess_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_REC_SQL)
