"""Behavioral tests for the LLM-pipeline operators beyond the oracle
checks: ANN recall vs brute force, simhash near-dup sanity, multimodal
decode plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.catalog import load_table
from pythondataingestionprocess_spark.multimodal import media
from pythondataingestionprocess_spark.operators import dedup as dd
from pythondataingestionprocess_spark.operators import similarity as sim


def test_ann_lsh_recall_vs_brute(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    brute = sim.knn_bruteforce(emb, queries, k=5).select("query_id", "neighbor_id")
    ann = sim.ann_lsh(emb, queries, k=5).select("query_id", "neighbor_id")
    n_true = brute.count()
    n_hit = brute.join(ann, ["query_id", "neighbor_id"], "left_semi").count()
    recall = n_hit / n_true
    # random-vector corpus = worst case for LSH; just require usable recall
    assert recall >= 0.3, f"ANN recall {recall} too low"


def test_simhash_flags_near_identical_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again tonight"),
        (3, "completely different words about spark shuffles and parquet footers"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    pairs = dd.simhash_pairs(df, "doc_id", "text", max_hamming=12).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found
    assert (1, 3) not in found and (2, 3) not in found


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingle_sets(docs, "doc_id", "text", 3)
    exact = {(r.id_a, r.id_b) for r in dd.jaccard_pairs(sh, "doc_id", 0.5).collect()}
    lsh = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert lsh == exact


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc pasted whole into a long one: containment ~1.0
    (near-superset) while Jaccard stays below any usable threshold —
    the case the asymmetric screen exists for."""
    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i}" for i in range(60))
    rows = [
        (1, short),
        (2, short + " " + filler),
        (3, "totally unrelated content about engines and planes here"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    sh = dd.shingle_sets(df, "doc_id", "text", 3)
    cont = {(r.id_a, r.id_b): r.containment
            for r in dd.containment_pairs(sh, "doc_id", 0.8).collect()}
    jac = {(r.id_a, r.id_b) for r in dd.jaccard_pairs(sh, "doc_id", 0.5).collect()}
    assert (1, 2) in cont and cont[(1, 2)] >= 0.99
    assert (1, 2) not in jac, "size-skewed pair should be invisible to Jaccard"
    assert all(3 not in pair for pair in cont)


def test_containment_prefix_exact_at_threshold_boundary(spark):
    """Float-bound regression: a pair at EXACTLY the 0.8 threshold
    (A has 5 shingles, B shares 4, containment 4/5 = 0.8) whose one
    missing shingle is A's globally rarest. A prefix length computed
    as floor((1-τ)·|A|)+1 evaluates 1.0-0.8 = 0.19999…96 and yields a
    one-shingle prefix = exactly the missing shingle → candidate never
    generated. The integer bound (smallest i with i/sz ≥ τ under the
    verify's own division) must keep the pair."""
    a_text = "t1 t2 t3 t4 t5 t6 t7"                 # shingles 1-5
    b_text = "t2 t3 t4 t5 t6 t7 u1 u2 u3"           # shares A's 2-5
    rows = [(1, a_text), (2, b_text)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    sh = dd.shingle_sets(df, "doc_id", "text", 3)
    exact = {(r.id_a, r.id_b): r.containment
             for r in dd.containment_pairs(sh, "doc_id", 0.8).collect()}
    assert exact == {(1, 2): pytest.approx(0.8)}
    blocked = {(r.id_a, r.id_b): r.containment
               for r in dd.containment_pairs_prefix(df, "doc_id", "text", 3, 0.8).collect()}
    assert blocked == {(1, 2): pytest.approx(0.8)}


@pytest.mark.slow
def test_containment_prefix_matches_exact(spark, sf_dir):
    """The prefix-filter blocked form is EXACT-complete (pigeonhole on
    the rarest-(1-τ)|A|+1 shingles), so its output must equal the
    brute shared-shingle form on the real corpus — same pairs, same
    containment values."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingle_sets(docs, "doc_id", "text", 3)
    exact = {
        (r.id_a, r.id_b): r.containment
        for r in dd.containment_pairs(sh, "doc_id", 0.8).collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.containment
        for r in dd.containment_pairs_prefix(docs, "doc_id", "text", 3, 0.8).collect()
    }
    assert set(blocked) == set(exact)
    for k in exact:
        assert abs(blocked[k] - exact[k]) < 1e-12


@pytest.mark.slow
def test_multimodal_decode_plumbing(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes " * 40),
        (2, "video", b"\x00\x00ftyp fake " * 200),
        (3, "audio", b""),
    ]
    df = spark.createDataFrame(rows, schema="id long, media_type string, content binary")
    out = {r.id: r for r in media.decode_media(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_frames == 1  # images are single-frame
    assert out[2].n_frames > 1  # video frame-sampled
    assert out[3].byte_len == 0 and out[3].mean_intensity == 0.0
    # deterministic: same bytes → same stats
    out2 = {r.id: r for r in media.decode_media(df).collect()}
    assert out == out2


def test_real_decode_video_junk_fails_loudly():
    # image (png_lite/jpeg_lite), audio (stdlib wave), and video
    # CONTAINER metadata (mp4_lite, r9) are real now; junk video bytes
    # must fail loudly (quarantine discipline), and frame decode stays
    # codec territory — see tests/test_multimodal_headers.py.
    with pytest.raises(ValueError):
        media.real_decode(b"bytes", "video")


def test_wav_audio_decode_real_file():
    """REAL audio decode without any codec library: a generated
    16-bit PCM WAV (stdlib wave writer) yields exact rate/channels/
    frame-count and the analytically known mean |amplitude| of a
    square wave."""
    import io
    import wave
    from array import array

    import pytest as _pytest

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        # square wave: +16000/-16000 alternating, both channels
        samples = array("h", [16000 if i % 2 == 0 else -16000
                              for i in range(2 * 400)])
        w.writeframes(samples.tobytes())
    stats = media.real_decode(buf.getvalue(), "audio")
    assert stats["width"] == 8000 and stats["height"] == 2
    assert stats["n_frames"] == 400
    assert stats["mean_intensity"] == _pytest.approx(16000 / 32767.0)


def test_cosine_near_dup_finds_planted_dups(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(40)]
    planted = [(i + 1000, vec) for i, vec in base if i % 4 == 0]
    df = spark.createDataFrame(base + planted, "vec_id long, embedding array<float>")
    pairs = {
        (r.id_a, r.id_b)
        for r in dd.cosine_near_dup_pairs(df, "vec_id", "embedding").collect()
    }
    assert pairs == {(i, i + 1000) for i in range(0, 40, 4)}


def test_cosine_near_dup_incremental_matches_batch_cross_pairs(spark):
    """Daily-ingest embedding dedup: the incremental new×corpus pair
    list equals the cross-side subset of the batch operator run over
    corpus ∪ new (identical vectors share every bucket, so LSH recall
    at the dup end is exactly 1 on both paths), and corpus×corpus
    pairs are never emitted."""
    import numpy as np

    rng = np.random.default_rng(3)
    corpus_rows = [
        (i, [float(x) for x in rng.standard_normal(64)]) for i in range(40)
    ]
    # today's crawl: re-crawls of every 4th corpus vector + 5 fresh ones
    new_rows = [(i + 1000, vec) for i, vec in corpus_rows if i % 4 == 0] + [
        (2000 + j, [float(x) for x in rng.standard_normal(64)])
        for j in range(5)
    ]
    corpus = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<float>")
    new = spark.createDataFrame(new_rows, "vec_id long, embedding array<float>")

    got = {
        (r.new_id, r.corpus_id)
        for r in dd.cosine_near_dup_pairs_incremental(
            corpus, new, "vec_id", "embedding"
        ).collect()
    }
    assert got == {(i + 1000, i) for i in range(0, 40, 4)}

    # parity with the batch face restricted to cross pairs
    both = corpus.unionAll(new)
    batch_cross = {
        (r.id_b, r.id_a)  # batch emits (min,max); new ids are larger
        for r in dd.cosine_near_dup_pairs(both, "vec_id", "embedding").collect()
        if r.id_b >= 1000 and r.id_a < 1000
    }
    assert got == batch_cross


def test_cosine_near_dup_incremental_bucket_cap_keeps_anchor(spark):
    """A duplicate-heavy corpus bucket is capped by min-id anchoring:
    a new re-crawl of the mega-cluster still matches the kept anchor
    members instead of star-expanding against the whole cluster."""
    import numpy as np

    rng = np.random.default_rng(7)
    v = [float(x) for x in rng.standard_normal(64)]
    cluster = [(i, v) for i in range(300)]  # 300 identical corpus vectors
    corpus = spark.createDataFrame(cluster, "vec_id long, embedding array<float>")
    new = spark.createDataFrame([(9000, v)], "vec_id long, embedding array<float>")
    got = {
        (r.new_id, r.corpus_id)
        for r in dd.cosine_near_dup_pairs_incremental(
            corpus, new, "vec_id", "embedding", bucket_cap=4
        ).collect()
    }
    # capped: exactly the 4 min-id anchors, so the dup IS detected and
    # candidate volume stays bounded
    assert got == {(9000, i) for i in range(4)}


def test_bpe_token_count_known_strings(spark):
    from pythondataingestionprocess_spark.functions.text import bpe_token_count

    rows = [(1, "I'll pay $1,234 tomorrow!"), (2, "   "), (3, "añojo 漢字 ok")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["n"] for r in df.select("id", bpe_token_count("text").alias("n")).collect()}
    # "I" "'ll" " pay" " $" "1" "," "234" " tomorrow" "!" → 9
    assert got[1] == 9
    assert got[2] == 0  # whitespace-only
    # non-ASCII letters fall into the symbol-run class (ASCII-only
    # letter runs, like GPT-2's byte-level pre-tokenizer):
    # ["a", "ñ", "ojo", " 漢字", " ok"]
    assert got[3] == 5


def test_whitespace_token_count_per_lang_matches_duckdb(spark):
    """Migrated substance of the retired `text_token_count` face (r14
    capacity lever): the exact per-lang whitespace-count aggregation
    the retired oracle pinned, compared against DuckDB on real
    testdata — plus known-string spot checks of token_count itself,
    which stays live inside text_quality_score's feature columns."""
    import duckdb

    from pythondataingestionprocess_spark.catalog import load_table
    from pythondataingestionprocess_spark.functions.text import token_count
    from pyspark.sql import functions as F

    rows = [(1, "  one two   three "), (2, "solo"), (3, "   ")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["n"] for r in
           df.select("id", token_count("text").alias("n")).collect()}
    assert got == {1: 3, 2: 1, 3: 1}  # trim-then-split: "" counts 1

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    spark_rows = {
        r["lang"]: (r["n_docs"], r["total_tokens"])
        for r in docs.withColumn("n_tokens", token_count("text"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"))
        .collect()
    }
    oracle = duckdb.sql(f"""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                 AS total_tokens
        FROM read_parquet('{sf_dir}/documents.parquet') GROUP BY lang
    """).fetchall()
    assert spark_rows == {r[0]: (r[1], r[2]) for r in oracle}


def test_asof_join_directions_and_ties(spark):
    from pythondataingestionprocess_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 99, 50)],
        "id long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(10, 100, "a"), (10, 205, "b"), (10, 290, "c"), (10, 310, "d")],
        "k long, ts long, tag string",
    )
    back = {r["id"]: r["tag"] for r in asof_join(left, right, "k", "ts", ["tag"]).collect()}
    # id=1 ties at ts=100 → matches 'a'; id=2 ties at 205 → 'b';
    # id=3 latest ≤300 → 'c'; id=4 key 99 unmatched → NULL
    assert back == {1: "a", 2: "b", 3: "c", 4: None}
    fwd = {
        r["id"]: r["tag"]
        for r in asof_join(left, right, "k", "ts", ["tag"], direction="forward").collect()
    }
    assert fwd == {1: "a", 2: "b", 3: "d", 4: None}


def test_asof_join_null_value_does_not_fall_through(spark):
    from pythondataingestionprocess_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 300)], "id long, k long, ts long")
    right = spark.createDataFrame(
        [(10, 100, "old", 1.0), (10, 200, None, 2.0)],
        "k long, ts long, tag string, v double",
    )
    row = asof_join(left, right, "k", "ts", ["tag", "v"]).first()
    # matched row (ts=200) has tag NULL — must NOT inherit 'old' from ts=100
    assert row["tag"] is None and row["v"] == 2.0


def test_range_join_left_and_salted_join(spark):
    from pythondataingestionprocess_spark.operators.rangejoin import range_join
    from pythondataingestionprocess_spark.operators.skew import salted_join

    pts = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 99.0)], "pid long, x double"
    )
    iv = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 4.0, 20.0)], "iid long, lo double, hi double"
    )
    inner = {(r["pid"], r["iid"]) for r in range_join(pts, iv, "x", "lo", "hi", 7.0).collect()}
    assert inner == {(1, 100), (1, 200), (2, 200)}
    left = {(r["pid"], r["iid"]) for r in range_join(pts, iv, "x", "lo", "hi", 7.0, how="left").collect()}
    assert left == inner | {(3, None)}

    big = spark.createDataFrame([(i, i % 2) for i in range(100)], "v long, k long")
    dim = spark.createDataFrame([(0, "even"), (1, "odd")], "k long, name string")
    plain = {(r["v"], r["name"]) for r in big.join(dim, "k").collect()}
    salted = {(r["v"], r["name"]) for r in salted_join(big, dim, ["k"], n_salts=8).collect()}
    assert salted == plain


@pytest.mark.slow
def test_ivf_high_recall_on_clustered_data(spark):
    """IVF's home turf: clustered corpus → probing the right lists
    recovers nearly all true neighbors."""
    import numpy as np

    from pythondataingestionprocess_spark.operators import ivf

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 10
    rows = []
    for i in range(400):
        c = i % 8
        rows.append((i, [float(x) for x in centers[c] + rng.standard_normal(32)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 8)

    centroids = ivf.kmeans_fit(df, k=8, max_iter=5)
    brute = sim.knn_bruteforce(df, queries, k=5).select("query_id", "neighbor_id")
    approx = ivf.ivf_search(df, queries, centroids, k=5, n_probe=2).select(
        "query_id", "neighbor_id"
    )
    n_true = brute.count()
    n_hit = brute.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    assert n_true == 40
    assert n_hit / n_true >= 0.9, f"IVF recall {n_hit / n_true}"


def test_ivf_recall_survives_id_sorted_clusters(spark):
    """Degenerate ordering regression (VERDICT r4 item 5): ids sorted
    BY cluster — the first k vectors by id all come from one true
    cluster, so a first-k-by-id seed would collapse k-means into one
    region and empty the other lists. The md5-spread init must keep
    recall high regardless of how ids correlate with the data."""
    import numpy as np

    from pythondataingestionprocess_spark.operators import ivf

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((8, 32)) * 10
    rows = []
    for i in range(400):
        c = i // 50  # ids 0-49 cluster 0, 50-99 cluster 1, ...
        rows.append((i, [float(x) for x in centers[c] + rng.standard_normal(32)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") % 50 == 0)  # one per cluster

    centroids = ivf.kmeans_fit(df, k=8, max_iter=5)
    brute = sim.knn_bruteforce(df, queries, k=5).select("query_id", "neighbor_id")
    approx = ivf.ivf_search(df, queries, centroids, k=5, n_probe=2).select(
        "query_id", "neighbor_id"
    )
    n_true = brute.count()
    n_hit = brute.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    assert n_true == 40
    assert n_hit / n_true >= 0.9, f"IVF recall {n_hit / n_true} on id-sorted clusters"


def test_ivf_assign_is_deterministic(spark):
    import numpy as np

    from pythondataingestionprocess_spark.operators import ivf

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    c = ivf.kmeans_fit(df, k=4, max_iter=3)
    a1 = sorted((r["vec_id"], r["ivf_list"]) for r in ivf.ivf_assign(df, c).collect())
    a2 = sorted((r["vec_id"], r["ivf_list"]) for r in ivf.ivf_assign(df, c).collect())
    assert a1 == a2
    assert len({lst for _, lst in a1}) > 1  # actually partitions the space


def test_salted_agg_count_matches_plain(spark):
    from pythondataingestionprocess_spark.operators.skew import salted_agg_count

    df = spark.createDataFrame([(i, "hot" if i % 10 else "cold") for i in range(200)], "v long, k string")
    plain = {r["k"]: r["n"] for r in df.groupBy("k").count().withColumnRenamed("count", "n").collect()}
    salted = {r["k"]: r["n"] for r in salted_agg_count(df, ["k"], n_salts=8).collect()}
    assert salted == plain


def test_bucket_cap_pathological_cluster_bounded(spark):
    """VERDICT r1 item 2: a planted identical-content mega-cluster must
    complete with bounded per-row expansion (no gigarow collect_list),
    and the star expansion must preserve dedup connectivity — every
    cluster member reachable from the anchor at jaccard 1.0."""
    base = [
        (i, f"unique filler document number {i} with distinct trailing words {i * 7}")
        for i in range(50)
    ]
    clone_text = "exact same boilerplate page body repeated verbatim many times over"
    clones = [(1000 + i, clone_text) for i in range(400)]
    df = spark.createDataFrame(base + clones, schema="doc_id long, text string")
    pairs = dd.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.5, bucket_cap=64
    )
    got = pairs.collect()
    anchor_pairs = {(r.id_a, r.id_b) for r in got if r.id_a == 1000}
    # star expansion: anchor 1000 links every other clone; all verify at 1.0
    assert anchor_pairs == {(1000, 1000 + i) for i in range(1, 400)}
    assert all(abs(r.jaccard - 1.0) < 1e-12 for r in got if r.id_a == 1000)
    # no spurious links into the unique docs
    assert not any(r.id_a < 1000 or r.id_b < 1000 for r in got)


def test_bucket_cap_does_not_change_normal_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    capped = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, bucket_cap=8
        ).collect()
    }
    uncapped = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, bucket_cap=10**9
        ).collect()
    }
    assert capped == uncapped


def test_greedy_packing_invariants(spark):
    """Greedy packer: no bin exceeds the budget unless a single doc
    does; docs stay in order; nothing is dropped or duplicated."""
    from pythondataingestionprocess_spark.operators.packing import (
        pack_documents_greedy,
    )

    rows = [("a", i, t) for i, t in enumerate([100, 300, 250, 50, 500, 700, 10, 90])]
    rows += [("b", 0, 900), ("b", 1, 150), ("b", 2, 40)]  # oversized first doc
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = pack_documents_greedy(df, "source", "doc_id", "n_tokens", 600).collect()
    assert len(out) == len(rows)  # nothing dropped
    by_bin: dict = {}
    for r in out:
        by_bin.setdefault((r.source, r.bin_id), []).append(r)
    for (_, _), members in by_bin.items():
        total = sum(m.n_tokens for m in members)
        assert total <= 600 or len(members) == 1  # oversized doc → own bin
    # order preserved: bin ids are monotone in doc_id per source
    for src in ("a", "b"):
        seq = [r.bin_id for r in sorted(out, key=lambda r: r.doc_id) if r.source == src]
        assert seq == sorted(seq)
    # greedy on source a: [100,300] | [250,50] … budget 600 →
    # 100+300 fits, +250 would overflow
    a_bins = {r.doc_id: r.bin_id for r in out if r.source == "a"}
    assert a_bins[0] == a_bins[1] == 0 and a_bins[2] == 1


def test_lookahead_packing_beats_greedy_on_spark(spark):
    """2-open-bin packer through applyInPandas: nothing dropped, budget
    respected, and on a mix where a large doc forces greedy to seal a
    half-empty bin, lookahead tops that bin up and uses fewer bins."""
    from pythondataingestionprocess_spark.operators.packing import (
        pack_documents_greedy,
        pack_documents_lookahead,
    )

    # budget 10. greedy seals at each overflow: [5] [6] [5,4] → 3 bins.
    # lookahead keeps both open: 5 | 6, then 5 tops bin0 to 10 and
    # 4 tops bin1 to 10 → 2 bins.
    rows = [("a", 0, 5), ("a", 1, 6), ("a", 2, 5), ("a", 3, 4)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    look = pack_documents_lookahead(df, "source", "doc_id", "n_tokens", 10).collect()
    greedy = pack_documents_greedy(df, "source", "doc_id", "n_tokens", 10).collect()
    assert len(look) == len(rows)
    assert max(r.bin_id for r in look) + 1 == 2
    assert max(r.bin_id for r in greedy) + 1 == 3
    by_bin: dict = {}
    for r in look:
        by_bin.setdefault(r.bin_id, 0)
        by_bin[r.bin_id] += r.n_tokens
    assert all(total <= 10 for total in by_bin.values())


def test_connected_components_transitive_chain(spark):
    """A~B, B~C, C~D with no direct A~D must collapse to one group
    labeled by the min id; disjoint pairs stay separate."""
    from pythondataingestionprocess_spark.operators.components import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r.id: r.group_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_star_long_chain(spark):
    """A 120-node path graph: plain min-label propagation would need
    ~120 rounds (diameter), the alternating star rounds converge in
    O(log²). All nodes must label to the chain's minimum."""
    from pythondataingestionprocess_spark.operators.components import (
        connected_components_star,
    )

    n = 120
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(500, 501)], "id_a long, id_b long"
    )
    got = {r.id: r.group_id for r in connected_components_star(pairs).collect()}
    assert {got[i] for i in range(n)} == {0}
    assert got[500] == 500 and got[501] == 500
    assert len(got) == n + 2


def test_connected_components_star_matches_propagation(spark):
    """On the near-clique graphs dedup produces, both CC forms must
    emit identical labelings."""
    import random

    from pythondataingestionprocess_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(13)
    edges = set()
    for base in (0, 100, 200):  # three clusters of 8, near-clique
        members = [base + i for i in range(8)]
        for a in members:
            for b in members:
                if a < b and rng.random() < 0.6:
                    edges.add((a, b))
        # ensure connectivity even if the random clique is sparse
        for a, b in zip(members, members[1:]):
            edges.add((a, b))
    pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    prop = {r.id: r.group_id for r in connected_components(pairs).collect()}
    star = {r.id: r.group_id for r in connected_components_star(pairs).collect()}
    assert prop == star
    assert set(prop.values()) == {0, 100, 200}


def test_fuzzy_self_join_complete_at_k1(spark):
    """Symmetric-delete blocking must find EVERY pair at distance ≤ 1
    (soundness of the delete-neighborhood intersection), and the exact
    verify must reject near-misses at distance 2."""
    from pythondataingestionprocess_spark.operators.fuzzyjoin import fuzzy_self_join

    rows = [
        (1, "spark engine"),
        (2, "spark enginz"),   # subst  -> dist 1 of id 1
        (3, "spark engin"),    # delete -> dist 1 of ids 1,2
        (4, "sparkle engine"),  # dist 2 of id 1 — must NOT pair with 1
        (5, "wholly different"),
    ]
    df = spark.createDataFrame(rows, "sid long, s string")
    got = {(r.id_a, r.id_b): r.edit_dist for r in fuzzy_self_join(df, "sid", "s").collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


def test_fuzzy_self_join_cap_matches_duckdb_replay(spark):
    """Where the bucket cap BINDS, the Spark pipeline and the DuckDB
    oracle replay (plans/core_relational._FUZZY_JOIN_ORACLE's shape)
    must emit the IDENTICAL capped pair set — the r16 oracle-basis
    change for fuzzy_join_symdelete rests on this equivalence. Corpus:
    a 9-member identical-string group (over cap 8 → anchor-star) plus
    a small typo cluster (under cap → all-pairs)."""
    import duckdb

    from pythondataingestionprocess_spark.operators.fuzzyjoin import fuzzy_self_join

    rows = [(i, "omega relay") for i in range(1, 10)]  # 9 identical
    rows += [(20, "omega relaz"), (21, "omega relaz")]  # dist-1 typos
    rows += [(30, "unrelated words")]
    df = spark.createDataFrame(rows, "sid long, s string")
    cap = 8
    got = sorted(
        (r.id_a, r.id_b, r.edit_dist)
        for r in fuzzy_self_join(df, "sid", "s", bucket_cap=cap).collect()
    )
    # the 9-member group must NOT expand quadratically: anchor-star
    # only (8 pairs to sid 1), never the 36 all-pairs
    star = [(a, b) for a, b, _ in got if b <= 9]
    assert star == [(1, i) for i in range(2, 10)]
    con = duckdb.connect()
    con.execute("CREATE TABLE corpus(sid BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO corpus VALUES (?, ?)", rows)
    oracle = f"""
WITH nb AS (
  SELECT sid, unnest(list_distinct(list_prepend(s,
           list_transform(range(1, length(s) + 1),
             i -> substr(s, 1, i - 1) || substr(s, i + 1))))) AS bucket
  FROM corpus
),
bstat AS (SELECT bucket, COUNT(*) AS c, MIN(sid) AS anchor FROM nb GROUP BY 1),
cand AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.sid AS id_a, b.sid AS id_b
    FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.sid < b.sid
    JOIN bstat st ON st.bucket = a.bucket WHERE st.c <= {cap}
    UNION ALL
    SELECT st.anchor, nb.sid FROM nb JOIN bstat st ON st.bucket = nb.bucket
    WHERE st.c > {cap} AND nb.sid <> st.anchor
  )
)
SELECT c.id_a, c.id_b, CAST(levenshtein(ca.s, cb.s) AS INTEGER) AS edit_dist
FROM cand c JOIN corpus ca ON ca.sid = c.id_a JOIN corpus cb ON cb.sid = c.id_b
WHERE levenshtein(ca.s, cb.s) <= 1
"""
    want = sorted(map(tuple, con.sql(oracle).fetchall()))
    assert got == want


def test_resolve_roots_path_doubling(spark):
    """Deep chain (depth 64) resolves in O(log) rounds within the
    20-round cap, with exact depths; forest separation preserved."""
    from pythondataingestionprocess_spark.operators.hierarchy import resolve_roots

    chain = [(i, i - 1 if i > 0 else None) for i in range(65)]
    other = [(1000, None), (1001, 1000)]
    # 2001's parent 9999 does not exist: resolves to the dangling id
    # with the flag set; 2002 inherits the flag through the splice.
    dangling = [(2001, 9999), (2002, 2001)]
    df = spark.createDataFrame(chain + other + dangling, "id long, parent_id long")
    got = {
        r.id: (r.root_id, r.depth, r.dangling) for r in resolve_roots(df).collect()
    }
    assert got[0] == (0, 0, False)
    assert got[64] == (0, 64, False)
    assert got[32] == (0, 32, False)
    assert got[1001] == (1000, 1, False)
    assert got[2001] == (9999, 1, True)
    assert got[2002] == (9999, 2, True)


def test_hll_sketch_estimates_within_bounds(spark, sf_dir):
    """The tight ≤2% pin on the raw DataSketches estimates (the r16
    driver face exposes only the 5%-bound CERTIFICATE booleans, so the
    sharper bound stays pinned here) plus the face's own contract:
    every boolean true, exact counts exact, the ALL row present."""
    from pythondataingestionprocess_spark.plans import REGISTRY

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()
    assert per_type
    for r in per_type:
        assert abs(r.est - r.exact) <= max(2, 0.02 * r.exact), r
    est_all = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    ).agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")).collect()[0]["e"]
    exact_all = ev.select("user_id").distinct().count()
    assert abs(est_all - exact_all) <= max(2, 0.02 * exact_all)

    rows = REGISTRY["events_distinct_users_sketch"].fn(spark, sf_dir).collect()
    assert all(r.est_rel_err_le_0_05 for r in rows), rows
    (all_row,) = [r for r in rows if r.event_type == "ALL"]
    assert all_row.exact_users == exact_all
    got_types = {r.event_type: r.exact_users for r in rows if r.event_type != "ALL"}
    assert got_types == {r.event_type: r.exact for r in per_type}


def test_lsh_pair_memo_keys_on_session_and_dir(spark):
    """The memoized LSH pair stage must return the SAME DataFrame for
    repeated (session, sf_dir) calls and a different one for another
    sf_dir — never a stale cross-directory hit."""
    from pythondataingestionprocess_spark.plans.llm_heavy import _lsh_pairs_cached

    a1 = _lsh_pairs_cached(spark, "/root/testdata/sf0.001")
    a2 = _lsh_pairs_cached(spark, "/root/testdata/sf0.001")
    b = _lsh_pairs_cached(spark, "/root/testdata/sf0.01")
    assert a1 is a2
    assert a1 is not b


def test_int8_knn_recall_vs_float_brute(spark, sf_dir):
    """Quantized exact scan vs the float brute scan on the real
    corpus: int8 keeps ≥0.9 recall@5 (in practice near-1.0 — the
    quantization error on cosine is O(1/127) while neighbor gaps on
    random vectors are much wider), at 1/8 the bytes per vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    brute = sim.knn_bruteforce(emb, queries, k=5).select("query_id", "neighbor_id")
    q8 = sim.knn_int8(emb, queries, k=5).select("query_id", "neighbor_id")
    n_true = brute.count()
    n_hit = brute.join(q8, ["query_id", "neighbor_id"], "left_semi").count()
    assert n_true > 0
    assert n_hit / n_true >= 0.9, f"int8 recall {n_hit / n_true}"


def test_int8_quantization_bounds_and_zero_vector(spark):
    """Full-range symmetric quantization: max|component| maps to ±127;
    a zero vector survives as all-zeros (no NULLs, no division blowup);
    quantized cosine of a vector with itself is 1."""
    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [2.0, 2.0, 2.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["qvec"] for r in
           sim.quantize_int8(df).collect()}
    assert got[1] == [64, -127, 32, 0]
    assert got[2] == [0, 0, 0, 0]
    assert got[3] == [127, 127, 127, 127]

    # self-cosine through the int8 kernel is exactly 1 (identical rows)
    corpus = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.1]), (2, [0.5, -1.0, 0.25, 0.1]),
         (3, [-0.5, 1.0, -0.25, -0.1])],
        "vec_id long, embedding array<double>",
    )
    out = sim.knn_int8(corpus, corpus.filter(F.col("vec_id") == 1), k=2).collect()
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["neighbor_id"] == 2 and abs(by_rank[1]["cos"] - 1.0) < 1e-12
    assert by_rank[2]["neighbor_id"] == 3 and abs(by_rank[2]["cos"] + 1.0) < 1e-12


def test_subsequence_match_finds_scaled_shifted_pattern(spark):
    """Z-normalized subsequence search: a 2x-amplified, +100-shifted
    copy of the query pattern planted in one user's series must win
    with distance ~0 (scale/shift invariance), at the right end
    position; a noise-only user must not beat it. Flat windows are
    excluded (std 0)."""
    from pythondataingestionprocess_spark.operators.timeseries import (
        subsequence_match,
    )

    pattern = [1.0, 3.0, 2.0, 5.0, 4.0]
    planted = [100 + 2 * x for x in pattern]  # shifted + scaled copy
    series_a = [7.0, 7.5, 6.0] + planted + [9.0, 8.0]   # match ends at idx 7
    series_b = [5.0, 5.0, 5.0, 5.0, 5.0, 1.0, 9.0, 1.0, 9.0, 1.0]  # noise+flat
    rows = [
        (1, f"2024-01-01 00:{i:02d}:00", i, v) for i, v in enumerate(series_a)
    ] + [
        (2, f"2024-01-01 00:{i:02d}:00", i, v) for i, v in enumerate(series_b)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    top = subsequence_match(df, pattern, k=3).collect()
    best = top[0]
    assert best["user_id"] == 1 and best["end_seq"] == 7
    assert best["dist"] < 1e-9
    assert all(r["dist"] >= best["dist"] for r in top)
    # the all-flat 5.0 window of user 2 (ends at seq 4) must be absent
    assert not any(r["user_id"] == 2 and r["end_seq"] == 4 for r in top)


def test_subsequence_match_single_shuffle_no_python(spark):
    """Plan contract for the subsequence search: ONE hash exchange
    (the per-key window partitioning), ONE Window node carrying the
    subsequence array and both moments (same frame — no second pass),
    a TakeOrderedAndProject top-k (k-sized, not a data-grain sort),
    and zero Python eval nodes."""
    from pythondataingestionprocess_spark.operators.timeseries import (
        subsequence_match,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    df = subsequence_match(ev, [1.0, 3.0, 2.0, 5.0, 4.0], k=10)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re as _re

    assert len(_re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    assert len(_re.findall(r"\(\d+\) Window\b", plan)) == 1
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_subsequence_match_matches_duckdb_oracle(spark):
    """Cross-engine parity for the r7 registration candidate: the
    top-10 (user, position, dist) from subsequence_match equals a
    DuckDB list-window replay (dist rounded to 6 dp; the pattern's
    z-norm is hand-expanded in the SQL: mean 3, stddev_pop √2). This
    is the oracle that will back an `events_pattern_match` registry
    entry once a driver-window slot opens (r7 — r6's two slots are
    spent)."""
    import duckdb

    from pythondataingestionprocess_spark.operators.timeseries import (
        subsequence_match,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    got = [
        (r["user_id"], r["end_seq"], round(r["dist"], 6))
        for r in subsequence_match(ev, [1.0, 3.0, 2.0, 5.0, 4.0], k=10).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    oracle = con.execute(
        """
        WITH f AS (
          SELECT user_id, event_id AS end_seq,
                 list(value) OVER w AS win,
                 avg(value) OVER w AS mu,
                 stddev_pop(value) OVER w AS sd
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, end_seq,
               sqrt(list_sum(list_transform(
                    list_zip(win, [1.0,3.0,2.0,5.0,4.0]),
                    z -> pow((z[1]-mu)/sd - (z[2]-3.0)/sqrt(2.0), 2)))) AS dist
        FROM f WHERE len(win)=5 AND sd > 0
        ORDER BY dist, user_id, end_seq LIMIT 10
        """
    ).fetchall()
    assert got == [(u, s, round(d, 6)) for u, s, d in oracle]


def test_decayed_feature_matches_python_recursion(spark):
    """The truncated windowed fold must equal the exact EWMA
    recursion s_t = v_t + a·s_{t-1} while the history fits the
    window, and stay within the a^m truncation bound beyond it.
    Interleaved keys confirm per-key isolation."""
    from pythondataingestionprocess_spark.operators.timeseries import (
        decayed_feature,
    )

    half_life, m = 4.0, 8
    a = 0.5 ** (1.0 / half_life)
    vals_u1 = [1.0, 0.0, 2.0, 5.0, 3.0, 0.5, 4.0, 1.5, 2.5, 0.25, 6.0, 1.0]
    vals_u2 = [10.0, 20.0, 30.0]
    rows = [
        (u, f"2024-01-01 00:{i:02d}:00", i, v)
        for u, series in ((1, vals_u1), (2, vals_u2))
        for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["user_id"], r["seq"]): r["decayed"]
        for r in decayed_feature(
            df, half_life_rows=half_life, window_rows=m
        ).collect()
    }

    for u, series in ((1, vals_u1), (2, vals_u2)):
        s = 0.0
        for i, v in enumerate(series):
            s = v + a * s  # exact recursion
            if i < m:
                assert got[(u, i)] == pytest.approx(s, abs=1e-12), (u, i)
            else:
                # truncation drops terms older than m rows: bounded by
                # a^m * max history prefix
                assert abs(got[(u, i)] - s) <= (a ** m) * sum(series) + 1e-9


def _encode_png(width, height, pixels, color_type=2, filters=None):
    """Minimal PNG encoder for fixtures: 8-bit, rows filtered with the
    given per-row filter types (default all 0) so the decoder's
    Sub/Up/Average/Paeth reconstruction paths get exercised."""
    import struct
    import zlib as _zlib

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    filters = filters or [0] * height

    def chunk(ctype, body):
        out = struct.pack(">I", len(body)) + ctype + body
        return out + struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)

    def _paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    stride = width * ch
    raw = bytearray()
    prev = bytearray(stride)
    for r in range(height):
        line = bytearray(pixels[r * stride:(r + 1) * stride])
        f = filters[r]
        enc = bytearray(line)
        if f == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (line[i] - line[i - ch]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                enc[i] = (line[i] - _paeth(left, prev[i], ul)) & 0xFF
        raw += bytes([f]) + enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_real_images_all_filters(spark):
    """REAL image decode without PIL: an 8-bit RGB image whose rows use
    every PNG filter type must reconstruct exactly (mean over a known
    gradient), through the same mapInPandas plumbing the fake decode
    uses. Audio stays stubbed; junk image bytes fail loudly."""
    import pytest as _pytest

    w, h = 6, 5
    pixels = bytes((r * 40 + c) % 256 for r in range(h) for c in range(w * 3))
    png = _encode_png(w, h, pixels, color_type=2, filters=[0, 1, 2, 3, 4])
    expected_mean = sum(pixels) / len(pixels) / 255.0

    stats = media.real_decode(png, "image")
    assert (stats["width"], stats["height"]) == (w, h)
    assert stats["mean_intensity"] == _pytest.approx(expected_mean, abs=1e-12)

    # grayscale and RGBA variants (alpha excluded from the mean)
    gray = _encode_png(3, 2, bytes(range(6)), color_type=0)
    assert media.real_decode(gray, "image")["mean_intensity"] == _pytest.approx(
        (0 + 1 + 2 + 3 + 4 + 5) / 6 / 255.0
    )
    rgba_px = bytes([10, 20, 30, 255] * 4)  # 2x2, constant alpha
    rgba = _encode_png(2, 2, rgba_px, color_type=6)
    assert media.real_decode(rgba, "image")["mean_intensity"] == _pytest.approx(
        (10 + 20 + 30) / 3 / 255.0
    )

    # end-to-end through the Arrow plumbing with use_fake=False
    df = spark.createDataFrame(
        [(1, "image", png)], "id long, media_type string, content binary"
    )
    row = media.decode_media(df, use_fake=False).collect()[0]
    assert (row.width, row.height, row.n_frames) == (w, h, 1)

    with _pytest.raises(ValueError):
        media.real_decode(b"not a png", "image")
    with _pytest.raises(ValueError):
        media.real_decode(b"bytes", "video")



def test_resample_interpolate_hourly_semantics(spark):
    """Grid points: exact-hit reproduces the observation, interior
    points linearly interpolate, points before the first / after the
    last observation back/forward-fill, and the grid spans
    hour-floor(min ts) .. hour-floor(max ts) per key."""
    from pythondataingestionprocess_spark.operators.timeseries import (
        resample_interpolate_hourly,
    )

    rows = [
        # user 1: obs at 00:30 (v=10) and 02:30 (v=30) → grid 00,01,02
        (1, "2024-01-01 00:30:00", 10.0),
        (1, "2024-01-01 02:30:00", 30.0),
        # user 2: single obs exactly on the hour → one grid point, exact
        (2, "2024-01-01 05:00:00", 7.0),
        # user 3: single obs OFF the hour → one backfill grid point at
        # hour-floor(ts) (r18 regression fixture: the r17 lead+explode
        # form emitted zero rows for this key)
        (3, "2024-01-01 06:45:00", 3.5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["user_id"], str(r["grid_ts"])): r["value"]
        for r in resample_interpolate_hourly(df).collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == 10.0  # backfill before first obs
    # 01:00 sits 30/120 min between (00:30, 10) and (02:30, 30) → 15
    assert got[(1, "2024-01-01 01:00:00")] == pytest.approx(15.0, abs=1e-12)
    # 02:00 sits 90/120 min along → 25
    assert got[(1, "2024-01-01 02:00:00")] == pytest.approx(25.0, abs=1e-12)
    assert (1, "2024-01-01 03:00:00") not in got  # grid ends at hour-floor(max)
    assert got[(2, "2024-01-01 05:00:00")] == 7.0  # exact hit
    # lone off-hour obs: exactly one backfill row at hour-floor(ts)
    assert got[(3, "2024-01-01 06:00:00")] == 3.5
    assert (3, "2024-01-01 06:45:00") not in got
    assert (3, "2024-01-01 07:00:00") not in got
    assert len(got) == 5


def test_resample_interpolate_property_bounded_and_exact(spark):
    """Property sweep on a pseudo-random multi-user series: every
    interpolated grid value lies within [min, max] of its two
    neighboring observations (linear interp can't overshoot), every
    grid point coinciding with an observation reproduces it exactly,
    and per key the grid is exactly the hour-floor span."""
    import random

    from pythondataingestionprocess_spark.operators.timeseries import (
        resample_interpolate_hourly,
    )

    rng = random.Random(42)
    rows = []
    for u in (1, 2, 3):
        t = 0
        for _ in range(40):
            t += rng.randint(60, 7200)  # 1 min .. 2 h gaps
            rows.append(
                (u, f"2024-01-0{1 + t // 86400} "
                    f"{(t % 86400) // 3600:02d}:{(t % 3600) // 60:02d}:{t % 60:02d}",
                 round(rng.uniform(-50, 50), 3))
            )
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = resample_interpolate_hourly(df).collect()

    import bisect

    by_user = {}
    for u, ts, v in rows:
        by_user.setdefault(u, []).append((ts, v))
    for series in by_user.values():
        series.sort()
    n_grid_expected = 0
    for u, series in by_user.items():
        lo = series[0][0][:14] + "00:00"
        hi = series[-1][0][:14] + "00:00"
        n_hours = (
            (int(hi[8:10]) - int(lo[8:10])) * 24
            + int(hi[11:13]) - int(lo[11:13]) + 1
        )
        n_grid_expected += n_hours
    assert len(out) == n_grid_expected

    for r in out:
        u, gts, v = r["user_id"], str(r["grid_ts"]), r["value"]
        series = by_user[u]
        keys = [s for s, _ in series]
        i = bisect.bisect_right(keys, gts)
        neighbors = []
        if i > 0:
            neighbors.append(series[i - 1][1])
        if i < len(series):
            neighbors.append(series[i][1])
        assert min(neighbors) - 1e-9 <= v <= max(neighbors) + 1e-9, r
        if i > 0 and keys[i - 1] == gts:
            assert v == series[i - 1][1]


def test_containment_auto_picks_form_by_shingle_profile(spark):
    """The adaptive screen chooses from the data: a uniform corpus
    profiles 'plain'; planting a hyper-common shingle in every doc
    flips the choice to 'prefix'; and on a corpus where both run, the
    two forms return identical pairs (exact-complete either way)."""
    import pythondataingestionprocess_spark.operators.dedup as dd

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa"
    ).split()
    rows = []
    for i in range(30):
        words = base[i % 4 :] + [f"uniq{i}a", f"uniq{i}b", f"uniq{i}c"]
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dd.shingle_sets(df, "doc_id", "text", 3)

    assert dd.choose_containment_form(sh, hot_df_threshold=40) == "plain"
    # every doc shares the ("alpha","bravo","charlie")-family prefix
    # shingles ~27 times; drop the threshold under that df and the
    # profile flips
    assert dd.choose_containment_form(sh, hot_df_threshold=10) == "prefix"

    auto = {
        (r.id_a, r.id_b)
        for r in dd.containment_pairs_auto(df, "doc_id", "text", 3, 0.8).collect()
    }
    plain = {
        (r.id_a, r.id_b)
        for r in dd.containment_pairs(sh, "doc_id", 0.8).collect()
    }
    prefix = {
        (r.id_a, r.id_b)
        for r in dd.containment_pairs_prefix(df, "doc_id", "text", 3, 0.8).collect()
    }
    assert auto == plain == prefix


@pytest.mark.slow
def test_containment_heavy_tail_default_threshold_and_margin(spark):
    """r16 VERDICT item 3 — the heavy-tail claim as a regression, not
    a code comment: on a boilerplate-contaminated corpus (every doc
    opens with the same header, the realistic crawl pathology) the
    auto profile (a) trips at the DEFAULT 20k hot-df threshold, and
    (b) the prefix form's MEASURED candidate volume beats the plain
    self-join's Σ C(df,2) by ≥1000× — the predicted margin, asserted
    on deterministic counts rather than wall clocks. A smaller twin
    of the same corpus then runs BOTH forms to completion and pins
    output equality (the switch is a physical-plan choice only)."""
    import pythondataingestionprocess_spark.operators.dedup as dd

    boiler = "breaking news update for subscribers today"

    def corpus(n_docs):
        return spark.createDataFrame(
            [(i, f"{boiler} u{i}x u{i}y u{i}z") for i in range(n_docs)],
            "doc_id long, text string",
        )

    big = corpus(21_000)
    sh = dd.shingle_sets(big, "doc_id", "text", 3)
    # (a) the DEFAULT threshold trips: boilerplate trigrams have
    # df = 21 000 > 20 000
    assert dd.choose_containment_form(sh) == "prefix"

    # (b) candidate-volume margin. Plain's candidate multiset is
    # exactly Σ C(df,2) over shingles (what _pair_overlap_counts
    # explodes); the prefix stage is counted for real.
    plain_cost = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("c"))
        .collect()[0]["c"]
    )
    doc_sh = dd.shingle_array_table(big, "doc_id", "text", 3)
    prefix_cands = dd._containment_prefix_candidates(doc_sh, "doc_id", 0.8).count()
    # 4 boilerplate trigrams x C(21000, 2) = 882M candidate pairs
    assert plain_cost > 500_000_000  # the quadratic cliff is real here
    assert prefix_cands * 1000 < plain_cost, (
        f"prefix candidates {prefix_cands} vs plain Σ C(df,2) {plain_cost}"
    )

    # equality twin at a size where plain still completes
    small = corpus(600)
    small_sh = dd.shingle_sets(small, "doc_id", "text", 3)
    assert dd.choose_containment_form(small_sh, hot_df_threshold=300) == "prefix"
    auto = {
        (r.id_a, r.id_b)
        for r in dd.containment_pairs_auto(
            small, "doc_id", "text", 3, 0.8, hot_df_threshold=300
        ).collect()
    }
    plain = {
        (r.id_a, r.id_b)
        for r in dd.containment_pairs(small_sh, "doc_id", 0.8).collect()
    }
    assert auto == plain


def test_block_dedup_retention_semantics(spark):
    """Planted-duplicate semantics for C4-style block dedup: a full
    copy of a doc keeps zero blocks; a doc sharing only its first
    block keeps the rest; the first-occurrence winner is the LOWEST
    (id, block_idx) — so the original always survives intact."""
    b1 = "w01 w02 w03 w04 w05 w06 w07 w08 w09 w10"
    b2 = "x01 x02 x03 x04 x05 x06 x07 x08 x09 x10"
    b3 = "y01 y02 y03 y04 y05 y06 y07 y08 y09 y10"
    rows = [
        (1, f"{b1} {b2}"),       # original: 2 blocks, keeps both
        (2, f"{b1} {b2}"),       # exact copy: keeps nothing
        (3, f"{b1} {b3}"),       # shares block 1 only: keeps b3
        (4, "short tail"),       # sub-block doc: 1 unique block
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"])
        for r in dd.block_dedup_retention(df, "doc_id", "text").collect()
    }
    assert got == {1: (2, 2), 2: (2, 0), 3: (2, 1), 4: (1, 1)}


def test_incremental_index_composes_store_across_deltas(spark, sf_dir, tmp_path):
    """Production shape of index maintenance, end-to-end: index state
    persisted in a ParquetTableStore; each delta batch of documents is
    indexed ALONE and merged into the stored state; the final state
    equals a from-scratch index over everything ingested. History docs
    are never re-read at refresh time."""
    from pythondataingestionprocess_spark.pipeline.store import ParquetTableStore
    from pythondataingestionprocess_spark.plans.corpus_ops import (
        _partial_index,
        _words,
        merge_index_states,
    )

    docs = load_table(spark, sf_dir, "documents")
    terms = _words(docs).select("doc_id", F.explode(F.col("ws")).alias("term"))
    store = ParquetTableStore(spark, str(tmp_path / "state"))
    batches = [terms.filter(F.pmod(F.col("doc_id"), 3) == i) for i in range(3)]

    store.overwrite("index", _partial_index(batches[0]))
    for delta in batches[1:]:
        merged = merge_index_states(
            store.read("index"), _partial_index(delta)
        ).localCheckpoint()  # materialize BEFORE overwriting the source file
        store.overwrite("index", merged)

    def canon(df):
        return {
            r["term"]: (r["df"], r["total_tf"], tuple(map(tuple, r["top"])))
            for r in df.collect()
        }

    got = canon(store.read("index"))
    want = canon(_partial_index(terms))
    assert got == want


def test_temperature_mix_invariants(spark, sf_dir):
    """α-sampling contract on the real corpus: expected post-mix size
    equals the input size (Σ rate·n_in == N up to rounding), realized
    n_out is within binomial noise of rate·n_in per lang, and rates
    are ANTI-monotone in n_in — rarer languages up-sample, dominant
    ones down-sample (the whole point of temperature rebalancing)."""
    from pythondataingestionprocess_spark.plans import REGISTRY

    rows = REGISTRY["corpus_temperature_mix"].fn(spark, sf_dir).collect()
    n_total = sum(r["n_in"] for r in rows)
    expected = sum(r["rate"] * r["n_in"] for r in rows)
    assert abs(expected - n_total) < 1e-3 * n_total
    for r in rows:
        mu = r["rate"] * r["n_in"]
        sd = max(1.0, (r["n_in"] * 0.25) ** 0.5)
        assert abs(r["n_out"] - mu) <= 6 * sd, (r["lang"], r["n_out"], mu)
    by_size = sorted(rows, key=lambda r: r["n_in"])
    rates = [r["rate"] for r in by_size]
    assert all(a >= b for a, b in zip(rates, rates[1:])), rates


@pytest.mark.slow
def test_ivf_persistent_index_roundtrip_prune_and_append(spark, tmp_path):
    """The at-rest IVF index: search_index over the saved layout must
    equal ivf_search over the in-session frames; the vectors scan must
    carry the probed-list partition filter (unprobed lists pruned at
    listing time); an incremental append lands in existing lists and
    is immediately searchable."""
    import numpy as np

    from pythondataingestionprocess_spark.operators import ivf

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 10
    rows = [
        (i, [float(x) for x in centers[i % 8] + rng.standard_normal(32)])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 4)
    centroids = ivf.kmeans_fit(df, k=8, max_iter=5)

    idx = str(tmp_path / "ivf_index")
    ivf.save_index(df, centroids, idx)
    assert np.allclose(ivf.load_centroids(spark, idx), centroids)

    live = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.ivf_search(df, queries, centroids, k=5, n_probe=2).collect()
    }
    persisted_df = ivf.search_index(spark, idx, queries, k=5, n_probe=2)
    persisted = {
        (r["query_id"], r["neighbor_id"]) for r in persisted_df.collect()
    }
    assert persisted == live

    # the partition filter reached the scan (pruning, not post-scan)
    plan = persisted_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_list" in plan

    # incremental add: a near-duplicate of query 0's center, new id
    new = spark.createDataFrame(
        [(9000, [float(x) for x in centers[0] + 0.01 * rng.standard_normal(32)])],
        "vec_id long, embedding array<float>",
    )
    ivf.append_to_index(new, idx)
    after = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.search_index(spark, idx, queries, k=5, n_probe=2).collect()
    }
    assert (0, 9000) in after


@pytest.mark.slow
def test_ivf_sq8_quantized_index_recall(spark, tmp_path):
    """IVF-SQ8: the int8-resident index (1/8 bytes/vector on top of
    list pruning) must recover ≥0.9 of the float index's results on
    clustered data — the asymmetric int8-corpus × float-query cosine
    is exact in expectation. Appends inherit the index's format."""
    import numpy as np

    from pythondataingestionprocess_spark.operators import ivf

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 10
    rows = [
        (i, [float(x) for x in centers[i % 8] + rng.standard_normal(32)])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 4)
    centroids = ivf.kmeans_fit(df, k=8, max_iter=5)

    fidx = str(tmp_path / "float_idx")
    qidx = str(tmp_path / "q_idx")
    ivf.save_index(df, centroids, fidx)
    ivf.save_index(df, centroids, qidx, quantized=True)

    fres = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.search_index(spark, fidx, queries, k=5, n_probe=2).collect()
    }
    qres = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.search_index(spark, qidx, queries, k=5, n_probe=2).collect()
    }
    assert len(fres & qres) / len(fres) >= 0.9

    # appended vectors land quantized and searchable
    new = spark.createDataFrame(
        [(9000, [float(x) for x in centers[0] + 0.01 * rng.standard_normal(32)])],
        "vec_id long, embedding array<float>",
    )
    ivf.append_to_index(new, qidx)
    resident = spark.read.parquet(str(tmp_path / "q_idx" / "vectors"))
    assert dict(resident.dtypes)["qvec"] == "array<tinyint>"
    after = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.search_index(spark, qidx, queries, k=5, n_probe=2).collect()
    }
    assert (0, 9000) in after


@pytest.mark.slow
def test_ivf_streaming_ingest_appends_to_index(spark, tmp_path):
    """File stream → index_ingest_batch_fn: streamed vectors are
    assigned into the persisted index's lists and immediately
    searchable."""
    import json
    import os

    import numpy as np

    from pythondataingestionprocess_spark.operators import ivf
    from pythondataingestionprocess_spark.streaming import file_ingest

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 10
    rows = [
        (i, [float(x) for x in centers[i % 8] + rng.standard_normal(32)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = ivf.kmeans_fit(df, k=8, max_iter=5)
    idx = str(tmp_path / "idx")
    ivf.save_index(df, centroids, idx)

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    new_vec = [float(x) for x in centers[3] + 0.01 * rng.standard_normal(32)]
    with open(os.path.join(inbox, "a.json"), "w") as f:
        f.write(json.dumps({"vec_id": 9000, "embedding": new_vec}) + "\n")

    stream = file_ingest.file_stream(
        spark, inbox, "vec_id long, embedding array<float>"
    )
    file_ingest.run_ingestion(
        stream, ivf.index_ingest_batch_fn(idx), str(tmp_path / "ckpt")
    ).awaitTermination(120)

    queries = df.filter(F.col("vec_id") == 3)
    got = {
        r["neighbor_id"]
        for r in ivf.search_index(spark, idx, queries, k=5, n_probe=2).collect()
    }
    assert 9000 in got


@pytest.mark.slow
def test_ivf_index_append_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering the same batch to
    index_ingest_batch_fn must append nothing (id anti-join against
    the touched lists), so top-k never sees duplicate neighbors."""
    import numpy as np

    from pythondataingestionprocess_spark.operators import ivf

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 10
    rows = [
        (i, [float(x) for x in centers[i % 8] + rng.standard_normal(32)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = ivf.kmeans_fit(df, k=8, max_iter=5)
    idx = str(tmp_path / "idx")
    ivf.save_index(df, centroids, idx)

    new = spark.createDataFrame(
        [(9000, [float(x) for x in centers[0] + 0.01 * rng.standard_normal(32)])],
        "vec_id long, embedding array<float>",
    )
    fn = ivf.index_ingest_batch_fn(idx)
    fn(new, 0)
    fn(new, 0)  # replay
    resident = spark.read.parquet(str(tmp_path / "idx" / "vectors"))
    assert resident.filter(F.col("vec_id") == 9000).count() == 1


@pytest.mark.slow
def test_ivf_compact_index_folds_files_and_preserves_search(spark, tmp_path):
    """r7 VERDICT item 5: the streaming append accretes one-plus file
    per touched list per batch; compact_index must fold the vectors
    table to one file per list, leave search results invariant, and
    clean up every staging leftover — including recovering a
    crash-orphaned __building_* dir as an INPUT."""
    import glob
    import os
    import shutil

    import numpy as np

    from pythondataingestionprocess_spark.operators import ivf

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((4, 16)) * 10
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.standard_normal(16)])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 3)
    centroids = ivf.kmeans_fit(df, k=4, max_iter=4)
    idx = str(tmp_path / "ivf_index")
    ivf.save_index(df, centroids, idx)

    # accrete: five appends, each touching every list
    for b in range(5):
        batch = spark.createDataFrame(
            [
                (1000 + 10 * b + j,
                 [float(x) for x in centers[j % 4] + rng.standard_normal(16)])
                for j in range(8)
            ],
            "vec_id long, embedding array<float>",
        )
        ivf.append_to_index(batch, idx)

    before_set = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.search_index(spark, idx, queries, k=5, n_probe=2).collect()
    }
    n_before = len(glob.glob(os.path.join(idx, "vectors", "*", "*.parquet")))

    fb, fa = ivf.compact_index(spark, idx)
    assert fb == n_before
    assert fa == 4  # one file per list
    assert not glob.glob(os.path.join(idx, "vectors__*"))

    after_set = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.search_index(spark, idx, queries, k=5, n_probe=2).collect()
    }
    assert after_set == before_set

    # idempotent: a second run is a no-op fold of an already-compact table
    fb2, fa2 = ivf.compact_index(spark, idx)
    assert (fb2, fa2) == (4, 4)

    # crash recovery: the only copy orphaned under a staging name must
    # fold back (leftovers are inputs)
    shutil.move(
        os.path.join(idx, "vectors"),
        os.path.join(idx, "vectors__building_cafe01"),
    )
    ivf.compact_index(spark, idx)
    recovered = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.search_index(spark, idx, queries, k=5, n_probe=2).collect()
    }
    assert recovered == before_set


@pytest.mark.slow
def test_ivf_refit_trigger_and_refit(spark, tmp_path):
    """needs_refit fires on list-size skew (hot list > threshold ×
    mean) and stays quiet on a balanced index; refit_index rebalances
    and preserves the stored-vector format marker."""
    import numpy as np

    from pythondataingestionprocess_spark.operators import ivf

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((4, 16)) * 10
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.standard_normal(16)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = ivf.kmeans_fit(df, k=4, max_iter=4)
    idx = str(tmp_path / "ivf_index")
    ivf.save_index(df, centroids, idx, quantized=True)
    assert ivf.needs_refit(spark, idx, skew_threshold=3.0) is False

    # drift: a flood of inserts near ONE center → hot list
    flood = spark.createDataFrame(
        [
            (5000 + j, [float(x) for x in centers[0] + rng.standard_normal(16)])
            for j in range(600)
        ],
        "vec_id long, embedding array<float>",
    )
    ivf.append_to_index(flood, idx)
    assert ivf.needs_refit(spark, idx, skew_threshold=3.0) is True

    # refit on the full float corpus rebalances and keeps IVF-SQ8
    full = df.unionByName(flood)
    ivf.refit_index(full, idx, k=4, max_iter=4)
    assert ivf.needs_refit(spark, idx, skew_threshold=3.0) is False
    assert ivf._index_quantized(spark, idx) is True
    got = ivf.search_index(
        spark, idx, df.filter(F.col("vec_id") < 2), k=3, n_probe=2
    )
    assert got.count() == 6


def test_packing_null_token_fails_with_clear_message(spark):
    """r13 review: a NULL token count used to die as an opaque
    int(NaN) ValueError deep in the pandas task; now the error names
    the column and group."""
    from pythondataingestionprocess_spark.operators.packing import (
        pack_documents_greedy,
    )

    df = spark.createDataFrame(
        [("s", 1, 10), ("s", 2, None)],
        "source string, doc_id long, n_tokens long",
    )
    with pytest.raises(Exception, match="n_tokens contains NULL"):
        pack_documents_greedy(df, "source", "doc_id", "n_tokens", 100).collect()


def test_packing_tied_order_col_is_deterministic(spark):
    """r13 review: duplicate order_col values across shuffle-ordered
    input made bin assignment run-to-run nondeterministic; the
    (order_col, token_col) stable sort pins a total order (rows tying
    on both keys are column-identical, so the output multiset is
    fixed)."""
    from pythondataingestionprocess_spark.operators.packing import (
        pack_documents_greedy,
        shard_by_offset,
    )

    rows = [("s", 7, t) for t in (60, 50, 40, 30)] + [("s", 8, 90)]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, n_tokens long"
    ).repartition(8)
    baseline = None
    for _ in range(3):
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["bin_id"], r["bin_fill"])
            for r in pack_documents_greedy(
                df, "source", "doc_id", "n_tokens", 100
            ).collect()
        )
        shards = sorted(
            (r["doc_id"], r["n_tokens"], r["start_offset"])
            for r in shard_by_offset(
                df, "source", "doc_id", "n_tokens", 100
            ).collect()
        )
        if baseline is None:
            baseline = (got, shards)
        assert (got, shards) == baseline


# Migrated from the retired `doc_packing_lookahead` driver face
# (RETIRED_R16 — the r15 VERDICT's named capacity lever: the slot now
# carries the snapshot-store change-feed face). The face's substance —
# an independent DuckDB recursive-CTE replay of the two-open-bin
# best-fit state machine, carrying both bin slots and the next-id
# counter as recursion state — is pinned HERE instead, at sf0.001.
_LOOKAHEAD_REPLAY_SQL = """
WITH RECURSIVE t AS (
  SELECT source, doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), walk AS (
  SELECT source, rn,
         CAST(0 AS BIGINT) AS a_id, n AS a_fill,
         CAST(NULL AS BIGINT) AS b_id, CAST(NULL AS BIGINT) AS b_fill,
         CAST(1 AS BIGINT) AS nid,
         CAST(0 AS BIGINT) AS out_bin, n AS out_fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn,
    CASE WHEN (w.a_fill + t.n <= 4096)
              AND (NOT (w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096)
                   OR (w.a_fill > w.b_fill OR (w.a_fill = w.b_fill AND w.a_id < w.b_id)))
         THEN w.a_id
         WHEN w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096 THEN w.a_id
         WHEN w.b_id IS NOT NULL
              AND (w.a_fill > w.b_fill OR (w.a_fill = w.b_fill AND w.a_id < w.b_id))
         THEN w.nid
         ELSE w.a_id END,
    CASE WHEN (w.a_fill + t.n <= 4096)
              AND (NOT (w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096)
                   OR (w.a_fill > w.b_fill OR (w.a_fill = w.b_fill AND w.a_id < w.b_id)))
         THEN w.a_fill + t.n
         WHEN w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096 THEN w.a_fill
         WHEN w.b_id IS NOT NULL
              AND (w.a_fill > w.b_fill OR (w.a_fill = w.b_fill AND w.a_id < w.b_id))
         THEN t.n
         ELSE w.a_fill END,
    CASE WHEN (w.a_fill + t.n <= 4096)
              AND (NOT (w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096)
                   OR (w.a_fill > w.b_fill OR (w.a_fill = w.b_fill AND w.a_id < w.b_id)))
         THEN w.b_id
         WHEN w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096 THEN w.b_id
         WHEN w.b_id IS NULL THEN w.nid
         WHEN (w.a_fill > w.b_fill OR (w.a_fill = w.b_fill AND w.a_id < w.b_id))
         THEN w.b_id
         ELSE w.nid END,
    CASE WHEN (w.a_fill + t.n <= 4096)
              AND (NOT (w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096)
                   OR (w.a_fill > w.b_fill OR (w.a_fill = w.b_fill AND w.a_id < w.b_id)))
         THEN w.b_fill
         WHEN w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096 THEN w.b_fill + t.n
         WHEN w.b_id IS NULL THEN t.n
         WHEN (w.a_fill > w.b_fill OR (w.a_fill = w.b_fill AND w.a_id < w.b_id))
         THEN w.b_fill
         ELSE t.n END,
    CASE WHEN (w.a_fill + t.n <= 4096)
              OR (w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096)
         THEN w.nid ELSE w.nid + 1 END,
    CASE WHEN (w.a_fill + t.n <= 4096)
              AND (NOT (w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096)
                   OR (w.a_fill > w.b_fill OR (w.a_fill = w.b_fill AND w.a_id < w.b_id)))
         THEN w.a_id
         WHEN w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096 THEN w.b_id
         WHEN w.b_id IS NULL THEN w.nid
         ELSE w.nid END,
    CASE WHEN (w.a_fill + t.n <= 4096)
              AND (NOT (w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096)
                   OR (w.a_fill > w.b_fill OR (w.a_fill = w.b_fill AND w.a_id < w.b_id)))
         THEN w.a_fill + t.n
         WHEN w.b_id IS NOT NULL AND w.b_fill + t.n <= 4096 THEN w.b_fill + t.n
         ELSE t.n END
  FROM walk w JOIN t ON t.source = w.source AND t.rn = w.rn + 1
)
SELECT source, out_bin AS bin_id, COUNT(*) AS n_docs,
       CAST(MAX(out_fill) AS BIGINT) AS bin_tokens
FROM walk GROUP BY 1, 2
"""


def test_lookahead_packing_matches_duckdb_state_machine_replay(spark, sf_dir):
    """operators/packing.pack_documents_lookahead vs the sequential
    DuckDB replay of the same comparator (fullest fitting bin, ties to
    the older bin; identical seal rule) — the retired driver face's
    oracle contract, kept as a pytest gate."""
    import duckdb

    from pythondataingestionprocess_spark.functions import text as _tx
    from pythondataingestionprocess_spark.operators.packing import (
        pack_documents_lookahead,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("source", "doc_id", _tx.token_count("text").alias("n_tokens"))
    packed = pack_documents_lookahead(t, "source", "doc_id", "n_tokens", 4096)
    got = sorted(
        (r["source"], r["bin_id"], r["n_docs"], r["bin_tokens"])
        for r in packed.groupBy("source", "bin_id").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("bin_fill").alias("bin_tokens"),
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(map(tuple, con.sql(_LOOKAHEAD_REPLAY_SQL).fetchall()))
    assert got == want


def test_sequential_bpe_face_matches_oracle(spark, sf_dir):
    """Migrated from the retired `text_bpe_merge_learn` driver face
    (RETIRED_R16 capacity lever — its oracle is byte-identical to the
    batched face's, so the driver ran the same comparison twice): the
    SEQUENTIAL learner path (_bpe_merge_face(batched=False)) must
    still hash-match the DuckDB set-based replay."""
    import duckdb

    from pythondataingestionprocess_spark.plans.llm_ops import (
        _BPE_LEARN_ORACLE,
        _bpe_merge_face,
    )

    got = sorted(
        map(tuple, _bpe_merge_face(spark, sf_dir, batched=False).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(map(tuple, con.sql(_BPE_LEARN_ORACLE).fetchall()))
    assert got == want


def test_auto_lsh_bits_calibration():
    """The self-tuning depth rule (r16): ceil(log2 n)+9 clamped to
    [12, 30] — pinned at the measured calibration points (22k → 24
    was the sf1 sweet spot; 220k → 27 measured at sf10) and at the
    int32 bucket-id ceiling."""
    from pythondataingestionprocess_spark.operators.dedup import auto_lsh_bits

    assert auto_lsh_bits(1) == 12
    assert auto_lsh_bits(8) == 12
    assert auto_lsh_bits(2200) == 21
    assert auto_lsh_bits(22000) == 24
    assert auto_lsh_bits(220000) == 27
    assert auto_lsh_bits(10**12) == 30  # clamped: int32 bucket ids


# ------------------------- replayable integer-Rademacher LSH (r17)


def test_rademacher_masks_pinned():
    """The md5 derivation is part of the face's oracle contract (the
    masks are inlined as literals in _COSINE_DUP_ORACLE) — pin three
    corners so a derivation change can't silently desynchronize the
    Spark plan from the SQL text."""
    m = sim.rademacher_masks(8, 30, 7)
    assert m[0][0] == 8745539433062548224
    assert m[0][1] == 606228660163895631
    assert m[7][29] == 8318247478224891782
    # bit 63 pinned zero: the inlined literal must never read negative
    # under SQL's arithmetic >> on signed 64-bit
    assert all(mask >= 0 and mask < (1 << 63) for row in m for mask in row)


def test_rademacher_buckets_match_duckdb_replay(spark, sf_dir):
    """Bucket assignment is bit-exact cross-engine: quantized integer
    dots make every intermediate an exactly-representable integer, so
    numpy GEMM (any blocking) and DuckDB's sequential list_sum agree
    to the last bit. This is the property that lets the cosine face's
    oracle replay the capped pipeline instead of trusting the cap."""
    import duckdb

    bits, n_tables, seed = 14, 4, 7
    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.vec_id, r.table, r.bucket)
        for r in sim.rademacher_bucket_rows(
            emb, "vec_id", "embedding",
            bits_per_table=bits, n_tables=n_tables, seed=seed,
        ).collect()
    }
    masks = sim.rademacher_masks(n_tables, bits, seed)
    sql = f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
      FROM read_parquet('{sf_dir}/embeddings.parquet')
    ), masks(t, j, m) AS (
      VALUES {sim.rademacher_masks_sql_values(masks)}
    ), dots AS (
      SELECT q.vec_id, masks.t, masks.j,
             list_sum(list_transform(range(1, 65),
               i -> qv[i] * (CASE WHEN ((m >> (i - 1)) & 1) = 1
                             THEN 1 ELSE -1 END))) AS dot
      FROM q, masks
    )
    SELECT vec_id, t,
           CAST(SUM(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << j)
                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
    FROM dots GROUP BY vec_id, t
    """
    want = {
        (int(v), int(t), int(b))
        for v, t, b in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want


@pytest.mark.parametrize("sf_dir_case", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_cosine_capped_face_recall_equals_exact_scan(spark, sf_dir_case):
    """Recall certificate for the capped face basis (r17): on the
    planted-dup corpus the capped Rademacher pipeline's output equals
    the exact O(n^2) cosine scan — the cap is enforced AND lossless
    here (dup-bearing buckets sit far under 64 members at auto bit
    depths). The driver oracle replays the capped pipeline; THIS test
    is what keeps that replay honest about recall."""
    import duckdb

    from pythondataingestionprocess_spark.plans import REGISTRY

    got = {
        (r.id_a, r.id_b)
        for r in REGISTRY["dedup_embedding_cosine"]
        .fn(spark, sf_dir_case)
        .collect()
    }
    exact_sql = f"""
    WITH corpus AS (
      SELECT vec_id, embedding
      FROM read_parquet('{sf_dir_case}/embeddings.parquet')
      UNION ALL
      SELECT vec_id + 1000000000000, embedding
      FROM read_parquet('{sf_dir_case}/embeddings.parquet') WHERE vec_id % 10 = 0
    ), v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
      FROM corpus
    )
    SELECT a.vec_id, b.vec_id
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(list_zip(a.e, b.e), z -> z[1] * z[2]))
        / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
           * sqrt(list_sum(list_transform(b.e, x -> x * x)))) >= 0.99
    """
    want = {(int(a), int(b)) for a, b in duckdb.connect().execute(exact_sql).fetchall()}
    assert got == want and len(got) > 0
