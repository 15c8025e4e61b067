"""Distributed BPE merge learning (operators/bpe.py): the learned
merge sequence and final symbol tables match a from-scratch
pure-Python Sennrich reference exactly, ties break deterministically,
min_count stops early, and greedy same-symbol runs merge
left-to-right."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pythondataingestionprocess_spark.operators import bpe


# ---- pure-Python reference (Sennrich et al. 2016, alg. 1) ----------

def _py_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split():
            c[w] += 1
    return c


def _py_pairs(vocab):
    pairs = Counter()
    for sym, n in vocab.items():
        for a, b in zip(sym, sym[1:]):
            pairs[(a, b)] += n
    return pairs


def _py_merge(sym, a, b):
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _py_learn(texts, n_merges, min_count=2):
    vocab = {
        tuple(w) + (bpe.END,): n for w, n in _py_word_counts(texts).items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = _py_pairs(vocab)
        if not pairs:
            break
        # count DESC, then lexicographic (a, b) — the engine's tie-break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((a, b))
        vocab = {_py_merge(s, a, b): c for s, c in vocab.items()}
    return merges, vocab


TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.mark.slow
def test_merge_sequence_matches_python_reference(spark):
    expect, _ = _py_learn(TEXTS, n_merges=10)
    got = bpe.learn_bpe_merges(_docs(spark), n_merges=10)
    assert got == expect and len(got) == 10


def test_final_symbol_tables_match(spark):
    merges, vocab = _py_learn(TEXTS, n_merges=8)
    words = bpe.word_counts(_docs(spark))
    applied = {
        r["word"]: tuple(r["subwords"])
        for r in bpe.apply_merges(words, merges).collect()
    }
    expect = {
        w: _py_merge_all(w, merges) for w in _py_word_counts(TEXTS)
    }
    assert applied == expect
    # and the reference's own vocab agrees (sanity on the twin itself)
    for w, sym in expect.items():
        assert vocab[sym] == _py_word_counts(TEXTS)[w]


def _py_merge_all(word, merges):
    sym = tuple(word) + (bpe.END,)
    for a, b in merges:
        sym = _py_merge(sym, a, b)
    return sym


def test_min_count_stops_early(spark):
    # every word unique -> every pair count 1 < min_count=2 -> no merges
    docs = _docs(spark, ["abc def", "ghi jkl"])
    assert bpe.learn_bpe_merges(docs, n_merges=10, min_count=2) == []


def test_greedy_same_symbol_run(spark):
    # 'aaaa' under merge (a, a): greedy left-to-right -> (aa)(aa)
    docs = _docs(spark, ["aaaa aaaa aaaa"])
    merges = bpe.learn_bpe_merges(docs, n_merges=1, min_count=2)
    assert merges == [("a", "a")]
    words = bpe.word_counts(docs)
    got = bpe.apply_merges(words, merges).collect()[0]["subwords"]
    assert got == ["aa", "aa", bpe.END]


def test_unicode_whitespace_matches_python_split(spark):
    """r10 review (third pass): Java \\s is ASCII-only, Python
    str.split() is Unicode — an NBSP-joined corpus must tokenize
    identically on both sides or the pinned merge parity is vacuous."""
    texts = ["foo\u00a0bar foo", "baz\u2009foo bar"]  # NBSP / thin space mixed with ASCII
    expect = _py_word_counts(texts)
    got = {
        r["word"]: r["count"]
        for r in bpe.word_counts(_docs(spark, texts)).collect()
    }
    assert got == dict(expect)
    assert got == {"foo": 3, "bar": 2, "baz": 1}
    e_merges, _ = _py_learn(texts, n_merges=4)
    assert bpe.learn_bpe_merges(_docs(spark, texts), n_merges=4) == e_merges


def test_tiebreak_is_lexicographic(spark):
    # two pairs with equal counts: ('x','y') vs ('a','b') -> a,b wins
    docs = _docs(spark, ["xy xy ab ab"])
    merges = bpe.learn_bpe_merges(docs, n_merges=1, min_count=2)
    assert merges == [("a", "b")]


# ---- batched learner (r10 VERDICT item 4) --------------------------

# ~225-word syllabic corpus with varied counts: rich enough for 278
# sequential merges at min_count=2, so a 200-merge parity check runs
# deep into the table (validated against the reference above).
_SYL = ["ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
        "ka", "ke", "ki", "ko", "ku"]
BIG_TEXTS = [
    " ".join([s1 + s2] * ((i * 37) % 11 + 2))
    for i, (s1, s2) in enumerate(
        (a, b) for a in _SYL for b in _SYL
    )
]


@pytest.mark.slow
def test_batched_merge_sequence_parity_at_200(spark):
    """The batched path's certificate is lossless: 200 merges over the
    syllabic corpus come out IDENTICAL to the pure-Python sequential
    reference (r10 VERDICT item 4's done-bar)."""
    expect, _ = _py_learn(BIG_TEXTS, n_merges=200)
    assert len(expect) == 200
    stats: dict = {}
    got = bpe.learn_bpe_merges_batched(
        _docs(spark, BIG_TEXTS), n_merges=200, stats=stats
    )
    assert got == expect
    # jobs economy: each pass is one count job + one checkpoint job,
    # so passes must sit far below n_merges for batching to mean
    # anything — this corpus converges in a small multiple of its
    # natural batch structure (jobs-per-merge < 1).
    assert stats["passes"] < 100, stats
    assert sum(stats["batch_sizes"]) == 200
    assert max(stats["batch_sizes"]) > 1


@pytest.mark.slow
def test_batched_matches_sequential_spark_small(spark):
    seq = bpe.learn_bpe_merges(_docs(spark), n_merges=10)
    bat = bpe.learn_bpe_merges_batched(_docs(spark), n_merges=10)
    assert bat == seq and len(bat) == 10


def test_batched_self_merge_bound(spark):
    """The (a,a)-style self-merge is its own progenitor: merging it
    spawns (aa,aa) pairs worth up to half its count, which no other
    snapshot pair bounds. Corpus built so a naive disjointness-only
    batch would accept ('e','f') next, while sequential correctly
    picks ('aa','aa') — the batched path must match sequential."""
    texts = ["aaaaaaaaa"] * 3 + ["ef"] * 5
    expect, _ = _py_learn(texts, n_merges=4)
    got = bpe.learn_bpe_merges_batched(_docs(spark, texts), n_merges=4)
    assert got == expect
    # the scenario really exercises the bound: the second sequential
    # merge is the self-merge's child pair, not the disjoint ('e','f')
    assert expect[0] == ("a", "a") and expect[1] == ("aa", "aa")


def test_vectorized_apply_matches_expression_form(spark):
    """The rank-dict mapInPandas applier (the production path past
    MAX_EXPR_MERGES) emits exactly the expression fold's output —
    rank-greedy == learned-order application."""
    merges = bpe.learn_bpe_merges(_docs(spark), n_merges=8)
    words = bpe.word_counts(_docs(spark))
    expr = {
        r["word"]: tuple(r["subwords"])
        for r in bpe.apply_merges(words, merges).collect()
    }
    vec = {
        r["word"]: tuple(r["subwords"])
        for r in bpe.apply_merges_vectorized(words, merges).collect()
    }
    assert vec == expr


def test_apply_merges_guard_past_expression_depth(spark):
    words = bpe.word_counts(_docs(spark))
    fake = [(str(i), str(i)) for i in range(bpe.MAX_EXPR_MERGES + 1)]
    with pytest.raises(ValueError, match="Pandas-UDF"):
        bpe.apply_merges(words, fake)
    # the vectorized path takes the same table without complaint
    assert bpe.apply_merges_vectorized(words, fake).count() > 0


def test_vectorized_apply_leaves_input_schema_intact(spark):
    """r11 VERDICT 1: StructType.add mutates in place and PySpark
    caches df.schema, so building the output schema via
    df.schema.add corrupted the INPUT frame. Pin: the input schema is
    unchanged and the input frame still selects cleanly after the
    call."""
    words = bpe.word_counts(_docs(spark))
    before = words.schema.jsonValue()
    merges = bpe.learn_bpe_merges(_docs(spark), n_merges=3)
    out = bpe.apply_merges_vectorized(words, merges)
    assert words.schema.jsonValue() == before
    assert [f.name for f in words.schema.fields] == ["word", "count"]
    # the poisoned-schema failure mode was UNRESOLVED_COLUMN on ANY
    # subsequent use of the input frame — prove it still works
    assert words.select("word", "count").count() > 0
    assert out.schema.fieldNames()[-1] == "subwords"


@pytest.mark.slow
def test_apply_merges_between_analyzer_cap_and_guard(spark):
    """r12: >~99 nested folds in one select trip the analyzer's
    100-iteration Resolution cap, far below MAX_EXPR_MERGES — the
    chunked application must survive the full guarded range and agree
    with the vectorized path."""
    words = bpe.word_counts(_docs(spark))
    fake = [(str(i), str(i)) for i in range(150)]  # no-op merges on this corpus
    expr = {
        r["word"]: tuple(r["subwords"])
        for r in bpe.apply_merges(words, fake).collect()
    }
    vec = {
        r["word"]: tuple(r["subwords"])
        for r in bpe.apply_merges_vectorized(words, fake).collect()
    }
    assert expr == vec
    assert expr["low"] == ("l", "o", "w", bpe.END)


def test_batched_within_batch_concat_collision(spark):
    """r11 ADVICE (medium): two same-batch merges with EQUAL
    concatenations — reachable when the corpus contains the END-marker
    characters, e.g. ('x','</w>') vs ('x<','/w>') in HTML-ish text —
    would poison the no-increase certificate for later candidates.
    The batch must stop at the collision and still match sequential.

    Corpus construction (hand-traced): the word 'x' yields the pair
    (x, </w>); literal mid-text 'x</w>?' words drive the char merges
    (x,<), (/,w), (/w,>) so the symbols 'x<' and '/w>' exist, making
    (x<, /w>) a candidate whose concat equals (x, </w>)'s. Counts are
    tuned so BOTH land in the SAME batch (footprint-clean,
    spawn-clean) — and the 'kx'/'kx</w>' words make the collision
    consequential: after both merges, (k, x</w>) has TWO progenitors
    (6 + 5 = 11), beating the next clean candidate (g,h)=10, so a
    batch that fails to stop at the collision diverges from
    sequential."""
    texts = (
        ["x"] * 6 + ["x</w>n"] * 4 + ["x</w>p"] * 5 + ["x</w>r"] * 4
        + ["zx<"] * 5 + ["gh"] * 10 + ["kx"] * 6 + ["kx</w>"] * 5
    )
    expect, _ = _py_learn(texts, n_merges=8)
    stats: dict = {}
    got = bpe.learn_bpe_merges_batched(
        _docs(spark, texts), n_merges=8, stats=stats
    )
    assert got == expect
    # the within-batch collision really occurs: two DISTINCT learned
    # pairs share one concatenation string, and they landed together
    assert ("x<", "/w>") in got and ("x", bpe.END) in got
    concats = [a + b for a, b in got]
    assert len(concats) != len(set(concats)), got


def test_certificate_fuzz_parity_pure_python():
    """r12: the sharpened certificate (exact footprint + spawned-pair
    lex-beat + collision guards) fuzz-tested WITHOUT Spark — a pure-
    Python batched driver around the real `_select_parity_batch`
    against the sequential reference, 200 seeded random corpora over
    the adversarial alphabet 'ab</w>' (END-marker characters in-band:
    maximal collision / self-merge / tie pressure), with small top_t
    values exercising the threshold guard. Any divergence is a
    soundness hole in the certificate itself."""
    import random

    def py_batched(wc, n_merges, min_count, top_t):
        vocab = {tuple(w) + (bpe.END,): n for w, n in wc.items()}
        merges, created = [], {bpe.END}
        while len(merges) < n_merges:
            pairs = _py_pairs(vocab)
            if not pairs:
                break
            rows = sorted(
                ((a, b, n) for (a, b), n in pairs.items()),
                key=lambda r: (-r[2], r[0], r[1]),
            )[:top_t]
            if rows[0][2] < min_count:
                break
            threshold = rows[-1][2] if len(rows) == top_t else 0
            batch = bpe._select_parity_batch(
                rows, threshold, created,
                min(n_merges - len(merges), bpe.MAX_EXPR_MERGES), min_count,
            )
            if not batch:
                break
            for a, b in batch:
                merges.append((a, b))
                created.add(a + b)
                vocab = {_py_merge(s, a, b): c for s, c in vocab.items()}
        return merges

    def py_learn_wc(wc, n_merges, min_count):
        vocab = {tuple(w) + (bpe.END,): n for w, n in wc.items()}
        merges = []
        for _ in range(n_merges):
            pairs = _py_pairs(vocab)
            if not pairs:
                break
            (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            if n < min_count:
                break
            merges.append((a, b))
            vocab = {_py_merge(s, a, b): c for s, c in vocab.items()}
        return merges

    alphabet = list("ab</w>")
    for seed in range(200):
        rng = random.Random(seed)
        wc: dict[str, int] = {}
        for _ in range(rng.randint(3, 25)):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            wc[w] = wc.get(w, 0) + rng.randint(1, 6)
        n_merges = rng.randint(1, 40)
        min_count = rng.choice([1, 2])
        top_t = rng.choice([4, 8, 512])
        expect = py_learn_wc(dict(wc), n_merges, min_count)
        got = py_batched(dict(wc), n_merges, min_count, top_t)
        assert got == expect, (seed, wc, n_merges, min_count, top_t)
