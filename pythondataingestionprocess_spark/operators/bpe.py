"""Distributed BPE merge learning (Sennrich, Haddow & Birch, ACL 2016
"Neural Machine Translation of Rare Words with Subword Units") — learn
a byte-pair-encoding merge table from a corpus, Spark-first.

The classic algorithm is a loop over the WORD-FREQUENCY table, not the
raw corpus — and that is exactly what makes it distributable:

1. **one corpus pass** builds ``(word, count)`` (explode whitespace
   tokens → groupBy) — after this the corpus is never touched again;
   the word table is vocabulary-sized (≪ corpus at any scale worth
   tokenizing).
2. each of the ``n_merges`` iterations is two vocabulary-sized steps:
   count-weighted adjacent-pair aggregation (map-side explode → one
   small shuffle) and an argmax (count DESC, then lexicographic — the
   deterministic tie-break), then the merge applies MAP-SIDE as one
   left-fold column expression over every word's symbol array.
3. driver state is the merge list itself — ``n_merges`` pairs, the
   artifact the method exists to produce (same bounded-driver-payload
   contract as k-means centroids / PQ codebooks / DSIR m-vectors).

The per-iteration word table is localCheckpointed so lineage stays
flat across iterations (the components.py iterative discipline).

``text_bpe_pair_counts`` (plans/llm_ops.py) is the single-iteration
pair-count face this module turns into the full training loop; the
BPE-ish regex tokenizer (functions/text.py) remains the APPLICATION
fast path for pretrained-style tokenization. Applying a learned table
to new text at scale is the standard rank-greedy loop over a merge
dict — a Pandas UDF in production; ``apply_merges`` here is the
expression form, sensible for modest merge counts (each merge is one
fold over the symbol array; the expression tree grows linearly with
``len(merges)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, per the paper

# expression-form application nests one fold per merge; past this the
# Catalyst tree is deep enough to risk codegen/analysis limits, so
# apply_merges fails loud instead of opaquely (r10 ADVICE)
MAX_EXPR_MERGES = 200


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, count)`` — the one corpus pass. Tokenization is
    UNICODE whitespace (``(?U)\\s+`` — Java's ``\\s`` is ASCII-only by
    default, but web text is full of NBSP and friends, and the
    pure-Python reference this module is pinned against splits on
    Unicode whitespace); empty fragments from leading/trailing
    separators are dropped, matching ``str.split()``."""
    return (
        docs.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(
            F.explode(F.split(F.lower(F.col(text_col)), r"(?U)\s+")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _init_symbols(word_col: str = "word") -> Column:
    """word → array of single-character symbols + the end marker."""
    return F.concat(
        F.split(F.col(word_col), ""),  # chars
        F.array(F.lit(END)),
    )


def _merge_fold(arr: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) → a+b inside a
    symbol array, as ONE aggregate fold: the accumulator carries the
    emitted prefix plus a single pending symbol ('' = none — symbols
    are never empty). 'aaaa' under (a,a) becomes (aa)(aa), the
    paper's greedy semantics."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    zero = F.struct(
        F.array().cast("array<string>").alias("acc"), F.lit("").alias("pend")
    )

    def step(st: Column, x: Column) -> Column:
        merged = F.struct(
            F.concat(st["acc"], F.array(lab)).alias("acc"), F.lit("").alias("pend")
        )
        hold = F.struct(st["acc"].alias("acc"), x.alias("pend"))
        emit_then_hold = F.struct(
            F.concat(st["acc"], F.array(st["pend"])).alias("acc"), x.alias("pend")
        )
        return (
            F.when((st["pend"] == la) & (x == lb), merged)
            .when(st["pend"] == F.lit(""), hold)
            .otherwise(emit_then_hold)
        )

    def finish(st: Column) -> Column:
        return F.when(st["pend"] == F.lit(""), st["acc"]).otherwise(
            F.concat(st["acc"], F.array(st["pend"]))
        )

    return F.aggregate(arr, zero, step, finish)


def _pair_counts(words: DataFrame) -> DataFrame:
    """Count-weighted adjacent-pair frequencies over the word table."""
    pairs = words.select(
        "count",
        F.explode(
            F.zip_with(
                F.slice("symbols", 1, F.size("symbols") - 1),
                F.slice("symbols", 2, F.size("symbols") - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("count").alias("n"))


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """The learned merge table, in order. Stops early when the best
    remaining pair falls under ``min_count`` (the paper's stopping
    criterion for tiny corpora)."""
    words = word_counts(docs, text_col).withColumn(
        "symbols", _init_symbols()
    ).select("symbols", "count").localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(
            _merge_fold(F.col("symbols"), a, b).alias("symbols"), "count"
        ).localCheckpoint(eager=True)
    return merges


def apply_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "subwords",
) -> DataFrame:
    """Tokenize words with a learned table: the merges apply in
    LEARNED ORDER (rank order ≡ greedy-by-rank for merges learned on
    the same corpus family), each as one fold — expression form for
    modest tables; production-scale application is a Pandas UDF over
    a rank dict."""
    if len(merges) > MAX_EXPR_MERGES:
        raise ValueError(
            f"apply_merges nests one aggregate fold per merge and "
            f"{len(merges)} merges would blow Catalyst's codegen/"
            f"analysis limits with an opaque failure; past "
            f"{MAX_EXPR_MERGES} use the rank-dict Pandas-UDF "
            f"application path (the production tokenizer loop)"
        )
    sym = _init_symbols(word_col)
    for a, b in merges:
        sym = _merge_fold(sym, a, b)
    return df.withColumn(out_col, sym)
