"""Distributed BPE tokenizer training — learn merge rules over the
corpus word-frequency table.

The reference repo ships no tokenizer stage (its chunks go straight to
an external LLM, /root/reference/src/builders/graphrag.py); a
training-data engine needs one: the merge table a BPE learner emits is
the vocabulary artifact every downstream token-count / packing /
contamination op keys on.

Design (classic Sennrich BPE, Spark-first):

* Training state is the DISTINCT-WORD frequency table, not the corpus
  — one corpus-sized shuffle up front (word counts, map-side
  combinable), then every iteration touches only vocab-cardinality
  rows. At 10^12 documents the vocab table is ~10^7-10^8 rows; the
  corpus is never rescanned.
* Words are held as SPACE-JOINED symbol strings ("l o w e r"), so the
  per-iteration merge rewrite is one JVM `regexp_replace` — greedy
  left-to-right non-overlapping, exactly the sequential BPE merge
  order — with `\\Q..\\E`-quoted symbols so arbitrary punctuation
  survives. No Python in the loop.
* Pair counting: split -> adjacent-pair explode weighted by word
  count -> one map-side-combinable agg; the argmax pair is a 1-row
  TakeOrdered with a DETERMINISTIC tie-break (max count, then
  lexicographically smallest pair), so the learned merge list is
  stable across cluster sizes and engines.
* One driver round-trip per merge (the argmax row) — k merges = k
  tiny collects, the same driver-loop shape as pagerank/kmeans
  iterations. `localCheckpoint` per round truncates lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kgspark.dataops import norm_text


def _java_quote(sym: str) -> str:
    """Literal-quote a symbol for a Java regex (\\Q..\\E, with the
    embedded-\\E edge case split)."""
    return "\\Q" + sym.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _repl_quote(sym: str) -> str:
    """Quote a replacement string for Java Matcher (backslash, $)."""
    return sym.replace("\\", "\\\\").replace("$", "\\$")


def word_freq_table(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) corpus word-frequency table — the only corpus-sized
    pass BPE training makes."""
    return (
        documents.select(
            F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def bpe_train(
    documents: DataFrame,
    n_merges: int = 10,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Learn `n_merges` BPE merge rules from the corpus. Returns the
    merge table (rank, left, right, merged, pair_count) in learned
    order — deterministic under the (count desc, pair asc) tie-break.
    Stops early when no pair reaches `min_count`.
    """
    spark = documents.sparkSession
    vocab = (
        word_freq_table(documents, text_col)
        .select(
            # "lower" -> "l o w e r": symbols space-joined
            F.concat_ws(
                " ", F.split(F.col("word"), "(?!$)")
            ).alias("syms"),
            "n",
        )
        .localCheckpoint(eager=True)
    )
    merges = []
    for rank in range(n_merges):
        symarr = F.split(F.col("syms"), " ")
        # adjacent pairs via zip_with over two shifted slices — empty
        # for 1-symbol words (sequence(1, 0) would count DOWN under
        # Spark's auto-negative step and ANSI element_at would throw)
        tail_len = F.greatest(F.size(symarr) - 1, F.lit(0))
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice(symarr, 1, tail_len),
                    F.slice(symarr, 2, tail_len),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("pair"),
            "n",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        left, right = top[0]["pair"].split(" ")
        merged = left + right
        merges.append((rank, left, right, merged, int(top[0]["c"])))
        pat = (
            "(^|[ ])"
            + _java_quote(left)
            + " "
            + _java_quote(right)
            + "(?=[ ]|$)"
        )
        vocab = vocab.select(
            F.regexp_replace(
                F.col("syms"), pat, "$1" + _repl_quote(merged)
            ).alias("syms"),
            "n",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string,"
        " pair_count bigint",
    )


def bpe_encode(
    documents: DataFrame,
    merge_rules: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to the corpus: per-doc BPE token
    count (the \"tokens under MY tokenizer\" accounting every data-mix
    budget needs). The rewrite chain runs PER WORD inside a transform
    lambda — BPE merges never cross word boundaries — composed into
    ONE projection: zero shuffle, column-pruned scan."""

    def _word_token_count(w):
        col = F.concat_ws(" ", F.split(w, "(?!$)"))
        for left, right in merge_rules:
            pat = (
                "(^|[ ])"
                + _java_quote(left)
                + " "
                + _java_quote(right)
                + "(?=[ ]|$)"
            )
            col = F.regexp_replace(
                col, pat, "$1" + _repl_quote(left + right)
            )
        return F.size(F.split(col, " "))

    words = F.filter(
        F.split(norm_text(F.col(text_col)), " "), lambda w: w != ""
    )
    per_word = F.transform(words, _word_token_count)
    return documents.select(
        "doc_id",
        F.aggregate(
            per_word, F.lit(0), lambda acc, x: acc + x
        ).cast("bigint").alias("n_bpe_tokens"),
    )
