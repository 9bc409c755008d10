"""BPE training parity: the distributed learner must emit the same
merge list, in the same order, as a sequential reference BPE over the
same corpus (Sennrich pair-count + greedy left-to-right merge,
tie-break max count then lexicographically smallest pair)."""

from collections import Counter

from pyspark.sql import functions as F

from kgspark.bpe import bpe_encode, bpe_train

DOCS_DDL = "doc_id long, text string, lang string"


def _ref_bpe(texts: list[str], n_merges: int, min_count: int = 2):
    """Sequential reference implementation over a word-freq dict."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w)] += 1
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), c = best
        if c < min_count:
            break
        merges.append((rank, left, right, left + right, c))
        new_vocab = Counter()
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    return merges


def test_bpe_matches_sequential_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide lower",
        "low new wide lowest",
    ]
    df = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)], DOCS_DDL
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(df, n_merges=8).orderBy("rank").collect()
    ]
    assert got == _ref_bpe(texts, 8)
    assert len(got) >= 4  # the corpus supports several real merges


def test_bpe_overlapping_pair_greedy_left_to_right(spark):
    # "aaaa" x3: pair (a,a) counts 3 per word = 9; merge gives "aa aa"
    # (greedy non-overlapping), next merge (aa,aa) -> "aaaa"
    df = spark.createDataFrame([(0, "aaaa aaaa aaaa", "en")], DOCS_DDL)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(df, n_merges=2).orderBy("rank").collect()
    ]
    assert got == _ref_bpe(["aaaa aaaa aaaa"], 2)
    assert got[0] == (0, "a", "a", "aa", 9)
    assert got[1] == (1, "aa", "aa", "aaaa", 3)


def test_bpe_min_count_stops_early(spark):
    df = spark.createDataFrame([(0, "ab cd ef", "en")], DOCS_DDL)
    assert bpe_train(df, n_merges=5, min_count=2).count() == 0


def test_bpe_encode_counts(spark):
    df = spark.createDataFrame(
        [(0, "low lower", "en"), (1, "", "en")], DOCS_DDL
    )
    merges = [("l", "o"), ("lo", "w")]
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode(df, merges).collect()
    }
    # "low" -> [low] (1); "lower" -> [low, e, r] (3); empty doc -> 0
    assert got == {0: 4, 1: 0}


def test_bpe_regex_safe_symbols(spark):
    # punctuation tokens must survive the \Q..\E quoting
    df = spark.createDataFrame(
        [(0, "a+b a+b a+b x.y x.y", "en")], DOCS_DDL
    )
    got = bpe_train(df, n_merges=3).orderBy("rank").collect()
    ref = _ref_bpe(["a+b a+b a+b x.y x.y"], 3)
    assert [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in got
    ] == ref
