"""Parallelism-invariance (SURVEY.md §5.2-5): identical stage contents
regardless of input partitioning — the sandbox proxy for the
two-cluster-size identical-output requirement."""

from kgspark.fixtures import pages_df
from kgspark.pipeline import build_kg_frames

N = 40


def _signatures(spark, partitions):
    frames = build_kg_frames(
        spark, pages_df(spark, N, partitions=partitions), cache=False
    )
    sig = {}
    sig["chunks"] = sorted(
        (r["chunk_id"], r["start_char"], r["text"])
        for r in frames["chunks"].collect()
    )
    sig["nodes"] = sorted(
        (r["canonical_id"], r["name"], tuple(r["labels"]),
         tuple(sorted(r["properties"].items())))
        for r in frames["kg_nodes"].collect()
    )
    sig["edges"] = sorted(
        (r["subj"], r["pred"], r["obj"], r["subj_hash"],
         tuple(sorted(r["properties"].items())))
        for r in frames["kg_edges"].collect()
    )
    return sig


def test_output_invariant_under_partitioning(spark):
    a = _signatures(spark, 2)
    b = _signatures(spark, 13)
    assert a["chunks"] == b["chunks"]
    assert a["nodes"] == b["nodes"]
    assert a["edges"] == b["edges"]


def test_corpus_ops_invariant_under_partitioning(spark):
    """The r3 corpus operators must emit identical rows at any input
    partitioning — the property that makes their outputs valid
    training-set decisions on clusters of any size."""
    from pyspark.sql import functions as F

    from kgspark import dataops
    from kgspark.bpe import bpe_train

    rows = [
        (i,
         ("spark shuffles data across partitions " * (1 + i % 3))
         + f"unique token{i} tail{i % 7}",
         "en")
        for i in range(60)
    ]
    ddl = "doc_id long, text string, lang string"

    def run(parts):
        d = spark.createDataFrame(rows, ddl).repartition(parts)
        out = {}
        out["pd"] = sorted(map(tuple, dataops.paragraph_dedup(
            d, min_docs=2, mode="window", words_per_para=4).collect()))
        out["lm"] = sorted(map(tuple, dataops.unigram_lm_score(d).collect()))
        out["qc"] = sorted(map(tuple, dataops.quality_classifier(d).collect()))
        out["pj"] = sorted(map(tuple, dataops.prefix_jaccard_join(
            d, threshold=0.3).collect()))
        out["ws"] = [tuple(r) for r in dataops.weighted_sample(
            d.withColumn("w", F.length("text").cast("double")), "w", k=20
        ).collect()]  # ordered output must match exactly
        out["bpe"] = [tuple(r) for r in bpe_train(
            d, n_merges=5).orderBy("rank").collect()]
        out["ent"] = sorted(map(tuple, dataops.char_entropy(d).collect()))
        out["ck"] = tuple(dataops.table_checksum(
            d, cols=["doc_id", "text"]).first())
        return out

    a, b = run(2), run(11)
    for k in a:
        assert a[k] == b[k], f"{k} differs across partitioning"
