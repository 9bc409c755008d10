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
