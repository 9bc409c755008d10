"""Checkpoint/resume (SURVEY.md §5.2-6): a re-run over the same corpus
skips every committed stage; a partially-committed warehouse resumes
from the last good snapshot; lineage rows exist per stage."""

import shutil

from kgspark.fixtures import make_pages, pages_df
from kgspark.oracle import build_kg
from kgspark.pipeline import Pipeline

N = 25
CORPUS = f"pages:n={N}:seed=42"


def test_run_then_resume_skips_all(spark, tmp_path):
    wh = str(tmp_path / "wh")
    pipe = Pipeline(wh)
    snaps1 = pipe.run(spark, pages_df(spark, N), CORPUS)
    assert pipe.last_skipped == []

    snaps2 = pipe.run(spark, None, CORPUS)  # no pages needed on resume
    assert snaps2 == snaps1
    assert set(pipe.last_skipped) == {"pages", *[t for t, _ in Pipeline.STAGES]}

    # output parity with the oracle survives the round-trip
    triples = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipe.io.read(spark, "kg_edges").collect()
    }
    assert triples == build_kg(make_pages(N))["triples"]


def test_partial_resume_from_mid_stage(spark, tmp_path):
    wh = str(tmp_path / "wh2")
    pipe = Pipeline(wh)
    snaps1 = pipe.run(spark, pages_df(spark, N), CORPUS)

    # simulate a crash after `extracted` committed: wipe downstream tables
    for table in ["canonical", "kg_nodes", "kg_edges"]:
        shutil.rmtree(f"{wh}/{table}")

    pipe2 = Pipeline(wh)
    snaps2 = pipe2.run(spark, None, CORPUS)
    assert set(pipe2.last_skipped) == {
        "pages", "docs", "chunks", "embeddings", "inverted_index", "extracted"
    }
    assert snaps2["extracted"] == snaps1["extracted"]

    triples = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipe2.io.read(spark, "kg_edges").collect()
    }
    assert triples == build_kg(make_pages(N))["triples"]


def test_lineage_rows_written(spark, tmp_path):
    wh = str(tmp_path / "wh3")
    pipe = Pipeline(wh)
    pipe.run(spark, pages_df(spark, N), CORPUS)
    lineage = pipe.lineage(spark).collect()
    stages_seen = {r["stage"] for r in lineage}
    assert {"docs", "chunks", "extracted", "kg_edges"} <= stages_seen
    for r in lineage:
        assert r["n_rows"] >= 0 and r["duration_ms"] >= 0
    # url counts present where the stage carries urls
    assert any(r["stage"] == "chunks" and r["n_urls"] > 0 for r in lineage)


def test_lineage_append_only_across_runs(spark, tmp_path):
    """Each run commits ONLY its own lineage delta; prior runs' rows
    are never rewritten (their snapshot files are untouched), and the
    lineage() union sees every run."""
    import glob
    import os

    wh = str(tmp_path / "wh4")
    pipe = Pipeline(wh)
    pipe.run(spark, pages_df(spark, N), CORPUS, run_id="r1")
    snap1_files = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{wh}/_lineage/s0000/*.parquet")
    }
    assert snap1_files
    # second run over a DIFFERENT corpus -> all stages rebuild
    pipe.run(spark, pages_df(spark, N + 5), f"pages:n={N + 5}:seed=42",
             run_id="r2")
    # run 1's snapshot files were not rewritten
    for p, mtime in snap1_files.items():
        assert os.path.getmtime(p) == mtime
    # run 2's delta holds only run 2; the union holds both
    last = {r["run_id"] for r in pipe.io.read(spark, "_lineage").collect()}
    assert last == {"r2"}
    all_runs = {r["run_id"] for r in pipe.lineage(spark).collect()}
    assert all_runs == {"r1", "r2"}


def test_append_equals_batch_union(spark, tmp_path):
    """Incremental uploads (reference MERGE semantics) are bit-
    equivalent to one batch run over the union corpus, re-uploaded
    urls are dropped, and an unchanged accumulation resumes."""
    full = pages_df(spark, 40)
    delta_a = pages_df(spark, 20)
    delta_b = full.join(delta_a.select("url"), "url", "left_anti")

    wa = str(tmp_path / "wh_append")
    pa = Pipeline(wa)
    pa.run_append(spark, delta_a, "d1")
    pa.run_append(spark, delta_b, "d2")

    wb = str(tmp_path / "wh_batch")
    pb = Pipeline(wb)
    pb.run(spark, full, "pages:n=40:seed=42")

    def triples(pipe):
        return {
            (r["subj"], r["pred"], r["obj"])
            for r in pipe.io.read(spark, "kg_edges").collect()
        }

    def nodes(pipe):
        return {
            (r["name"], tuple(sorted(r["labels"])))
            for r in pipe.io.read(spark, "kg_nodes").collect()
        }

    assert triples(pa) == triples(pb)
    assert nodes(pa) == nodes(pb)
    # accumulated chunks == batch chunks
    acc_chunks = {
        r["chunk_id"]
        for r in pa.io.read_accumulated(spark, "chunks").collect()
    }
    batch_chunks = {
        r["chunk_id"] for r in pb.io.read(spark, "chunks").collect()
    }
    assert acc_chunks == batch_chunks

    before = triples(pa)
    # re-uploading already-seen urls: delta dedups to empty, graph
    # unchanged
    pa.run_append(spark, delta_a, "d3")
    assert triples(pa) == before
    # idempotent re-run of a committed delta: everything resumes
    pa.run_append(spark, delta_b, "d2")
    assert set(pa.last_skipped) == {
        "pages", "docs", "chunks", "embeddings", "inverted_index",
        "extracted", "canonical", "kg_nodes", "kg_edges",
    }
