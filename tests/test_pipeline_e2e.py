"""End-to-end golden test: Spark pipeline vs single-node oracle on the
seeded synthetic pages corpus (SURVEY.md §5.2-4).

Asserts the north-rule invariants:
  * extracted text byte-identical per url,
  * chunks identical (incl. the start_char quirk),
  * triple P/R >= 0.95 (target 1.0 with exact-name linking),
  * node set identical, canonicalization = identity under exact linking.
"""

import pytest

from kgspark.fixtures import make_pages, pages_df
from kgspark.oracle import build_kg, extracted_text, precision_recall
from kgspark.pipeline import build_kg_frames

N_PAGES = 50


@pytest.fixture(scope="module")
def frames(spark):
    pages = pages_df(spark, N_PAGES, partitions=7)
    return build_kg_frames(spark, pages, link_mode="exact", salt=4)


@pytest.fixture(scope="module")
def oracle_kg():
    return build_kg(make_pages(N_PAGES))


def test_text_byte_identical(frames):
    got = {r["url"]: r["text"] for r in frames["docs"].collect()}
    pages = make_pages(N_PAGES)
    assert len(got) == N_PAGES
    for page in pages:
        assert got[page["url"]] == extracted_text(page), page["url"]


def test_chunks_match_oracle(frames, oracle_kg):
    got = sorted(
        (
            (r["url"], r["chunk_id"], r["chunk_index"], r["start_char"],
             r["end_char"], r["text"])
            for r in frames["chunks"].collect()
        )
    )
    exp = sorted(
        (
            (c["url"], c["chunk_id"], c["chunk_index"], c["start_char"],
             c["end_char"], c["text"])
            for c in oracle_kg["chunks"]
        )
    )
    assert got == exp


def test_embeddings_shape(frames):
    rows = frames["embeddings"].limit(5).collect()
    assert rows
    for r in rows:
        assert len(r["embedding"]) == 64
        norm = sum(x * x for x in r["embedding"]) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-5) or norm == 0.0


def test_triples_pr(frames, oracle_kg):
    got = {
        (r["subj"], r["pred"], r["obj"]) for r in frames["kg_edges"].collect()
    }
    p, r = precision_recall(got, oracle_kg["triples"])
    assert p >= 0.95 and r >= 0.95, (p, r, got ^ oracle_kg["triples"])
    assert p == 1.0 and r == 1.0  # exact-name linking must be lossless


def test_nodes_match_oracle(frames, oracle_kg):
    got = {r["name"]: r for r in frames["kg_nodes"].collect()}
    assert set(got) == set(oracle_kg["nodes"])
    for name, entry in oracle_kg["nodes"].items():
        assert sorted(got[name]["labels"]) == sorted(entry["labels"])
        assert dict(got[name]["properties"]) == entry["properties"]


def test_canonical_identity_under_exact_linking(frames):
    rows = frames["canonical"].collect()
    assert rows and all(r["name"] == r["canonical_id"] for r in rows)


def test_mentions_reference_chunks(frames):
    m = frames["mentions"]
    c = frames["chunks"]
    dangling = m.join(c, "chunk_id", "left_anti").count()
    assert dangling == 0


def test_ingest_chain_is_zero_shuffle(spark):
    """SCALE.md's core structural claim, locked as a regression test:
    S1->S4 (extract_text -> chunk -> embed -> extract) is a pure map
    chain — NO Exchange anywhere in the physical plan, so 100 TB of
    pages flows scan -> Arrow -> Python -> sink without touching the
    shuffle service."""
    from kgspark import stages
    from kgspark.fixtures import pages_df

    pages = pages_df(spark, 20)
    chunks = stages.chunk(stages.extract_text(pages))
    for df in (
        stages.embed(chunks),
        stages.raw_edges_of(stages.extract(chunks)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_no_per_row_python_udf_anywhere():
    """input_hint mandate, locked: vectorized pandas/Arrow UDFs only —
    no row-at-a-time F.udf / @udf in any engine module."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent / "kgspark"
    offenders = []
    for p in sorted(root.glob("*.py")):
        src = p.read_text()
        if re.search(r"(?<!pandas_)\budf\s*\(", src.replace("@F.pandas_udf", "")
                     .replace("F.pandas_udf", "").replace("pandas_udf", "")):
            offenders.append(p.name)
    assert offenders == []
