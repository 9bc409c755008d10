"""Query-side operators vs reference semantics (graphrag.py): score
normalization, fusion weights/ordering, k-hop expansion quirks."""

import pytest
from pyspark.sql import functions as F

from kgspark import query


def test_vector_topk_orders_and_limits(spark):
    emb = spark.createDataFrame(
        [("c0", [1.0, 0.0]), ("c1", [0.6, 0.8]), ("c2", [-1.0, 0.0])],
        "chunk_id string, embedding array<float>",
    )
    got = query.vector_topk(emb, [1.0, 0.0], k=2).collect()
    assert [r["chunk_id"] for r in got] == ["c0", "c1"]
    assert got[0]["score"] == pytest.approx(1.0)
    assert got[1]["score"] == pytest.approx(0.6)


def test_keyword_scores_tf(spark):
    chunks = spark.createDataFrame(
        [("c0", "court court contract"), ("c1", "nothing here"), ("c2", "court")],
        "chunk_id string, text string",
    )
    got = {r["chunk_id"]: r["score"] for r in
           query.keyword_scores(chunks, "Court contract", k=5).collect()}
    assert got == {"c0": 3.0, "c2": 1.0}


def test_keyword_query_tokenized_like_corpus(spark):
    # a punctuated query must yield the same [a-z0-9]+ terms the index
    # stores: "court, contract" used to produce the dead term "court,"
    chunks = spark.createDataFrame(
        [("c0", "court court contract"), ("c1", "nothing here")],
        "chunk_id string, text string",
    )
    got = {r["chunk_id"]: r["score"] for r in
           query.keyword_scores(chunks, "Court, contract!", k=5).collect()}
    assert got == {"c0": 3.0}
    idx = query.build_inverted_index(chunks)
    got_idx = {r["chunk_id"]: r["score"] for r in
               query.keyword_scores_from_index(idx, "Court, contract!", k=5).collect()}
    assert got_idx == {"c0": 3.0}
    assert query.query_terms("Court, contract!") == ["contract", "court"]


def test_keyword_fuzzy_recovers_typos(spark):
    # reference parity: ES fuzziness AUTO (elasticsearch_store.py:147-151)
    # — a one-edit typo ("contrct") still retrieves the intended chunk,
    # at the documented fuzzy weight; exact matches keep weight 1.0
    chunks = spark.createDataFrame(
        [("c0", "contract signed by court"), ("c1", "nothing here at all")],
        "chunk_id string, text string",
    )
    idx = query.build_inverted_index(chunks)
    exact = {r["chunk_id"]: r["score"] for r in
             query.keyword_scores_from_index(idx, "contrct", k=5).collect()}
    assert exact == {}  # exact path misses the typo entirely
    fuzzy = {r["chunk_id"]: r["score"] for r in
             query.keyword_scores_fuzzy(idx, "contrct", k=5).collect()}
    assert fuzzy == {"c0": pytest.approx(0.5)}  # tf=1 * fuzzy_weight
    # mixed query: exact term at weight 1.0 + typo'd term at 0.5
    mixed = {r["chunk_id"]: r["score"] for r in
             query.keyword_scores_fuzzy(idx, "court contrct", k=5).collect()}
    assert mixed == {"c0": pytest.approx(1.5)}


def test_fusion_reference_semantics(spark):
    # graphrag.py:117-168: vector normalized (1+s)/2, keyword s/10,
    # combined = 0.7v + 0.3k; missing side contributes 0
    v = spark.createDataFrame(
        [("a", 1.0), ("b", 0.0)], "chunk_id string, score double"
    )
    kw = spark.createDataFrame(
        [("b", 5.0), ("c", 20.0)], "chunk_id string, score double"
    )
    got = {r["chunk_id"]: r for r in query.fuse(v, kw, k=3).collect()}
    assert got["a"]["combined_score"] == pytest.approx(0.7 * 1.0)
    assert got["b"]["combined_score"] == pytest.approx(0.7 * 0.5 + 0.3 * 0.5)
    assert got["c"]["keyword_score"] == pytest.approx(1.0)  # clamped 20/10 -> 1
    assert got["c"]["combined_score"] == pytest.approx(0.3)


def test_entities_from_chunks_depth_parity_quirk(spark):
    # bipartite walk ends at entities -> max_depth=2 behaves like depth 1
    # (SURVEY.md §3.2-4, neo4j_store.py:339-345)
    mentions = spark.createDataFrame(
        [("k0", "E1"), ("k0", "E2"), ("k1", "E2"), ("k1", "E3"), ("k2", "E4")],
        "chunk_id string, name string",
    )
    d1 = {r["name"] for r in
          query.entities_from_chunks(mentions, ["k0"], max_depth=1).collect()}
    d2 = {r["name"] for r in
          query.entities_from_chunks(mentions, ["k0"], max_depth=2).collect()}
    d3 = {r["name"] for r in
          query.entities_from_chunks(mentions, ["k0"], max_depth=3).collect()}
    assert d1 == {"E1", "E2"}
    assert d2 == d1                       # parity quirk preserved
    assert d3 == {"E1", "E2", "E3"}       # one entity->chunk->entity hop


def test_related_entities_bounded_bfs(spark):
    edges = spark.createDataFrame(
        [("A", "R", "B"), ("B", "R", "C"), ("C", "R", "D"), ("X", "R", "Y")],
        "subj string, pred string, obj string",
    )
    d1 = {r["name"] for r in query.related_entities(edges, "A", 1).collect()}
    d2 = {r["name"] for r in query.related_entities(edges, "A", 2).collect()}
    assert d1 == {"B"}
    assert d2 == {"B", "C"}


def test_top_connected_entities(spark):
    edges = spark.createDataFrame(
        [("A", "R", "B"), ("A", "S", "C"), ("B", "R", "C")],
        "subj string, pred string, obj string",
    )
    nodes = spark.createDataFrame(
        [("A", "A", ["Entity"]), ("B", "B", ["Entity"]), ("C", "C", ["Entity"])],
        "canonical_id string, name string, labels array<string>",
    )
    got = query.top_connected_entities(edges, nodes, k=2).collect()
    assert [(r["canonical_id"], r["degree"]) for r in got] == [("A", 2), ("B", 2)]
    # scalar-only output contract: labels is comma-joined, not an array
    # (nested columns break the driver's pandas canonicalization)
    assert got[0]["labels"] == "Entity"
    assert all(not isinstance(v, list) for v in got[0].asDict().values())


def test_graphrag_query_cache_skips_recompute(spark, tmp_path, monkeypatch):
    """Reference graphrag.py:44-64: identical query+params within the
    TTL is served from cache. Evidence of zero recompute: after the
    first call, vector_topk is monkeypatched to raise — the cached
    second call must still succeed and match; a changed param or an
    expired TTL must recompute (and therefore raise)."""
    from kgspark.fixtures import pages_df
    from kgspark.io import TableIO
    from kgspark.pipeline import build_kg_frames

    frames = build_kg_frames(spark, pages_df(spark, 40), link_mode="exact")
    io = TableIO(str(tmp_path / "wh"))
    args = (frames["chunks"], frames["embeddings"], frames["mentions"],
            "court contract agreement")
    first = query.graphrag_search_cached(io, *args, top_k=3)
    assert first["cached"] is False
    hits1 = sorted((r["chunk_id"], round(r["combined_score"], 9))
                   for r in first["hits"].collect())

    def boom(*a, **kw):
        raise AssertionError("retrieval recomputed despite cache hit")

    monkeypatch.setattr(query, "vector_topk", boom)
    second = query.graphrag_search_cached(io, *args, top_k=3)
    assert second["cached"] is True
    hits2 = sorted((r["chunk_id"], round(r["combined_score"], 9))
                   for r in second["hits"].collect())
    assert hits1 == hits2
    # different params -> different key -> recompute path (raises)
    with pytest.raises(AssertionError, match="recomputed"):
        query.graphrag_search_cached(io, *args, top_k=4)
    # expired TTL -> recompute path (raises)
    with pytest.raises(AssertionError, match="recomputed"):
        query.graphrag_search_cached(io, *args, top_k=3, ttl_seconds=0.0)
    # a DIFFERENT corpus sharing the warehouse must never be served the
    # old corpus's cached hits — corpus_id is part of the key
    with pytest.raises(AssertionError, match="recomputed"):
        query.graphrag_search_cached(io, *args, top_k=3, corpus_id="rebuilt-v2")


def test_graph_stats_tidy_counts(spark):
    nodes = spark.createDataFrame(
        [("A", "A", ["Org"]), ("B", "B", ["Org", "Law"]), ("C", "C", ["Law"])],
        "canonical_id string, name string, labels array<string>",
    )
    edges = spark.createDataFrame(
        [("A", "R", "B"), ("A", "S", "C"), ("B", "R", "C")],
        "subj string, pred string, obj string",
    )
    got = {(r["dim"], r["key"]): r["n"]
           for r in query.graph_stats(nodes, edges).collect()}
    assert got[("total", "nodes")] == 3 and got[("total", "edges")] == 3
    assert got[("label", "Org")] == 2 and got[("label", "Law")] == 2
    assert got[("pred", "R")] == 2 and got[("pred", "S")] == 1


def test_graphrag_search_end_to_end(spark):
    """Full O19->O24 retrieval analog over a built KG (no LLM)."""
    from kgspark.fixtures import pages_df
    from kgspark.pipeline import build_kg_frames
    from kgspark.query import build_context, graphrag_search

    frames = build_kg_frames(spark, pages_df(spark, 60), link_mode="exact")
    out = graphrag_search(
        frames["chunks"], frames["embeddings"], frames["mentions"],
        "court contract agreement", top_k=5,
    )
    hits = out["hits"].collect()
    assert 0 < len(hits) <= 5
    # scores normalized and combined per reference weights
    for r in hits:
        assert 0.0 <= r["vector_score"] <= 1.0
        assert 0.0 <= r["keyword_score"] <= 1.0
        assert r["combined_score"] == pytest.approx(
            0.7 * r["vector_score"] + 0.3 * r["keyword_score"], abs=1e-9
        )
    # descending by combined score
    scores = [r["combined_score"] for r in hits]
    assert scores == sorted(scores, reverse=True)

    ents = out["entities"].collect()
    assert len(ents) <= 100

    ctx = build_context(out["hits"], out["entities"], frames["chunks"])
    assert ctx.startswith("Relevant text passages:")
    assert "[1] (score=" in ctx
    if ents:
        assert "Related entities:" in ctx
        assert f"- {ents[0]['name']}" in ctx

    # determinism across repeated invocations
    out2 = graphrag_search(
        frames["chunks"], frames["embeddings"], frames["mentions"],
        "court contract agreement", top_k=5,
    )
    assert sorted(map(tuple, hits)) == sorted(map(tuple, out2["hits"].collect()))
