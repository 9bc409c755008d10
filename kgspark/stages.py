"""Spark DataFrame stages S1-S7 of the KG-construction pipeline.

Scale rationale per stage (this is the part the reference cannot do —
SURVEY.md §3.1 step 4e is O(entities+edges) sequential network calls):

  S1/S2/S3/S4 are narrow, shuffle-free map stages: `pages` has one row
  per url, so chunking needs NO groupBy — a `mapInPandas` that explodes
  each document into its chunks keeps the whole ingest path at zero
  shuffles until the first aggregation. All Python work is Arrow-batched
  (no per-row Python UDFs, per BASELINE.json input_hint).

  S7's aggregations are expressed so Spark's partial (map-side)
  aggregation stays effective on skewed entity names: label union is
  explode -> distinct -> collect_set (distinct combines map-side), and
  property last-write-wins is `max_by` over an explicit deterministic
  order key (url, chunk_index) — never arrival order — so output is
  invariant under any parallelism (two-cluster-size check). The endpoint
  referential filter is two semi-joins with an optional deterministic
  salting path for hot names, with AQE skew-join as backstop.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import CHUNK_OVERLAP, CHUNK_SIZE, EMBED_DIM
from .textops import (
    chunk_id_for,
    chunk_text,
    embed_text,
    extract_chunk,
    html_to_text,
    sanitize_label,
)

# ---------------------------------------------------------------------------
# S1 — HTML -> text (vectorized; byte-identical per url vs oracle)
# ---------------------------------------------------------------------------

def extract_text(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> + text (extracted).

    html=NULL rows fall back to the provided text column (fixture
    contract, FIXTURES.md §1). Replaces reference O1
    (src/processors/pdf_reader.py:9-45) with a columnar scan + Arrow UDF.
    """

    @F.pandas_udf("string")
    def html_to_text_udf(html: pd.Series) -> pd.Series:
        return html.map(html_to_text)

    return pages.withColumn(
        "text", F.coalesce(html_to_text_udf(F.col("html")), F.col("text"))
    ).select("url", "warc_ts", "text", "lang")


# ---------------------------------------------------------------------------
# S2 — chunking (grouped fold per document; zero shuffle: 1 row = 1 doc)
# ---------------------------------------------------------------------------

CHUNKS_DDL = (
    "url string, chunk_id string, chunk_index int, "
    "start_char long, end_char long, text string"
)


def chunk(
    docs: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    chunk_overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Explode each document into reference-semantics chunks
    (src/core/text_chunker.py:10-91 incl. start_char quirk).

    `mapInPandas` (not groupBy.applyInPandas): the input already has one
    row per url, so the sequential fold is per-row and needs no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for url, text in zip(pdf["url"], pdf["text"]):
                for ch in chunk_text(text, chunk_size, chunk_overlap):
                    out.append(
                        {
                            "url": url,
                            "chunk_id": chunk_id_for(url, ch["chunk_index"]),
                            "chunk_index": ch["chunk_index"],
                            "start_char": ch["start_char"],
                            "end_char": ch["end_char"],
                            "text": ch["text"],
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "chunk_id", "chunk_index",
                    "start_char", "end_char", "text",
                ],
            )

    return docs.select("url", "text").mapInPandas(run, schema=CHUNKS_DDL)


# ---------------------------------------------------------------------------
# S3 — embeddings (deterministic hashing featurizer; replaces OpenAI O8)
# ---------------------------------------------------------------------------

def embed(chunks: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    @F.pandas_udf("array<float>")
    def embed_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: embed_text(t, dim))

    return chunks.select(
        "url", "chunk_id", "chunk_index", embed_udf(F.col("text")).alias("embedding")
    )


# ---------------------------------------------------------------------------
# S4 — entity/relation extraction (deterministic rule extractor, O10/O11)
# ---------------------------------------------------------------------------

EXTRACTED_DDL = (
    "url string, chunk_id string, chunk_index int, kind string, "
    "name string, labels array<string>, properties map<string,string>, "
    "source string, type string, target string"
)


def extract(chunks: DataFrame) -> DataFrame:
    """One extraction pass emitting both mention rows (kind='mention')
    and edge rows (kind='edge') in a single UDF invocation — the table
    is materialized once and split by a pushdown-friendly `kind` filter,
    instead of running the extractor twice.
    """

    cols = [
        "url", "chunk_id", "chunk_index", "kind",
        "name", "labels", "properties", "source", "type", "target",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar accumulation: one python list per output column
            # (a list-of-dicts forces pandas to re-pivot row-wise, which
            # dominated this stage's profile at 10x corpus scale)
            c: dict[str, list] = {name: [] for name in cols}
            for url, cid, cidx, text in zip(
                pdf["url"], pdf["chunk_id"], pdf["chunk_index"], pdf["text"]
            ):
                cidx = int(cidx)
                result = extract_chunk(text)
                for node in result["nodes"]:
                    name = node["properties"].get("name")
                    if not name:  # neo4j_store.py:84-85
                        continue
                    c["url"].append(url)
                    c["chunk_id"].append(cid)
                    c["chunk_index"].append(cidx)
                    c["kind"].append("mention")
                    c["name"].append(name)
                    c["labels"].append(
                        [sanitize_label(l) for l in node["labels"]]
                    )
                    c["properties"].append(
                        {k: str(v) for k, v in node["properties"].items()}
                    )
                    c["source"].append(None)
                    c["type"].append(None)
                    c["target"].append(None)
                for rel in result["relationships"]:
                    c["url"].append(url)
                    c["chunk_id"].append(cid)
                    c["chunk_index"].append(cidx)
                    c["kind"].append("edge")
                    c["name"].append(None)
                    c["labels"].append(None)
                    c["properties"].append(
                        {
                            k: str(v)
                            for k, v in (rel.get("properties") or {}).items()
                        }
                    )
                    c["source"].append(rel["source"])
                    c["type"].append(sanitize_label(rel["type"]))
                    c["target"].append(rel["target"])
            yield pd.DataFrame(c, columns=cols)

    return chunks.select("url", "chunk_id", "chunk_index", "text").mapInPandas(
        run, schema=EXTRACTED_DDL
    )


def mentions_of(extracted: DataFrame) -> DataFrame:
    return extracted.filter(F.col("kind") == "mention").select(
        "url", "chunk_id", "chunk_index", "name", "labels", "properties"
    )


def raw_edges_of(extracted: DataFrame) -> DataFrame:
    return extracted.filter(F.col("kind") == "edge").select(
        "url", "chunk_id", "chunk_index", "source", "type", "target", "properties"
    )


# ---------------------------------------------------------------------------
# S7 — materialization: dedup agg + endpoint semi-joins + triples
# ---------------------------------------------------------------------------

def _order_key():
    # deterministic last-write-wins order (SURVEY.md §4.2-3): ingestion
    # order is undefined under parallelism, so order by (url, chunk_index)
    return F.struct(F.col("url"), F.col("chunk_index"))


def dedup_nodes(mentions: DataFrame, canonical: DataFrame | None = None) -> DataFrame:
    """Entity dedup by (canonical) name — reference O13
    (neo4j_store.py:68-136, MERGE on exact name).

    labels: explode -> distinct -> collect_set -> array_sort. The
    distinct pre-shrinks skewed keys map-side; sort makes output order
    deterministic (engine-defined divergence from the reference's
    first-seen label order — P/R only scores triples).
    properties: max_by over the explicit order key (last-write-wins).
    """
    m = mentions
    if canonical is not None:
        # rename before joining: canonical derives from the same mentions
        # lineage, so unaliased name==name would be a trivially-true
        # self-join predicate
        cmap = canonical.select(
            F.col("name").alias("__cn"), F.col("canonical_id").alias("__cid")
        )
        m = (
            m.join(cmap, m["name"] == cmap["__cn"], "left")
            .select(
                F.coalesce(F.col("__cid"), m["name"]).alias("cname"),
                m["name"].alias("name"),
                "url", "chunk_index", "labels", "properties",
            )
        )
    else:
        m = m.select(
            F.col("name").alias("cname"), "name",
            "url", "chunk_index", "labels", "properties",
        )

    labels = (
        m.select("cname", F.explode("labels").alias("label"))
        .distinct()
        .groupBy("cname")
        .agg(F.array_sort(F.collect_set("label")).alias("labels"))
    )
    props = m.groupBy("cname").agg(
        F.max_by("properties", _order_key()).alias("properties"),
        F.max_by("name", _order_key()).alias("name"),
    )
    return (
        props.join(labels, "cname")
        .select(
            F.col("cname").alias("canonical_id"), "name", "labels", "properties"
        )
    )


def endpoint_filter(
    edges: DataFrame,
    node_names: DataFrame,
    salt: int = 0,
) -> DataFrame:
    """Keep edges whose BOTH endpoints exist as entities — reference O14
    (neo4j_store.py:157-160, the two MATCH clauses before MERGE).

    Two left-semi hash joins. `node_names` (one row per distinct entity)
    is orders of magnitude smaller than the edge stream, so Catalyst
    broadcasts it when under the threshold; with `salt`>0 the build side
    is replicated `salt` ways and the probe side keyed by a deterministic
    pmod(xxhash64(chunk_id), salt) — a shuffle-skew guard for hot names
    when the name table is too big to broadcast. AQE skew-join stays on
    as backstop either way.
    """
    if salt > 1:
        salt_range = F.broadcast(
            node_names.sparkSession.range(salt).select(
                F.col("id").cast("int").alias("__s")
            )
        )
        salted_src = node_names.select(F.col("name").alias("__sn")).crossJoin(
            salt_range.select(F.col("__s").alias("__ss"))
        )
        salted_tgt = node_names.select(F.col("name").alias("__tn")).crossJoin(
            salt_range.select(F.col("__s").alias("__ts"))
        )
        probe = edges.withColumn(
            "__salt", F.pmod(F.xxhash64("chunk_id"), F.lit(salt)).cast("int")
        )
        step1 = probe.join(
            salted_src,
            (probe["source"] == salted_src["__sn"])
            & (probe["__salt"] == salted_src["__ss"]),
            "left_semi",
        )
        return step1.join(
            salted_tgt,
            (step1["target"] == salted_tgt["__tn"])
            & (step1["__salt"] == salted_tgt["__ts"]),
            "left_semi",
        ).drop("__salt")
    names_src = node_names.select(F.col("name").alias("__sn"))
    names_tgt = node_names.select(F.col("name").alias("__tn"))
    return edges.join(
        names_src, edges["source"] == names_src["__sn"], "left_semi"
    ).join(names_tgt, F.col("target") == names_tgt["__tn"], "left_semi")


def materialize_edges(
    raw_edges: DataFrame,
    nodes: DataFrame,
    canonical: DataFrame | None = None,
    salt: int = 0,
) -> DataFrame:
    """Canonicalize endpoints, apply the referential filter, dedup to one
    edge per (subj, pred, obj) with last-write-wins properties, and add
    subj_hash for subject-hash partitioning (north rule). Reference O14
    (neo4j_store.py:138-171)."""
    e = raw_edges
    if canonical is not None:
        c_src = canonical.select(
            F.col("name").alias("__sn"), F.col("canonical_id").alias("__sc")
        )
        c_tgt = canonical.select(
            F.col("name").alias("__tn"), F.col("canonical_id").alias("__tc")
        )
        e = (
            e.join(c_src, e["source"] == c_src["__sn"], "left")
            .join(c_tgt, e["target"] == c_tgt["__tn"], "left")
            .select(
                "url", "chunk_id", "chunk_index",
                F.coalesce("__sc", "source").alias("source"),
                "type",
                F.coalesce("__tc", "target").alias("target"),
                "properties",
            )
        )
    filtered = endpoint_filter(
        e, nodes.select(F.col("canonical_id").alias("name")), salt=salt
    )
    return (
        filtered.groupBy(
            F.col("source").alias("subj"),
            F.col("type").alias("pred"),
            F.col("target").alias("obj"),
        )
        .agg(F.max_by("properties", _order_key()).alias("properties"))
        .withColumn("subj_hash", F.xxhash64("subj"))
    )
