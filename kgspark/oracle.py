"""Single-node oracle: sequential ground truth for the Spark pipeline.

Runs the same pure functions as the Spark UDFs (kgspark.textops) in
document order, applying the reference's merge semantics:

  * entity dedup by exact name; labels accumulate (union, first-seen
    order); properties last-write-wins in (url, chunk_index) ingestion
    order — src/storage/neo4j_store.py:68-136 (MERGE ... SET e += props).
  * edges kept only when both endpoints exist as entities
    (neo4j_store.py:157-160), one edge per (source, type, target)
    (:161-169), relationship types sanitized (:8-16).

The Spark pipeline must reproduce `triples(pages)` exactly (P/R = 1.0
with exact-name linking) and `extracted_text` byte-identically per url.
"""

from __future__ import annotations

from typing import Any

from .textops import (
    chunk_id_for,
    chunk_text,
    extract_chunk,
    html_to_text,
    sanitize_label,
)


def extracted_text(page: dict[str, Any]) -> str:
    txt = html_to_text(page.get("html"))
    return txt if txt is not None else (page.get("text") or "")


def build_kg(
    pages: list[dict[str, Any]],
    chunk_size: int = 500,
    chunk_overlap: int = 100,
) -> dict[str, Any]:
    """Sequential reference pipeline: text -> chunks -> extract -> merge."""
    chunks_out: list[dict[str, Any]] = []
    nodes: dict[str, dict[str, Any]] = {}  # name -> {labels:[...], properties:{}}
    raw_edges: list[dict[str, Any]] = []
    mentions: list[tuple[str, str]] = []  # (chunk_id, name)

    for page in sorted(pages, key=lambda p: p["url"]):
        url = page["url"]
        text = extracted_text(page)
        for ch in chunk_text(text, chunk_size, chunk_overlap):
            cid = chunk_id_for(url, ch["chunk_index"])
            chunks_out.append({"url": url, "chunk_id": cid, **ch})
            result = extract_chunk(ch["text"])
            for node in result["nodes"]:
                name = node["properties"].get("name")
                if not name:  # neo4j_store.py:84-85 skips nameless nodes
                    continue
                mentions.append((cid, name))
                entry = nodes.setdefault(name, {"labels": [], "properties": {}})
                for lab in node["labels"]:
                    lab = sanitize_label(lab)
                    if lab not in entry["labels"]:
                        entry["labels"].append(lab)
                entry["properties"].update(node["properties"])  # last-write-wins
            for rel in result["relationships"]:
                raw_edges.append(
                    {
                        "chunk_id": cid,
                        "source": rel["source"],
                        "type": sanitize_label(rel["type"]),
                        "target": rel["target"],
                        "properties": dict(rel.get("properties") or {}),
                    }
                )

    # endpoint referential filter + (source, type, target) dedup
    edges: dict[tuple[str, str, str], dict[str, Any]] = {}
    for e in raw_edges:
        if e["source"] in nodes and e["target"] in nodes:
            key = (e["source"], e["type"], e["target"])
            if key in edges:
                edges[key]["properties"].update(e["properties"])
            else:
                edges[key] = e

    return {
        "chunks": chunks_out,
        "nodes": nodes,
        "mentions": sorted(set(mentions)),
        "edges": list(edges.values()),
        "triples": {(s, p, o) for (s, p, o) in edges},
    }


def precision_recall(
    got: set[tuple[str, str, str]], expected: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not got and not expected:
        return 1.0, 1.0
    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected) if expected else 1.0
    return precision, recall
