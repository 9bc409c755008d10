"""Deterministic synthetic `pages` corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Every row is a pure function of (seed, doc_id), so the corpus can be
generated identically by the single-node oracle, by a driver loop, or by
a Spark `mapInPandas` over a `spark.range(n)` — no shared RNG state, no
ordering sensitivity. ~10% of rows carry html=NULL (text-only rows);
`html_to_text(html)` reproduces `text` byte-for-byte by construction,
which is what the S1 byte-identity test asserts.

A configurable hot entity appears in ~30% of documents to exercise
skew salting (SURVEY.md §4.2-2).
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import random
from typing import Any

from .textops import RELATION_TRIGGERS

SEED = 42
LANGS = ["en", "es", "de", "fr", "zh"]
SOURCES = [f"src{i}" for i in range(20)]

GAZETTEER = [
    "Acme Corp",
    "Globex Corporation",
    "Initech LLC",
    "Umbrella Group",
    "Stark Industries",
    "Wayne Enterprises",
    "Civil Rights Act",
    "Clean Air Act",
    "Data Protection Regulation",
    "Securities Exchange Act",
    "Uniform Commercial Code",
    "Doe v. Smith",
    "Roe v. Wade",
    "Brown v. Board",
    "Supreme Court",
    "District Court",
    "Appellate Court",
    "John Doe",
    "Jane Roe",
    "Richard Miles",
    "Service Agreement",
    "Shuttle Contract",
    "Maple Partners",
    "Northwind Bank",
]

HOT_ENTITY = "Supreme Court"  # skew driver: ~30% of docs mention it

_TRIGGERS = sorted(set(RELATION_TRIGGERS))  # deterministic order

_FILLER = (
    "the quick brown fox jumps over a lazy dog while many small firms review "
    "annual filings and local analysts compare quarterly results across several "
    "regional markets noting steady growth in demand for new services"
).split()


def _doc_rng(doc_id: int, seed: int = SEED) -> random.Random:
    return random.Random((seed << 32) ^ doc_id)


def make_text(doc_id: int, seed: int = SEED, sent_scale: int = 1) -> str:
    """Sentence-structured prose with seeded entity mentions and relation
    trigger patterns ("X sues Y") so the rule extractor emits a known
    triple set.

    sent_scale multiplies the sentence count (default 1 keeps the
    historical corpus byte-identical). Benchmarks use sent_scale≈10 so a
    page carries ~6-12 KB of text like a real Common-Crawl capture,
    making the Python stages compute-bound rather than overhead-bound.
    """
    rng = _doc_rng(doc_id, seed)
    n_sent = rng.randint(6, 14) * sent_scale
    hot = (doc_id % 10) < 3
    sentences = []
    for i in range(n_sent):
        kind = rng.random()
        if kind < 0.45:  # relational sentence: filler ENT trigger ENT filler
            a = HOT_ENTITY if (hot and i == 0) else rng.choice(GAZETTEER)
            b = rng.choice(GAZETTEER)
            while b == a:
                b = rng.choice(GAZETTEER)
            trig = rng.choice(_TRIGGERS)
            lead = " ".join(rng.choices(_FILLER, k=rng.randint(2, 6)))
            tail = " ".join(rng.choices(_FILLER, k=rng.randint(2, 6)))
            sentences.append(f"{lead} {a} {trig} {b} {tail}.")
        elif kind < 0.6:  # mention-only sentence
            a = rng.choice(GAZETTEER)
            lead = " ".join(rng.choices(_FILLER, k=rng.randint(3, 8)))
            sentences.append(f"{lead} {a}.")
        else:  # pure filler
            words = rng.choices(_FILLER, k=rng.randint(6, 16))
            sentences.append(" ".join(words) + rng.choice([".", ".", "!", "?"]))
    # group into paragraphs of 2-4 sentences
    paras, i = [], 0
    while i < len(sentences):
        take = rng.randint(2, 4)
        paras.append(" ".join(sentences[i : i + take]))
        i += take
    return "\n\n".join(paras)


def make_html(text: str, title: str) -> bytes:
    parts = [f"<html><head><title>{_html.escape(title)}</title></head><body>"]
    for para in text.split("\n\n"):
        parts.append(f"<p>{_html.escape(para)}</p>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def make_page(
    doc_id: int, seed: int = SEED, sent_scale: int = 1
) -> dict[str, Any]:
    lang = LANGS[doc_id % len(LANGS)]
    source = SOURCES[doc_id % len(SOURCES)]
    url = f"https://example.org/{source}/{lang}/doc{doc_id}"
    text = make_text(doc_id, seed, sent_scale)
    html = None if doc_id % 10 == 7 else make_html(text, f"doc{doc_id}")
    ts = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(
        minutes=doc_id
    )
    return {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}


def make_pages(
    n: int, seed: int = SEED, sent_scale: int = 1
) -> list[dict[str, Any]]:
    return [make_page(i, seed, sent_scale) for i in range(n)]


PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(
    spark, n: int, seed: int = SEED, partitions: int | None = None,
    sent_scale: int = 1,
):
    """Distributed generation: spark.range(n) -> mapInPandas(make_page).

    Each output row depends only on its doc_id, so the result is
    invariant under partitioning/parallelism — required by the
    two-cluster-size identical-output check.
    """
    import pandas as pd  # noqa: PLC0415

    rng_seed = seed

    def gen(batches):
        for pdf in batches:
            rows = [make_page(int(i), rng_seed, sent_scale) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(gen, schema=PAGES_DDL)
