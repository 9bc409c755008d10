"""Large-scale training-data pipeline operators over the `documents`
and `embeddings` tables — first-class components alongside the KG
stages: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard),
similarity search (brute-force + IVF-bucketed ANN), and text analysis
(language-ID, quality scoring, token counting, fingerprinting).

Design rules:
  * every SQL-expressible operator stays 100% JVM-side (built-in
    functions only) so it is Catalyst-optimized AND cross-checkable
    against a DuckDB oracle;
  * near-dup candidate generation never enumerates O(n^2) pairs — LSH
    band buckets / IVF cells key the only shuffle;
  * Python appears only where vectorization genuinely needs it
    (SimHash bit-packing), always as an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# normalization / fingerprinting / token stats (all JVM-side)
# ---------------------------------------------------------------------------

def norm_text(col):
    """Whitespace-collapsed, lowercased, trimmed text — the shared
    normalization for fingerprints and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def md5_hash60(col):
    """THE engine-portable 60-bit hash (md5 / first 15 hex chars):
    Spark `conv(substring(md5(x),1,15),16,10)::long` ==
    DuckDB `('0x'||substring(md5(x),1,15))::BIGINT`. Every operator
    that needs a cross-engine-checkable hash (bucketing, sampling,
    checksums, seeded MinHash via its own prefixed variant) MUST go
    through this one construction — a drifted copy silently breaks
    Spark/DuckDB oracle parity."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def fingerprints(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of normalized text."""
    return documents.select(
        "doc_id", F.md5(norm_text(F.col("text"))).alias("fingerprint")
    )


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword proxy
    (runs of letters, digits, or single punctuation marks)."""
    t = F.col("text")
    ws_tokens = F.size(F.split(F.trim(t), r"\s+"))
    # number of regex matches == size(split-by-pattern) - 1; identical
    # trick works in the DuckDB oracle (len(regexp_split_to_array)-1)
    bpe_tokens = F.size(F.split(F.lower(t), r"[a-z]+|[0-9]+|[^a-z0-9\s]", -1)) - 1
    return documents.select(
        "doc_id",
        F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(ws_tokens)
        .cast("bigint").alias("n_ws_tokens"),
        F.length(t).cast("bigint").alias("n_chars"),
        bpe_tokens.cast("bigint").alias("n_bpe_pieces"),
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact deduplication by content hash: one representative (min
    doc_id) per normalized-text fingerprint + duplicate count.
    Hash-groupBy with map-side partial agg — the scale-canonical shape."""
    return (
        documents.select(
            F.md5(norm_text(F.col("text"))).alias("fingerprint"), "doc_id"
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup over word shingles (JVM-side; no MLlib)
# ---------------------------------------------------------------------------

def word_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """Distinct n-word shingles per document, built with JVM functions:
    split -> sliding window via transform over an index sequence."""
    words = F.split(norm_text(F.col("text")), " ")
    n_sh = F.greatest(F.size(words) - (n - 1), F.lit(1))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_sh - 1),
            # slice tolerates short arrays (docs with < n words yield one
            # shingle = the whole text) — same semantics as the DuckDB
            # oracle's words[i:i+n-1] slice
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )
    return documents.select(
        "doc_id", F.explode(shingles).alias("shingle")
    ).filter(F.col("shingle") != "")


def _seeded_hash64(col, seed: int, hash_mode: str):
    """64-bit seeded hash of a string column. "xxhash64" is the scale
    default (JVM-native, fastest). "md5" is the engine-portable mode:
    first 15 hex chars of md5("<seed>|" + value) as a bigint — bit-
    identical in Spark (conv base16) and DuckDB (('0x'||hex)::BIGINT),
    which makes MinHash results oracle-checkable cross-engine."""
    if hash_mode == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), col)), 1, 15), 16, 10
    ).cast("long")


def _band_sig(cols, band: int, hash_mode: str):
    """Bucket key for one band: hash of the band id + its signature
    slice (decimal-rendered in md5 mode, identically in both engines)."""
    if hash_mode == "xxhash64":
        return F.xxhash64(F.lit(band), *cols)
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(band)), *[c.cast("string") for c in cols])),
            1, 15,
        ),
        16, 10,
    ).cast("long")


def minhash_near_dup(
    documents: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.7,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """MinHash signatures -> banded buckets -> candidate pairs ->
    exact-Jaccard verification. Identical algorithmic shape to
    kgspark.linking.lsh_candidate_edges but over documents; the bucket
    join is the only shuffle touching pairs. hash_mode="md5" swaps the
    hash for an engine-portable one (same candidates in DuckDB SQL) —
    use it for cross-engine verification, xxhash64 in production."""
    rows_per_band = n_hashes // bands
    sh = word_shingles(documents, shingle_n)

    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(_seeded_hash64(F.col("shingle"), i, hash_mode)).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    buckets = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_sig(
                            [
                                F.col(f"h{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                            b, hash_mode,
                        ).alias("sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.sig")

    left = buckets.select("band", "sig", F.col("doc_id").alias("doc_a"))
    right = buckets.select(
        F.col("band").alias("band2"), F.col("sig").alias("sig2"),
        F.col("doc_id").alias("doc_b"),
    )
    cands = (
        left.join(
            right,
            (left["band"] == right["band2"])
            & (left["sig"] == right["sig2"])
            & (left["doc_a"] < right["doc_b"]),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return ngram_jaccard(cands, sh, threshold)


def ngram_jaccard(
    candidate_pairs: DataFrame, shingles: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """Exact n-gram Jaccard for given candidate pairs: two shingle joins
    for the intersection, a size join for the union."""
    sa = shingles.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    sb = shingles.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("sh_b"))
    inter = (
        candidate_pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("sh_a") == F.col("sh_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a", "doc_b",
            (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")))
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def near_dup_clusters(
    documents: DataFrame, threshold: float = 0.7, **minhash_kwargs
) -> DataFrame:
    """Near-duplicate CLUSTERING — the production dedup shape: MinHash
    candidate pairs above the Jaccard threshold form an edge list;
    connected components merge transitive chains (A~B~C collapses even
    when A~C alone misses the threshold); the cluster representative is
    the minimum doc_id. Returns (doc_id, keep_doc_id, is_dup).

    Composes minhash_near_dup with the same CC used for entity
    canonicalization (cc.connected_components) — one skew-safe iterative
    primitive for both jobs."""
    from .cc import connected_components  # noqa: PLC0415

    pairs = minhash_near_dup(documents, threshold=threshold, **minhash_kwargs)
    # CC runs on string labels; recover the ORIGINAL doc_id by joining
    # the component labels back on the stringified key instead of
    # casting back (a cast would silently NULL any non-numeric doc_id —
    # the function is otherwise generic over the id type)
    ids = documents.select(
        "doc_id", F.col("doc_id").cast("string").alias("name")
    )
    edges = pairs.select(
        F.col("doc_a").cast("string").alias("name_a"),
        F.col("doc_b").cast("string").alias("name_b"),
    )
    comp = (
        connected_components(ids.select("name"), edges)
        .join(ids, "name")
        .select("doc_id", F.col("canonical_id").alias("__comp"))
    )
    # canonical_id is the lexicographic min of STRING ids; re-derive the
    # numeric min per component as the representative (agg + join keeps
    # map-side partial agg in play; no window over skewed components)
    reps = comp.groupBy("__comp").agg(F.min("doc_id").alias("keep_doc_id"))
    return comp.join(reps, "__comp").select(
        "doc_id", "keep_doc_id",
        (F.col("doc_id") != F.col("keep_doc_id")).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# SimHash near-dup (Arrow-batched pandas UDF for the bit packing)
# ---------------------------------------------------------------------------

def _simhash_jvm(documents: DataFrame) -> DataFrame:
    """Fully-JVM 64-bit SimHash: explode word tokens -> xxhash64 per
    token -> 64 bit-vote sums in ONE hash aggregate (map-side partial
    agg collapses hot docs' tokens locally) -> sign-bit signature. No
    Python anywhere — the production mode; the md5 pandas path stays
    for bit-exact cross-engine oracle checks.

    Zero-token docs get all-ones signatures (votes coalesce to 0 and
    0 >= 0 sets every bit), identical to the md5-mode convention."""
    toks = documents.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = F.xxhash64("tok")
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for j in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.coalesce(F.col(f"v{j}"), F.lit(0)) >= 0,
                F.shiftleft(F.lit(1).cast("long"), j),
            ).otherwise(F.lit(0).cast("long"))
        )
    return (
        documents.select("doc_id")
        .join(votes, "doc_id", "left")
        .select("doc_id", sig.alias("simhash"))
    )


def simhash(
    documents: DataFrame, bits: int = 64, hash_mode: str = "xxhash64"
) -> DataFrame:
    """64-bit SimHash over word tokens. hash_mode="xxhash64" (default)
    is the production path: token hash + bit votes entirely JVM-side.
    hash_mode="md5" hashes per token with md5 inside an Arrow-batched
    pandas UDF — slower, but bit-identical to a DuckDB SQL oracle
    (('0x'||substr(md5,1,16))::UBIGINT), which is what the driver's
    correctness gate checks."""
    if hash_mode == "xxhash64":
        if bits != 64:
            raise ValueError("JVM simhash supports bits=64 only")
        return _simhash_jvm(documents)
    import numpy as np  # noqa: PLC0415

    @F.pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        import hashlib  # noqa: PLC0415

        out = []
        for t in texts:
            votes = np.zeros(bits, dtype=np.int64)
            for tok in (t or "").lower().split():
                d = hashlib.md5(tok.encode("utf-8")).digest()
                h = int.from_bytes(d[:8], "big")
                bs = np.unpackbits(
                    np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)
                ).astype(np.int64)
                votes += 2 * bs - 1
            sig = 0
            for b in votes >= 0:
                sig = (sig << 1) | int(b)
            out.append(sig - (1 << bits) if sig >= (1 << (bits - 1)) else sig)
        return pd.Series(out, dtype="int64")

    return documents.select("doc_id", simhash_udf(F.col("text")).alias("simhash"))


def simhash_near_dup(
    documents: DataFrame, max_hamming: int = 3, hash_mode: str = "xxhash64"
) -> DataFrame:
    """SimHash blocking: split the 64-bit signature into max_hamming+1
    16-bit bands — any pair within the Hamming radius shares at least
    one exact band (pigeonhole). Band-bucket join + exact popcount check.
    hash_mode picks the signature kernel (see simhash)."""
    sh = simhash(documents, hash_mode=hash_mode).localCheckpoint(eager=True)
    n_bands = max_hamming + 1
    band_width = 64 // n_bands
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(
                            F.col("simhash"), b * band_width
                        ).bitwiseAND(F.lit((1 << band_width) - 1)).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    right = banded.select(
        F.col("band").alias("band2"), F.col("key").alias("key2"),
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
    )
    pairs = (
        banded.join(
            right,
            (banded["band"] == right["band2"])
            & (banded["key"] == right["key2"])
            & (banded["doc_id"] < right["doc_b"]),
        )
        .select(
            F.col("doc_id").alias("doc_a"), "doc_b",
            F.bit_count(F.col("simhash").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

def brute_force_ann(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Baseline ANN: exact cosine top-k over the full table
    (TakeOrderedAndProject; one narrow scan)."""
    from .query import cosine_score  # noqa: PLC0415

    return (
        embeddings.select(
            "vec_id", cosine_score(F.col("embedding"), query_vec).alias("score")
        )
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(k)
    )


# Above this many plane/centroid literals (n_vectors * dim), the
# literal-codegen vector math is replaced by a broadcast-numpy pandas
# UDF: one Catalyst expression per centroid over literal arrays means
# nlist*dim literals in ONE expression tree — at production scale (the
# reference embeds at dim 3072, embeddings.py:20; nlist >= 1024) that
# blows the JVM's 64 KB codegen method limit (interpreted fallback) or
# OOMs the driver building the plan. The literal path stays the default
# below the threshold because it is fully JVM-side AND expressible as
# DuckDB oracle SQL (the correctness anchor).
LITERAL_MATH_MAX_TERMS = 8192


def _unit_rows(mat):
    """Row-normalize a (n, d) float matrix; zero-norm rows divide by 1
    (same guard as cosine_score / pair_cosine: zero vectors score 0)."""
    import numpy as np  # noqa: PLC0415

    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    return mat / norms[:, None]


def _ivf_assign_vectorized(
    embeddings: DataFrame, centroids: list[list[float]], with_score: bool = False
) -> DataFrame:
    """Argmax-cosine cell assignment as ONE BLAS matmul per Arrow batch
    over a broadcast centroid matrix — the production-dim path. Same
    semantics as the literal path: full cosine (both sides normalized,
    zero-norm guarded to 0) with first-max-wins tie-break (np.argmax).
    `with_score` also emits the winning cosine (`best_cos`) — the row
    max the matmul already computes; discarding and re-deriving it
    downstream was the r4 kmeans_inertia literal-codegen blowup."""
    import numpy as np  # noqa: PLC0415

    cmat = _unit_rows(np.asarray(centroids, dtype=np.float64))
    bc = embeddings.sparkSession.sparkContext.broadcast(cmat)

    if with_score:
        @F.pandas_udf("cell int, best_cos double")
        def assign_score_udf(embs: pd.Series) -> pd.DataFrame:
            c = bc.value
            if len(embs) == 0:
                return pd.DataFrame({"cell": pd.Series([], dtype="int32"),
                                     "best_cos": pd.Series([], dtype="float64")})
            e = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
            sims = _unit_rows(e) @ c.T
            cells = np.argmax(sims, axis=1)
            return pd.DataFrame({
                "cell": pd.Series(cells, dtype="int32"),
                "best_cos": pd.Series(sims[np.arange(len(cells)), cells],
                                      dtype="float64"),
            })

        st = assign_score_udf(F.col("embedding"))
        return embeddings.select(
            "vec_id", "embedding",
            st.getField("cell").alias("cell"),
            st.getField("best_cos").alias("best_cos"),
        )

    @F.pandas_udf("int")
    def assign_udf(embs: pd.Series) -> pd.Series:
        c = bc.value
        if len(embs) == 0:
            return pd.Series([], dtype="int32")
        e = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
        cells = np.argmax(_unit_rows(e) @ c.T, axis=1)
        return pd.Series(cells, dtype="int32")

    return embeddings.select(
        "vec_id", "embedding", assign_udf(F.col("embedding")).alias("cell")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vectorized: bool | None = None,
    with_score: bool = False,
) -> DataFrame:
    """IVF cell assignment: argmax cosine per vector — the scale path
    for ANN (search only the probed cells instead of the full table).

    Two physical strategies, same semantics:
      * literal codegen (default below LITERAL_MATH_MAX_TERMS literals):
        one JVM cosine expression per centroid — whole-stage codegen,
        no Python, DuckDB-oracle-expressible;
      * broadcast-numpy pandas UDF (default above the threshold): one
        matmul per Arrow batch — the only plan that survives production
        dims (dim 3072 x nlist 1024 = 3M literals cannot codegen).
    `vectorized` forces a path explicitly (tests assert both agree).
    `with_score` adds a `best_cos` column (the assigned centroid's
    cosine) on BOTH paths — consumers needing the distance (e.g.
    kmeans_inertia) must read it here instead of re-scoring against a
    centroid-literal array, which would reintroduce the codegen blowup
    the vectorized path exists to avoid."""
    if vectorized is None:
        dim = len(centroids[0]) if centroids else 0
        vectorized = len(centroids) * dim > LITERAL_MATH_MAX_TERMS
    if vectorized:
        return _ivf_assign_vectorized(embeddings, centroids, with_score=with_score)
    from .query import cosine_score  # noqa: PLC0415

    scores = F.array(
        *[cosine_score(F.col("embedding"), c) for c in centroids]
    )
    cols = [
        F.col("vec_id"), F.col("embedding"),
        (F.array_position(scores, F.array_max(scores)) - 1).cast("int").alias("cell"),
    ]
    if with_score:
        cols.append(F.array_max(scores).alias("best_cos"))
    return embeddings.select(*cols)


def ivf_ann(
    embeddings: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    vectorized: bool | None = None,
) -> DataFrame:
    """IVF-bucketed ANN: score centroids against the query on the
    driver (tiny), then exact cosine only inside the n_probe nearest
    cells. Partition-prunable when the assignment table is written
    partitioned by cell."""
    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5 or 1.0
        nb = sum(x * x for x in b) ** 0.5 or 1.0
        return dot / (na * nb)

    probe = sorted(
        range(len(centroids)), key=lambda i: -cos(centroids[i], query_vec)
    )[:n_probe]
    assigned = ivf_assign(embeddings, centroids, vectorized=vectorized)
    from .query import cosine_score  # noqa: PLC0415

    return (
        assigned.filter(F.col("cell").isin(probe))
        .select(
            "vec_id", cosine_score(F.col("embedding"), query_vec).alias("score")
        )
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(k)
    )


def ivf_build(
    io,
    embeddings: DataFrame,
    centroids: list[list[float]],
    table: str = "ivf_index",
    input_key: str | None = None,
    vectorized: bool | None = None,
) -> str:
    """Materialize the IVF assignment as a build artifact: the cell
    column becomes the parquet PARTITION key, so a probe query's
    `cell IN (...)` filter prunes to n_probe directories instead of
    re-scoring every vector against every centroid per query (the
    VERDICT r1 scale note: the cell story is only real if the
    assignment is persisted once, like the O18 inverted index).

    Resume semantics match pipeline stages: same `input_key` -> the
    committed snapshot is reused, not rebuilt. Centroids ride along in
    the snapshot metadata so queries probe the exact centroids the
    index was built with."""
    if input_key is not None:
        existing = io.find_snapshot(table, input_key)
        if existing is not None:
            return existing
    assigned = ivf_assign(embeddings, centroids, vectorized=vectorized)
    return io.commit(
        table,
        assigned,
        input_snapshot=input_key,
        partition_by=["cell"],
        metadata={"centroids": [[float(x) for x in c] for c in centroids]},
    )


def ivf_query(
    io,
    spark,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    table: str = "ivf_index",
    snapshot: str | None = None,
) -> DataFrame:
    """ANN probe against a materialized IVF index: pick the n_probe
    nearest cells driver-side (centroids from the snapshot metadata —
    tiny), then exact cosine top-k over ONLY those cells. The cell
    filter is a partition filter on the index's layout, so the scan
    reads n_probe/n_cells of the data — the 100 TB path."""
    from .query import cosine_score  # noqa: PLC0415

    cents = io.snapshot_metadata(table, snapshot)["centroids"]

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5 or 1.0
        nb = sum(x * x for x in b) ** 0.5 or 1.0
        return dot / (na * nb)

    probe = sorted(
        range(len(cents)), key=lambda i: -cos(cents[i], query_vec)
    )[:n_probe]
    assigned = io.read(spark, table, snapshot)
    return (
        assigned.filter(F.col("cell").isin(probe))
        .select(
            "vec_id", cosine_score(F.col("embedding"), query_vec).alias("score")
        )
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def pair_cosine(a, b):
    """Cosine similarity between two array<float> columns, JVM-side
    (zip_with dot product + aggregate norms; no Python)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    nb = F.sqrt(F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    # zero-norm guard: Spark orders NaN above every double, so an
    # unguarded 0/0 would sail through `cosine >= threshold`
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_near_dup(
    embeddings: DataFrame, threshold: float = 0.9, id_col: str = "vec_id"
) -> DataFrame:
    """Exact embedding-cosine near-dup: all pairs (a < b) with cosine
    >= threshold. O(n^2) — the correctness baseline the LSH variant is
    verified against; use embedding_near_dup_lsh at scale."""
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            pair_cosine(F.col("emb_a"), F.col("emb_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _random_planes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    import random  # noqa: PLC0415

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _lsh_band_keys_vectorized(
    embeddings: DataFrame,
    planes: list[list[float]],
    bands: int,
    id_col: str,
) -> DataFrame:
    """(doc, embedding, band, key) rows via one sign-bit matmul per
    Arrow batch over a broadcast plane matrix — the production-dim path
    for random-hyperplane LSH (literal planes cannot codegen at the
    reference's dim 3072). Same bit/key semantics as the literal path:
    bit = (embedding . plane) >= 0, key = sum(bit[b*width+r] << r)."""
    import numpy as np  # noqa: PLC0415

    n_planes = len(planes)
    width = n_planes // bands
    pmat = np.asarray(planes, dtype=np.float64)
    bc = embeddings.sparkSession.sparkContext.broadcast(pmat)

    @F.pandas_udf("array<long>")
    def keys_udf(embs: pd.Series) -> pd.Series:
        p = bc.value
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        e = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
        bits = (e @ p.T) >= 0.0  # (n, n_planes)
        keys = np.zeros((len(embs), bands), dtype=np.int64)
        for b in range(bands):
            for r in range(width):
                keys[:, b] |= bits[:, b * width + r].astype(np.int64) << r
        return pd.Series(list(keys))

    # ids only: the bucket join below shuffles (doc, band, key), never
    # the embedding payload — at scale that is 8x-the-ids instead of
    # 8x-the-corpus through the exchange
    return embeddings.select(
        F.col(id_col).alias("doc"),
        F.posexplode(keys_udf(F.col("embedding"))).alias("band", "key"),
    )


def _pair_cosine_vectorized():
    """cosine(a, b) over two array columns as one numpy batch op —
    the verification kernel for production dims (the JVM zip_with/
    aggregate lambda walk is O(dim) interpreted steps per pair)."""
    import numpy as np  # noqa: PLC0415

    @F.pandas_udf("double")
    def cos_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ea = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        eb = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        dots = np.einsum("ij,ij->i", ea, eb)
        na = np.linalg.norm(ea, axis=1)
        nb = np.linalg.norm(eb, axis=1)
        ok = (na > 0) & (nb > 0)  # zero-norm pairs score 0, same as pair_cosine
        na[na == 0.0] = 1.0
        nb[nb == 0.0] = 1.0
        return pd.Series(np.where(ok, dots / (na * nb), 0.0))

    return cos_udf


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
    dim: int | None = None,
    id_col: str = "vec_id",
    vectorized: bool | None = None,
) -> DataFrame:
    """Random-hyperplane LSH blocking for embedding near-dup: sign-bit
    signature over seeded Gaussian planes, banded bucket join (pairs
    only meet inside a shared band bucket — never O(n^2)), then exact
    cosine verification. Deterministic given the seed.

    The signature is literal-codegen'd below LITERAL_MATH_MAX_TERMS
    plane literals (JVM-side, oracle-expressible) and a broadcast-numpy
    matmul per Arrow batch above it (the only plan that survives
    production dims); `vectorized` forces a path."""
    if dim is None:
        row = embeddings.select(F.size("embedding")).first()
        if row is None:  # empty input: no pairs, well-typed result
            return embeddings.sparkSession.createDataFrame(
                [], "vec_a long, vec_b long, cosine double"
            )
        dim = row[0]
    planes = _random_planes(n_planes, dim, seed)
    width = n_planes // bands
    if vectorized is None:
        vectorized = n_planes * dim > LITERAL_MATH_MAX_TERMS

    if vectorized:
        # bucket join over ids only (no embedding payload in the
        # shuffle), distinct pairs FIRST (a pair colliding in several
        # bands is verified once, not per band), then one numpy-batch
        # cosine per pair
        banded = _lsh_band_keys_vectorized(embeddings, planes, bands, id_col)
        right = banded.select(
            F.col("band").alias("band2"), F.col("key").alias("key2"),
            F.col("doc").alias("vec_b"),
        )
        pair_ids = (
            banded.join(
                right,
                (banded["band"] == right["band2"])
                & (banded["key"] == right["key2"])
                & (banded["doc"] < right["vec_b"]),
            )
            .select(F.col("doc").alias("vec_a"), "vec_b")
            .distinct()
        )
        ea = embeddings.select(
            F.col(id_col).alias("vec_a"), F.col("embedding").alias("emb_a")
        )
        eb = embeddings.select(
            F.col(id_col).alias("vec_b"), F.col("embedding").alias("emb_b")
        )
        cos_udf = _pair_cosine_vectorized()
        cands = (
            pair_ids.join(ea, "vec_a")
            .join(eb, "vec_b")
            .select(
                "vec_a", "vec_b",
                cos_udf(F.col("emb_a"), F.col("emb_b")).alias("cosine"),
            )
        )
        return cands.filter(F.col("cosine") >= threshold)
    else:
        def dot_lit(vec: list[float]):
            lit = F.array(*[F.lit(float(v)) for v in vec])
            return F.aggregate(
                F.zip_with(F.col("embedding"), lit, lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, x: acc + x,
            )

        bits = [F.when(dot_lit(p) >= 0, F.lit(1)).otherwise(F.lit(0)) for p in planes]
        band_keys = [
            sum(
                (bits[b * width + r] * F.lit(1 << r) for r in range(width)),
                start=F.lit(0),
            )
            for b in range(bands)
        ]
        banded = embeddings.select(
            F.col(id_col).alias("doc"), "embedding",
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"), band_keys[b].alias("key"))
                for b in range(bands)
            ])).alias("bk"),
        ).select("doc", "embedding", "bk.band", "bk.key")

    right = banded.select(
        F.col("band").alias("band2"), F.col("key").alias("key2"),
        F.col("doc").alias("vec_b"), F.col("embedding").alias("emb_b"),
    )
    cands = (
        banded.join(
            right,
            (banded["band"] == right["band2"])
            & (banded["key"] == right["key2"])
            & (banded["doc"] < right["vec_b"]),
        )
        .select(
            F.col("doc").alias("vec_a"), "vec_b",
            pair_cosine(F.col("embedding"), F.col("emb_b")).alias("cosine"),
        )
        .distinct()
    )
    return cands.filter(F.col("cosine") >= threshold)


# ---------------------------------------------------------------------------
# text analysis: language-ID + quality scoring (JVM-side)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "des"],
    "zh": ["的", "是", "了", "在", "我"],
}


def _marker_hits(text_col, markers: list[str]):
    """Occurrences of any marker as a whole token, JVM-side: tokenize
    on non-alphanumeric runs, count tokens in the marker set. (A
    separator-consuming count regex would miss adjacent markers and
    behaves differently across regex engines — token filtering is
    engine-portable and exact.)"""
    tokens = F.split(F.lower(text_col), r"[^a-z0-9一-鿿]+", -1)
    markers_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(
        F.filter(tokens, lambda x: F.array_contains(markers_arr, x))
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit
    counts. The argmax is an explicit greatest/when chain (deterministic
    tie-break: first language in sorted order wins) so the exact same
    logic is expressible as the DuckDB oracle SQL."""
    langs = sorted(LANG_MARKERS)
    hit_cols = {
        lang: _marker_hits(F.col("text"), LANG_MARKERS[lang]) for lang in langs
    }
    best = F.greatest(*hit_cols.values())
    pred = F.when(hit_cols[langs[0]] == best, F.lit(langs[0]))
    for lang in langs[1:]:
        pred = pred.when(hit_cols[lang] == best, F.lit(lang))
    return documents.select(
        "doc_id", "lang",
        pred.alias("pred_lang"),
        best.cast("bigint").alias("marker_hits"),
    )


def corpus_filter(
    documents: DataFrame,
    min_chars: int = 200,
    max_punct_ratio: float = 0.10,
    min_words: int = 30,
) -> DataFrame:
    """The composed keep/drop decision of a pretraining data pipeline:
    exact-dup removal (keep the min-doc_id copy), length floor,
    word-count floor, punctuation ceiling — evaluated in a fixed rule
    order so `reason` is deterministic. Returns (doc_id, keep, reason).

    One narrow scan + one fingerprint aggregation (the same algebraic
    groupBy as exact_dedup) joined back — no UDFs, fully Catalyst-
    optimized and oracle-checkable."""
    fp = F.md5(norm_text(F.col("text")))
    keep_ids = (
        documents.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"))
    )
    t = F.col("text")
    n_chars = F.length(t)
    n_words = F.size(F.split(F.trim(t), r"\s+"))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.!?,;:'\"()\-]", ""))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    scored = documents.select(
        "doc_id", fp.alias("fingerprint"),
        n_chars.alias("__chars"), n_words.alias("__words"),
        punct_ratio.alias("__punct"),
    ).join(keep_ids, "fingerprint")
    reason = (
        F.when(F.col("doc_id") != F.col("keep_doc_id"), F.lit("duplicate"))
        .when(F.col("__chars") < min_chars, F.lit("too_short"))
        .when(F.col("__words") < min_words, F.lit("too_few_words"))
        .when(F.col("__punct") > max_punct_ratio, F.lit("too_much_punct"))
        .otherwise(F.lit("ok"))
    )
    return scored.select(
        "doc_id",
        (reason == "ok").alias("keep"),
        reason.alias("reason"),
    )


def hash_bucket(col, buckets: int = 100):
    """Deterministic sampling bucket in [0, buckets): engine-portable
    md5-based 64-bit hash of the key — the reproducible alternative to
    rand() sampling. The same rows survive on every engine, cluster
    size, and run (required for auditable training-data subsets); the
    hash is the same md5/15-hex-char construction the MinHash md5 mode
    uses, so it is bit-identical in DuckDB oracle SQL."""
    return F.pmod(md5_hash60(col), F.lit(buckets))


def stratified_sample(
    documents: DataFrame,
    fractions: dict[str, float],
    default: float = 0.1,
    key_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """Deterministic per-stratum sampling — the language-rebalancing
    primitive of a pretraining data mix: keep `fractions[stratum]` of
    each stratum (default rate otherwise), selected by hash bucket so
    membership is stable across runs and engines. One narrow scan, no
    shuffle, fully JVM-side."""
    thresh = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        pct = F.lit(int(round(frac * 100)))
        thresh = F.when(cond, pct) if thresh is None else thresh.when(cond, pct)
    thresh = (
        F.lit(int(round(default * 100)))
        if thresh is None
        else thresh.otherwise(F.lit(int(round(default * 100))))
    )
    return documents.filter(hash_bucket(F.col(key_col)) < thresh)


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization — the standard event-stream shaping
    operator: a user's events belong to one session until an
    inter-event gap exceeds gap_seconds; returns one row per session
    (user_id, session_idx, n_events, session_start_us, session_end_us).

    Shape: lag + running-sum window over (user_id) then one hash agg —
    a single exchange on user_id; per-user data is bounded by that
    user's event count, so no skew beyond what any per-user operator
    has. Timestamps compare as unix microseconds (integer math, bit-
    identical in the DuckDB oracle via epoch_us)."""
    from pyspark.sql import Window  # noqa: PLC0415

    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        # unix_micros requires TIMESTAMP; an NTZ column converts
        # timezone-independently via timestampdiff from the NTZ epoch
        # (a session-tz cast would shift absolute values off the
        # oracle's naive-as-UTC epoch_us semantics).
        ts_us = F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        )
    else:
        ts_us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("session_idx", sess)
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_us).alias("session_start_us"),
            F.max(ts_us).alias("session_end_us"),
        )
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Quality heuristics: char length, punctuation ratio, stopword
    ratio, mean word length — the standard pretraining-filter features."""
    t = F.col("text")
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.!?,;:'\"()\-]", ""))
    stop_hits = _marker_hits(t, LANG_MARKERS["en"])
    return documents.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1)), 6
        ).alias("mean_word_len"),
    )

# ---------------------------------------------------------------------------
# repetition filters + benchmark decontamination (Gopher-style; JVM-side)
# ---------------------------------------------------------------------------

def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition features per document — the standard
    pretraining repetition filters: top-word fraction (most frequent
    word's share of tokens), distinct-word ratio (type/token ratio),
    and duplicate-bigram fraction (1 - distinct bigrams / bigrams).

    Shape: one explode -> two hash aggs (both map-side combinable) for
    the word counts, plus a per-row array pass for the bigram stats,
    joined back on doc_id. Linear in tokens end-to-end — deliberately
    NOT the O(tokens x vocabulary) per-row higher-order-function scan,
    which would turn a 10k-token web page into 10^7 comparisons.

    The reference has no corpus-quality stage (its flow is
    chunk->extract, /root/reference/src/builders/graphrag.py); this is
    one of the first-class training-data operators the engine adds.
    """
    words = F.split(norm_text(F.col("text")), " ")
    base = documents.select("doc_id", words.alias("words"))
    wc = (
        base.select("doc_id", F.explode("words").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    word_stats = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    w = F.col("words")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
    )
    bigram_stats = base.select(
        "doc_id",
        F.size(bigrams).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bigrams"),
    )
    return word_stats.join(bigram_stats, "doc_id").select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round(F.col("top_c") / F.col("n_words"), 6).alias("top_word_frac"),
        F.round(F.col("n_distinct") / F.col("n_words"), 6).alias(
            "distinct_word_ratio"
        ),
        F.round(
            F.lit(1.0) - F.col("n_distinct_bigrams") / F.col("n_bigrams"), 6
        ).alias("dup_bigram_frac"),
    )


def ngram_contamination(
    documents: DataFrame,
    eval_docs: DataFrame | None = None,
    n: int = 8,
    eval_mod: int = 97,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination by n-gram overlap: flag every training
    document that shares at least one n-word shingle with the held-out
    eval set (default eval slice: doc_id % eval_mod == 0, a stable
    stand-in for a benchmark suite). Emits per-doc shingle counts, the
    contaminated fraction, and the drop flag.

    Shape: distinct shingles per side (reuses word_shingles, which is
    already per-doc distinct), then a left join keyed on the shingle
    and one hash agg. At 100 TB the eval side is a benchmark suite —
    MBs, not TBs — so the default broadcast hint removes the shuffle
    entirely; pass broadcast_eval=False for an eval set too big to
    broadcast and the join runs as a shuffled hash join on the
    shingle key (still never all-pairs).
    """
    if eval_docs is None:
        eval_docs = documents.filter((F.col("doc_id") % eval_mod) == 0)
        train_docs = documents.filter((F.col("doc_id") % eval_mod) != 0)
    else:
        train_docs = documents
    eval_sh = word_shingles(eval_docs, n=n).select("shingle").distinct()
    eval_sh = eval_sh.withColumn("__hit", F.lit(1))
    if broadcast_eval:
        eval_sh = F.broadcast(eval_sh)
    train_sh = word_shingles(train_docs, n=n)
    hits = (
        train_sh.join(
            eval_sh,
            "shingle",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_contaminated"),
        )
    )
    return hits.select(
        "doc_id",
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.col("n_contaminated").cast("bigint").alias("n_contaminated"),
        F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
            "contaminated_frac"
        ),
        (F.col("n_contaminated") > 0).alias("is_contaminated"),
    )


# ---------------------------------------------------------------------------
# PII detection / scrubbing (JVM-side regex; engine-portable patterns)
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle): no backreferences, no lookaround.
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}

PII_REPLACEMENTS = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def pii_scrub(documents: DataFrame) -> DataFrame:
    """PII detection + redaction — the compliance pass every
    production training-data pipeline runs before anything ships:
    per-doc counts of emails / phone numbers / IPv4 addresses plus the
    fingerprint of the scrubbed text (scrub order: email, phone, ipv4,
    fixed so the output is deterministic when patterns overlap).

    One narrow JVM-side scan (regexp_extract_all + chained
    regexp_replace) — no shuffle, no Python; at 100 TB this is a
    map-only stage that pipelines into whatever sink follows.
    """
    t = F.col("text")
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    ]
    scrubbed = t
    for kind, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, PII_REPLACEMENTS[kind])
    return documents.select(
        "doc_id",
        *counts,
        F.md5(scrubbed).alias("scrubbed_fingerprint"),
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling-hash document sketch; JVM-side)
# ---------------------------------------------------------------------------

def winnow_fingerprints(
    documents: DataFrame, k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS sketch): rolling hash over the document's
    word k-gram sequence, keep the minimum hash of every w-window,
    dedup. Guarantees any shared word run of length >= k + w - 1
    contributes a shared fingerprint — the property MinHash sampling
    does NOT give (MinHash approximates set overlap; winnowing
    *detects* contiguous matches).

    The gram hash is the engine-portable md5/15-hex-char 64-bit
    construction shared with hash_bucket and the MinHash md5 mode, so
    the DuckDB oracle reproduces fingerprints bit-for-bit. Entirely
    per-row JVM array math (transform + array_min over slices) — no
    shuffle, no Python. Docs shorter than k words emit nothing (both
    engines filter identically).
    """
    words = F.split(norm_text(F.col("text")), " ")
    gram_hash = (
        f"transform(sequence(1, size(words) - {k} + 1),"
        f" i -> conv(substring(md5(concat_ws(' ', slice(words, i, {k}))),"
        " 1, 15), 16, 10))"
    )
    expr = (
        "array_distinct(transform("
        f"sequence(1, greatest(size(hashes) - {w} + 1, 1)),"
        f" i -> array_min(slice(hashes, i, {w}))))"
    )
    return (
        documents.select("doc_id", words.alias("words"))
        .filter(F.size("words") >= k)
        .select("doc_id", F.expr(gram_hash).cast("array<long>").alias("hashes"))
        .select("doc_id", F.explode(F.expr(expr)).alias("fp"))
    )


def winnow_near_dup(
    documents: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints — the
    contiguous-match complement to MinHash: pairs are generated by a
    bucket join on the fingerprint value, never all-pairs.

    max_df drops fingerprints occurring in more than that many
    documents before pairing (boilerplate k-grams — the analog of
    stopword removal). This bounds every bucket at max_df docs, so the
    worst-case pair fan-out per fingerprint is max_df^2/2 regardless
    of corpus size — the property that keeps the join safe at 100 TB.
    """
    fps = winnow_fingerprints(documents, k=k, w=w)
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    fps = fps.join(rare, "fp")
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# as-of join (backward, inclusive) — native in DuckDB/kdb, composed here
# ---------------------------------------------------------------------------

def ts_micros(df: DataFrame, col: str = "ts"):
    """Engine-portable epoch-microseconds of a timestamp column.
    timestamp_ntz converts timezone-independently via timestampdiff
    from the NTZ epoch (a session-tz cast would shift absolute values
    off the oracle's naive-as-UTC epoch_us semantics)."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND,"
            f" TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
        )
    return F.unix_micros(col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward inclusive as-of join: for every left row, the right
    row with the greatest right.ts <= left.ts for the same key (the
    standard event-enrichment / trades-to-quotes operator; DuckDB and
    kdb have it natively as ASOF JOIN, Spark does not).

    Expressed as the scalable union + window composition rather than a
    range join: tag both sides, union, and carry the latest right-side
    values forward with last(ignorenulls) over the key ordered by
    (ts, side) — right rows sort before left rows at equal ts, which
    is exactly the inclusive match. One exchange on the key and one
    per-key sort (the same shuffle shape as any window op), no
    range-condition join that Catalyst would turn into a broadcast
    nested loop. Right-side (key, ts) duplicates should be reduced by
    the caller first (e.g. max_by) — whichever survives is carried.

    At 100 TB: partitions by the key; per-key cost is the sort. Skewed
    hot keys behave like any window op (AQE cannot split a window
    partition) — pre-bucket by time range if one key dominates.
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (on, ts)
        ]
    from pyspark.sql import Window  # noqa: PLC0415

    # all right-side values travel as ONE struct per right row: the
    # window fill then takes whole rows, never tearing individual
    # columns from different right rows, and a legitimately-NULL value
    # inside the matched row stays NULL (a per-column
    # last(ignorenulls) would leak the previous row's value)
    r_struct = F.struct(*[F.col(c) for c in value_cols]).alias("__r")
    r = right.select(F.col(on), F.col(ts), F.lit(0).alias("__side"), r_struct)
    left_cols = left.columns
    right_types = dict(right.dtypes)
    struct_type = ", ".join(f"`{c}` {right_types[c]}" for c in value_cols)
    lf = left.select(
        *[F.col(c) for c in left_cols],
        F.lit(1).alias("__side"),
        F.lit(None).cast(f"struct<{struct_type}>").alias("__r"),
    )
    r_full = r.select(
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            if c not in (on, ts)
            else F.col(c)
            for c in left_cols
        ],
        "__side",
        "__r",
    )
    unioned = lf.unionByName(r_full)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__r.{c}").alias(c) for c in value_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "user_id",
    ts: str = "ts_us",
    start: str = "start_us",
    end: str = "end_us",
    bucket: int = 3_600_000_000,
) -> DataFrame:
    """Point-in-interval range join that never hands Catalyst a raw
    range condition (which degrades to a broadcast-nested-loop /
    cartesian check): each interval explodes to every time bucket it
    overlaps, each point keys to its single bucket, and the join is an
    EQUI-join on (key, bucket) with the BETWEEN as a residual filter.

    Fan-out per interval is span/bucket + 1 rows — pick `bucket` near
    the typical interval span (default 1 h in microseconds). At 100 TB
    this is one hash join partitioned by (key, bucket); a hot key is
    additionally spread across its time buckets, which is exactly the
    salting a skewed pure-key join would need anyway.
    """
    b = F.lit(int(bucket))
    ivals = intervals.select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col(start) / b), F.floor(F.col(end) / b))
        ).alias("__bucket"),
    )
    pts = points.withColumn("__bucket", F.floor(F.col(ts) / b))
    return (
        pts.join(ivals, [on, "__bucket"])
        .filter(F.col(ts).between(F.col(start), F.col(end)))
        .drop("__bucket")
    )


def batch_ann(
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "qvec",
) -> DataFrame:
    """Batched exact top-k: one scored pass answers MANY query vectors
    at once — the serving shape for offline retrieval jobs (embed a
    batch of prompts, fetch neighbours for all of them in one Spark
    job instead of one driver round-trip per query).

    Shape: broadcast the (small) query table, cross join against the
    corpus scan, score with the shared JVM cosine, keep per-query
    top-k with a row_number window partitioned by query id. Corpus is
    scanned ONCE regardless of query count; the only shuffle is the
    per-query window (n_queries * k rows after the filter). For query
    batches too large to broadcast, fall back to ivf_query per shard.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    scored = embeddings.crossJoin(
        F.broadcast(queries.select(query_id, query_vec))
    ).select(
        query_id,
        "vec_id",
        pair_cosine(F.col(query_vec), F.col("embedding")).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def pack_sequences(
    documents: DataFrame,
    budget: int = 2000,
    buckets: int = 64,
    cost_col: str = "n_chars",
) -> DataFrame:
    """Greedy next-fit sequence packing — the training-batch shaping
    op: assign documents to bins so no bin exceeds `budget` cost
    (except a single oversized document, which gets a bin alone).

    Packing is inherently sequential, so it is distributed the
    standard way: documents hash-bucket deterministically (same
    md5 construction as stratified_sample, so membership is stable
    across runs and engines), and the sequential fold runs per bucket
    inside one applyInPandas group in doc_id order. Bin identity is
    (bucket, bin_idx) — globally unique, deterministic under any
    partitioning. One shuffle (the groupBy), O(docs/buckets) rows per
    group; at 100 TB raise `buckets` so groups stay executor-sized.
    """
    schema = (
        "doc_id long, bucket long, cost long, bin_idx long, bin_fill long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills = [], []
        bin_idx, fill = 0, 0
        for i, c in enumerate(pdf["cost"]):
            c = int(c)
            # guard on position, not fill>0: with zero-cost docs the
            # running fill can be 0 mid-sequence, and the recursive-CTE
            # oracle applies the overflow test at every non-first step
            if i > 0 and fill + c > budget:
                bin_idx += 1
                fill = 0
            fill += c
            bins.append(bin_idx)
            fills.append(fill)
        pdf["bin_idx"] = bins
        pdf["bin_fill"] = fills
        return pdf[["doc_id", "bucket", "cost", "bin_idx", "bin_fill"]]

    prepared = documents.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), buckets).cast("long").alias("bucket"),
        F.col(cost_col).cast("long").alias("cost"),
    )
    return prepared.groupBy("bucket").applyInPandas(pack, schema)


# ---------------------------------------------------------------------------
# embedding quantization (int8 scalar; 4x memory cut for vector stores)
# ---------------------------------------------------------------------------

def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Symmetric int8 scalar quantization per vector: scale =
    max(|x|)/127, q_i = round(x_i/scale) clamped to [-127, 127] — the
    standard 4x memory cut for a 100 TB vector store (a dim-768
    float32 corpus drops from ~3 KB to ~0.77 KB per row, and int8
    dot products SIMD-vectorize). Zero vectors keep scale 0 and an
    all-zero code. Pure JVM array math, one narrow scan.

    Recall impact is bounded (|dequant - x| <= scale/2 per element);
    tests assert top-10 ANN recall >= 0.9 against the float path.
    """
    x = F.col("embedding")
    scale = F.aggregate(
        x, F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    ) / F.lit(127.0)
    with_scale = embeddings.select("vec_id", x, scale.alias("scale"))
    return with_scale.select(
        "vec_id",
        "scale",
        F.when(
            F.col("scale") > 0,
            F.transform(
                x,
                lambda v: F.greatest(
                    F.lit(-127),
                    F.least(
                        F.lit(127),
                        F.round(v.cast("double") / F.col("scale"))
                        .cast("int"),
                    ),
                ).cast("byte"),
            ),
        ).otherwise(
            F.transform(x, lambda v: F.lit(0).cast("byte"))
        ).alias("qvec"),
    )


def dequantize(quantized: DataFrame) -> DataFrame:
    """Inverse of quantize_embeddings: float array = q_i * scale."""
    return quantized.select(
        "vec_id",
        F.transform(
            F.col("qvec"),
            lambda q: (q.cast("double") * F.col("scale")).cast("float"),
        ).alias("embedding"),
    )


def nfc_normalize(documents: DataFrame) -> DataFrame:
    """Unicode NFC normalization — real web text mixes composed and
    decomposed forms (e + U+0301 vs é), which silently defeats
    hash-based dedup and fingerprinting; canonicalize before either.
    Spark has no built-in normalizer, so this is a vectorized pandas
    UDF (Arrow batches, pandas str engine — not per-row Python
    semantics at the plan level). Emits the normalized text plus a
    changed flag.
    """
    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata  # noqa: PLC0415

        return s.map(
            lambda t: None if t is None else unicodedata.normalize("NFC", t)
        )

    return documents.select(
        "doc_id",
        nfc(F.col("text")).alias("text_nfc"),
        "text",
    ).select(
        "doc_id",
        "text_nfc",
        (F.col("text") != F.col("text_nfc")).alias("changed"),
    )


# ---------------------------------------------------------------------------
# k-means training (spherical Lloyd's) — learns the IVF centroid set
# ---------------------------------------------------------------------------


def kmeans_train(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    vectorized: bool | None = None,
    stats: dict | None = None,
) -> list[list[float]]:
    """Spherical k-means by Lloyd's iteration — trains the centroid
    set that ivf_build/ivf_ann consume (the reference picks Qdrant's
    default index; the Spark-scale analog is IVF over learned
    centroids, so centroid *training* belongs in the engine too).

    Semantics: deterministic init = the k lowest-vec_id vectors (no
    RNG — reproducible across runs/engines); each iteration assigns
    every vector to its argmax-COSINE centroid (exactly ivf_assign,
    first-max-wins tie-break, so both the literal-codegen and the
    broadcast-numpy production path apply), then recomputes each
    centroid as the element-wise mean of its members. Cosine-assign +
    mean-update is the standard spherical-k-means step; centroid norm
    does not affect the next assignment (cosine normalizes), so means
    are NOT re-normalized — which keeps the update expressible in
    exact oracle SQL. Empty cells keep their previous centroid.

    Scale shape: per iteration exactly one pass over the data —
    assignment (map-only; JVM codegen or one BLAS matmul per Arrow
    batch) followed by posexplode + partial-agg mean per (cell, pos).
    Only k*dim aggregated values ever reach the driver (the centroid
    matrix is a driver-resident artifact by definition — it is what
    gets broadcast back out), so driver traffic is O(k*dim*n_iter),
    independent of table size.
    """
    init = (
        embeddings.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(k)
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in init]
    if not cents:
        return []
    dim = len(cents[0])
    for it in range(n_iter):
        assigned = ivf_assign(embeddings, cents, vectorized=vectorized)
        means = (
            assigned.select(
                "cell", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("v"))
            .collect()
        )
        by_cell: dict[int, list[float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = r["v"]
        cents = [by_cell.get(c, cents[c]) for c in range(len(cents))]
        if stats is not None:
            stats.setdefault("filled_cells", []).append(len(by_cell))
    return cents


# ---------------------------------------------------------------------------
# TF-IDF distinctive terms (pure JVM, oracle-expressible)
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    documents: DataFrame,
    group_col: str = "source",
    k: int = 5,
) -> DataFrame:
    """Top-k distinctive terms per document group by TF-IDF — the
    corpus-characterization operator (what does each source/domain
    talk about?) that raw term frequency can't answer because
    stopwords dominate every group.

    tf = term count within the group; df = number of DOCUMENTS
    containing the term; idf = ln(N/df) with N = total documents.
    Score = tf * idf, rounded to 6 for cross-engine comparability;
    ties break on term asc.

    Scale shape: one tokenize pass feeding two partial-aggregates
    (per-(group,term) tf and per-term df) joined on term — df is a
    per-term table orders of magnitude smaller than the corpus, and
    the final per-group top-k is a window over the (group, term)
    aggregate, not the raw tokens. No data-sized shuffle after the
    first explode-agg.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    toks = documents.select(
        "doc_id",
        F.col(group_col).alias("grp"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    # n_docs is a parquet metadata count; the TEXT is tokenized once:
    # the per-(doc, term) count table is materialized (eager local
    # checkpoint) so the tf and df branches both read it instead of
    # each re-running the explode over the corpus
    n_docs = documents.count()
    per_doc = (
        toks.groupBy("doc_id", "grp", "term")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    tf = per_doc.groupBy("grp", "term").agg(F.sum("c").alias("tf"))
    df_tbl = per_doc.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df_tbl, "term").select(
        "grp",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias(
            "raw_score"
        ),
    )
    w = Window.partitionBy("grp").orderBy(
        F.desc("raw_score"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("grp").alias(group_col),
            "term",
            F.round("raw_score", 6).alias("score"),
            F.col("rn").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------


def dataset_split(
    documents: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by hash bucket — the
    reproducible alternative to randomSplit (whose output depends on
    partitioning): the same row lands in the same split on every run,
    engine, and cluster size, and membership is auditable from the key
    alone. Uses the engine-portable md5/15-hex-char hash (hash_bucket)
    so the assignment is bit-identical in DuckDB oracle SQL.

    Map-only (no shuffle, no RNG); downstream consumers filter on the
    split column and the filter pushes down to the scan.
    """
    b = hash_bucket(F.col(key_col))
    return documents.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


# ---------------------------------------------------------------------------
# distributed exact NTILE (no single-partition global sort)
# ---------------------------------------------------------------------------


def distributed_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(k) over a GLOBAL order without the single-task
    window: `ntile(k) OVER (ORDER BY ...)` in Spark collapses the
    whole table into ONE window partition — the classic global-ranking
    bottleneck at scale. This computes the identical bucket assignment
    distributed:

      1. repartitionByRange on the order columns (range exchange —
         equal keys co-locate, boundaries from a driver-side sample);
      2. per-partition counts (tiny collect: one long per partition)
         turned into cumulative offsets;
      3. global rank = offset[partition] + row_number within the
         partition (sortWithinPartitions — no cross-partition sort);
      4. SQL-standard NTILE arithmetic from (rank, n, k): the first
         n % k buckets get ceil(n/k) rows, the rest floor(n/k).

    The order must be a TOTAL order (include a tie-break key), or
    ranks within a tie would be partition-dependent. Output = input
    columns + `bucket` (1-based, identical to the built-in ntile).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    nparts = num_partitions or max(
        2, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    )
    ranged = df.repartitionByRange(nparts, *order_cols).sortWithinPartitions(
        *order_cols
    ).withColumn("__pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=True)
    sizes = dict(
        (r["__pid"], r["cnt"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    n = sum(sizes.values())
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    big, small = (n % k), (n // k)
    cut = big * (small + 1)  # ranks <= cut are in the big buckets
    rank = (off_map[F.col("__pid")] + F.row_number().over(w)).alias("__rank")
    ranked = ranged.withColumn("__rank", rank)
    bucket = F.when(
        F.col("__rank") <= cut,
        F.ceil(F.col("__rank") / F.lit(small + 1)),
    ).otherwise(
        F.lit(big)
        + F.ceil((F.col("__rank") - F.lit(cut)) / F.lit(max(small, 1)))
    )
    return ranked.withColumn("bucket", bucket.cast("int")).drop(
        "__pid", "__rank"
    )


# ---------------------------------------------------------------------------
# table profiling (data-quality audit)
# ---------------------------------------------------------------------------


def table_profile(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Per-column data-quality profile — null count, distinct count,
    min, max (min/max computed in the column's native type, then
    stringified) — the audit every ingest of untrusted web data runs
    before anything downstream trusts the table.

    One full scan, ONE aggregate producing all stats, then an in-plan
    `stack` unpivot to (col_name, n_nulls, n_distinct, min_value,
    max_value) rows — no per-column jobs, no driver-side loop over
    data. Exact multi-column countDistinct makes Catalyst EXPAND the
    input (one replica per distinct-agg): explicit and acceptable for
    an audit op; pass exact=False to use approx_count_distinct (HLL)
    instead, which removes the expansion — the right default at
    100 TB where a +-2% distinct estimate is fine.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        distinct = (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct.alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stacked}) AS "
        "(col_name, n_nulls, n_distinct, min_value, max_value)"
    )


# ---------------------------------------------------------------------------
# portable Bloom filter (runtime-filter primitive)
# ---------------------------------------------------------------------------


def _bloom_hash(key_str_col, i: int, m_bits: int):
    """i-th Bloom hash: engine-portable md5/15-hex 64-bit hash of
    key:":i" mod m_bits — same construction as hash_bucket, so the
    whole filter is bit-identical in DuckDB oracle SQL."""
    h = F.conv(
        F.substring(F.md5(F.concat(key_str_col, F.lit(f":{i}"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(m_bits))


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 65536, k_hashes: int = 4
) -> DataFrame:
    """Build a Bloom filter over a key column as a SPARSE word table
    (word_idx, word) of 32-bit words — the runtime-filter primitive:
    at 100 TB you build this from the small side of a join in one
    cheap agg, broadcast it (the whole filter is m_bits/32 rows ~ a
    few KB), and drop non-matching fact rows BEFORE the shuffle that
    a semi-join would need. False positives only — never drops a
    matching row.

    Shape: distinct keys -> explode k hash positions -> bit_or agg per
    word. 32-bit words keep every shifted bit positive in a BIGINT on
    both engines (bit 63 is range-checked by DuckDB's ANSI shift).
    """
    keys = df.select(F.col(key_col).cast("string").alias("__key")).distinct()
    hs = F.array(
        *[_bloom_hash(F.col("__key"), i, m_bits) for i in range(k_hashes)]
    )
    return (
        keys.select(F.explode(hs).alias("h"))
        .select(
            F.shiftright("h", 5).cast("int").alias("word_idx"),
            F.col("h").bitwiseAND(F.lit(31)).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            ).alias("word")
        )
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 65536,
    k_hashes: int = 4,
) -> DataFrame:
    """Probe a bloom_build table: emits the input keys plus a `pass`
    flag (true iff all k bits are set — member keys ALWAYS pass;
    non-members pass at the false-positive rate). The bloom side is
    broadcast (it is tiny by construction), so probing is map-side
    only — no shuffle on the probed table beyond the final per-key
    agg, and when the key is already distinct that agg is map-side."""
    key = F.col(key_col).cast("string")
    hs = F.array(*[_bloom_hash(key, i, m_bits) for i in range(k_hashes)])
    probes = (
        df.select(F.col(key_col), F.explode(hs).alias("h"))
        .select(
            key_col,
            F.shiftright("h", 5).cast("int").alias("word_idx"),
            F.col("h").bitwiseAND(F.lit(31)).cast("int").alias("bit"),
        )
        .join(F.broadcast(bloom), "word_idx", "left")
        .select(
            key_col,
            (
                F.coalesce(F.col("word"), F.lit(0))
                .bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
                )
                != 0
            ).alias("hit"),
        )
    )
    # a key appearing r times in df yields r*k_hashes probe rows;
    # pass iff EVERY row's bit is set (min over hits), never
    # sum==k_hashes, which would false-negative all duplicated keys
    return probes.groupBy(key_col).agg(
        (F.min(F.col("hit").cast("int")) == 1).alias("pass")
    )


def key_skew_stats(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Hot-key diagnosis — the measurement that precedes every salting
    / skew-join decision: the top_n heaviest values of a prospective
    join/agg key with their row share. One partial-aggregated count
    per key + a TakeOrderedAndProject for the top-n; the total rides
    along as a broadcast 1-row cross join (no second scan, no driver
    round-trip in the plan). Output: (rank, key, n_rows, share_pct
    rounded 6)."""
    from pyspark.sql import Window  # noqa: PLC0415

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("n_rows")
    ).localCheckpoint(eager=True)
    # total derives from the per-key counts (null keys included) — the
    # input is scanned exactly once
    total = counts.agg(F.sum("n_rows").alias("__total"))
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        counts.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_n)
        .crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "n_rows",
            F.round(
                F.col("n_rows") * 100.0 / F.col("__total"), 6
            ).alias("share_pct"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout for multi-dimensional pruning
# ---------------------------------------------------------------------------


def _width_bucket(col, vmin, vmax, bits: int):
    """Equal-width bucket index in [0, 2^bits) from broadcast min/max
    columns — pure per-row arithmetic (no summation anywhere), so the
    result is bit-identical across engines."""
    n = 1 << bits
    scaled = (col.cast("double") - vmin) / (vmax - vmin) * F.lit(float(n))
    b = F.least(F.floor(scaled), F.lit(n - 1)).cast("int")
    return F.when(vmax == vmin, F.lit(0)).otherwise(
        F.greatest(b, F.lit(0))
    )


def zorder_value(bucket_cols: list, bits: int):
    """Morton/Z-value: interleave the bits of per-dimension bucket
    indices — bit j of dimension i lands at position j*ndims + i. All
    static shifts/masks: whole-stage-codegen JVM integer math."""
    nd = len(bucket_cols)
    if bits * nd > 62:
        raise ValueError("bits * ndims must stay within a signed long")
    z = F.lit(0).cast("long")
    for i, bc in enumerate(bucket_cols):
        for b in range(bits):
            bit = F.shiftright(bc.cast("long"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * nd + i)
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_files: int = 16,
) -> DataFrame:
    """Z-order data layout — the multi-dimensional answer to 'which
    column do I sort by': rows close in EVERY listed dimension land in
    the same files, so parquet min/max stats prune a box predicate on
    ANY subset of the dimensions (a single-column sort only prunes its
    own column; every other dimension's range spans every file).
    Standard practice for 100 TB lakehouse tables (Delta/Iceberg
    `OPTIMIZE ZORDER BY`); Spark has no built-in, so this composes
    one from primitives:

      1. per-dimension equal-width bucket from a broadcast min/max agg
         (one tiny extra agg, map-only after it — equal-FREQUENCY
         binning via distributed_ntile is the upgrade under heavy
         skew);
      2. Morton interleave of the bucket bits (JVM integer math);
      3. repartitionByRange + sortWithinPartitions on the z-value —
         one range exchange, no global sort.

    Returns the input plus `zvalue`, partitioned and sorted for a
    direct `.write.parquet()`.
    """
    stats = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            )
        ]
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    buckets = [
        _width_bucket(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    keyed = with_stats.withColumn(
        "zvalue", zorder_value(buckets, bits)
    ).drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    return keyed.repartitionByRange(num_files, "zvalue").sortWithinPartitions(
        "zvalue"
    )


# ---------------------------------------------------------------------------
# incremental dedup against the materialized corpus fingerprint table
# ---------------------------------------------------------------------------


def incremental_exact_dedup(
    io,
    spark,
    new_docs: DataFrame,
    table: str = "corpus_fingerprints",
    batch_id: str | None = None,
) -> DataFrame:
    """Dedupe an INCOMING batch against everything already ingested
    WITHOUT rescanning the corpus — the incremental form of
    exact_dedup: prior batches' fingerprints are a materialized
    append-mode TableIO table; the new batch joins against that (tiny
    relative to the corpus text) instead of the corpus itself.

    Semantics: first-writer-wins by arrival — a document whose
    normalized-text fingerprint was ever ingested is dropped; within
    one batch the lowest doc_id survives (same tie-break as
    exact_dedup). Survivors' fingerprints are appended, so calls
    compose: N appends see exactly the union of all prior survivors.

    Crash-replay safety: the fingerprint commit is keyed by a
    batch_id (caller-supplied, else derived from the batch's
    fingerprint content), and a replay of the same batch excludes its
    own prior commit from the seen set — so if the caller crashed
    after this function but before persisting the survivors, re-
    running yields the SAME survivors (not []), closing the window
    where documents would be fingerprint-burned but never ingested.

    Scale shape: fingerprints are one md5 per doc (map-only); the
    dedup joins shuffle on the fingerprint hash — uniformly
    distributed by construction, no skew. Per-append cost is
    O(batch + fingerprint-table), never O(corpus text). Compact the
    fingerprint table periodically (TableIO.compact) to keep its file
    count flat.

    Returns the surviving rows of new_docs (all original columns).
    """
    fps = fingerprints(new_docs.select("doc_id", "text"))
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    batch_keep = (
        fps.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "fingerprint")
    )
    if batch_id is None:
        # content-derived batch identity: xor of the portable 64-bit
        # fingerprint hashes — one tiny agg over the already-computed
        # fingerprint column, order-independent and deterministic
        row = batch_keep.agg(
            F.bit_xor(_seeded_hash64(F.col("fingerprint"), 0, "md5")).alias(
                "x"
            ),
            F.count("*").alias("n"),
        ).collect()[0]
        batch_id = f"b{row['n']}x{(row['x'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"
    manifest_snaps = []
    try:
        manifest_snaps = io.accumulated_snapshots(table)
    except FileNotFoundError:
        pass
    prior = [
        s
        for s in manifest_snaps
        if s.get("metadata", {}).get("batch_id") == batch_id
    ]
    seen_paths = [
        s["path"]
        for s in manifest_snaps
        if s.get("metadata", {}).get("batch_id") != batch_id
    ]
    if seen_paths:
        seen = spark.read.parquet(*seen_paths).select("fingerprint")
        fresh = batch_keep.join(seen, "fingerprint", "left_anti")
    else:
        fresh = batch_keep
    fresh = fresh.localCheckpoint(eager=True)
    if not prior:
        # committed AFTER survivors are pinned; a crash-and-replay of
        # the same batch excludes its own earlier commit from the seen
        # set (batch_id-keyed, like the streaming sink's batch ids), so
        # replay returns the SAME survivors instead of [] — no window
        # where documents are fingerprint-burned but never ingested
        io.commit(
            table,
            fresh.select("fingerprint"),
            metadata={"mode": "append", "batch_id": batch_id},
        )
    return new_docs.join(fresh.select("doc_id"), "doc_id", "left_semi")


# ---------------------------------------------------------------------------
# corpus-level paragraph dedup + LM scoring + model-based quality
# (CCNet-style cleaning stages; all JVM-side, DuckDB-oracle-checkable)
# ---------------------------------------------------------------------------


def _doc_paragraphs(
    documents: DataFrame,
    mode: str = "window",
    delim: str = "\n",
    words_per_para: int = 4,
) -> DataFrame:
    """(doc_id, pos, para) — position-preserving paragraph split.

    mode="delims" splits raw text on `delim` (real corpora: newline
    paragraphs); mode="window" chops the normalized word stream into
    fixed `words_per_para`-word windows (the fixture corpus has no
    newlines, and a fixed window is the common fallback for
    boilerplate-span removal when paragraph boundaries are unreliable).
    Both are pure per-row array ops — zero shuffle.
    """
    if mode == "delims":
        paras = F.split(F.col("text"), F.lit(delim), -1)
    else:
        words = F.split(norm_text(F.col("text")), " ")
        k = words_per_para

        def _win(i):
            return F.array_join(
                F.slice(words, (i - F.lit(1)) * k + 1, k), " "
            )

        paras = F.transform(
            F.sequence(
                F.lit(1),
                F.ceil(F.size(words) / F.lit(k)).cast("int"),
            ),
            _win,
        )
    return documents.select(
        "doc_id", F.posexplode(paras).alias("pos", "para")
    )


def paragraph_dedup(
    documents: DataFrame,
    min_docs: int = 2,
    mode: str = "window",
    delim: str = "\n",
    words_per_para: int = 4,
) -> DataFrame:
    """CCNet-style corpus-level paragraph deduplication: drop every
    copy of any paragraph whose normalized form appears in >= min_docs
    DISTINCT documents (boilerplate headers/footers/navigation chrome
    repeat across pages; CCNet removes all copies, which is the
    semantics here — within-doc repetition alone does not trigger).

    Scale shape: posexplode (zero shuffle) -> distinct (para_hash,
    doc_id) -> one map-side-combinable count per para_hash -> the
    DUPLICATED-paragraph set only (typically a small fraction of the
    corpus) becomes the build side of a left_anti hash join back to
    the paragraph stream. The anti-join build side never holds unique
    paragraphs, so at 10^12 docs it is the boilerplate table, not the
    corpus. Reassembly is one groupBy doc_id with an algebraic
    collect + array_sort on (pos, para) — per-doc row counts are
    bounded by document length.

    The reference has no corpus-cleaning stage at all (its flow is
    chunk->LLM-extract, /root/reference/src/builders/graphrag.py);
    this is a first-class training-data operator the engine adds.

    Returns (doc_id, n_paras, n_dropped, clean_md5) — clean_md5 is
    md5 of the surviving paragraphs joined by newline, the compact
    per-row invariant for the oracle.
    """
    paras = (
        _doc_paragraphs(
            documents, mode=mode, delim=delim,
            words_per_para=words_per_para,
        )
        .withColumn("para_hash", F.md5(norm_text(F.col("para"))))
        # reused by the dup-set agg, the anti join, and the totals —
        # split the corpus into paragraphs once
        .localCheckpoint(eager=True)
    )
    dup = (
        paras.select("para_hash", "doc_id")
        .distinct()
        .groupBy("para_hash")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("para_hash")
    )
    kept = paras.join(dup, "para_hash", "left_anti")
    totals = paras.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_paras")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "para"))
                    ),
                    lambda s: s["para"],
                ),
                "\n",
            )
        ).alias("clean_md5"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_paras",
            (F.col("n_paras") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
            F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias(
                "clean_md5"
            ),
        )
    )


def unigram_lm_score(documents: DataFrame) -> DataFrame:
    """Language-model perplexity filter, unigram edition: train a
    unigram LM on the corpus itself (count(w)/total) and score each
    document by its average negative log-probability — the CCNet/KenLM
    quality gate re-expressed with the model that IS SQL-trainable
    in-engine. Rare-word-heavy (OOV-ish, gibberish) documents score
    high; head-vocabulary prose scores low. In production the unigram
    table is swapped for an external KenLM via the same join shape.

    Scale shape: one explode -> (doc_id, word) counts (map-side
    combinable) -> global word counts (same) -> one hash join on word
    between per-doc tf and the corpus LM -> per-doc weighted sum.
    The LM table has vocabulary cardinality, joined on its key — no
    broadcast needed, no skew (word frequency skews the COUNTING,
    which partial aggregation absorbs, not the join fanout: one LM row
    per word).

    Returns (doc_id, n_tokens, avg_neg_logp, ppl) rounded to 6 dp.
    """
    words = (
        documents.select(
            "doc_id",
            F.explode(F.split(norm_text(F.col("text")), " ")).alias(
                "word"
            ),
        )
        .filter(F.col("word") != "")
        # the token stream feeds two independent aggregations (per-doc
        # tf and the corpus LM); checkpoint it once so the corpus is
        # tokenized one time, not once per branch
        .localCheckpoint(eager=True)
    )
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    lm = words.groupBy("word").agg(F.count("*").alias("c"))
    total = lm.agg(F.sum("c").alias("total"))
    scored = (
        tf.join(lm, "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            (
                F.sum(
                    F.col("tf")
                    * -F.log(F.col("c") / F.col("total"))
                )
                / F.sum("tf")
            ).alias("anlp"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round("anlp", 6).alias("avg_neg_logp"),
        F.round(F.exp("anlp"), 6).alias("ppl"),
    )


QUALITY_CLF_BUCKETS = 4096


def quality_classifier(
    documents: DataFrame, n_buckets: int = QUALITY_CLF_BUCKETS
) -> DataFrame:
    """fastText-style linear quality classifier over hashing-trick
    bag-of-words features: bucket = hash(word) % n_buckets, score =
    sigmoid(mean bucket weight). The weight vector here is a
    deterministic pseudo-model (Knuth-hash of the bucket id mapped to
    ~[-1, 1]) so the plumbing is oracle-checkable end-to-end; a
    trained model drops in as the same (bucket, weight) table. The
    denominator is a power of two so every weight is binary-exact and
    the weighted sum is order-independent across partitions (a /1000
    pseudo-weight flipped the 6th rounded decimal between engines).

    Scale shape: explode -> per-(doc, bucket) tf (map-side combinable)
    -> BROADCAST hash join against the n_buckets-row weight table ->
    per-doc weighted mean. The weight table is O(n_buckets) regardless
    of vocabulary or corpus size — this is the pattern that lets a
    model with millions of features score 10^12 documents with zero
    shuffle on the corpus side (the only exchange is the per-doc agg).

    Returns (doc_id, n_tokens, raw_score, quality_prob) rounded 6 dp.
    """
    spark = documents.sparkSession
    weights = spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            (F.col("id") * F.lit(2654435761) % F.lit(2049) - F.lit(1024))
            / F.lit(1024.0)
        ).alias("weight"),
    )
    feats = (
        documents.select(
            "doc_id",
            F.explode(F.split(norm_text(F.col("text")), " ")).alias(
                "word"
            ),
        )
        .filter(F.col("word") != "")
        .select(
            "doc_id", hash_bucket(F.col("word"), n_buckets).alias("bucket")
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            (
                F.sum(F.col("tf") * F.col("weight")) / F.sum("tf")
            ).alias("raw"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round("raw", 6).alias("raw_score"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("raw"))), 6
        ).alias("quality_prob"),
    )


# ---------------------------------------------------------------------------
# warehouse temporal patterns: SCD2 history + range-frame trailing windows
# ---------------------------------------------------------------------------


def scd2_history(events: DataFrame) -> DataFrame:
    """Type-2 slowly-changing-dimension materialization from a change
    stream: collapse each user's consecutive runs of the same state
    (event_type) into validity intervals [valid_from, valid_to) with
    an is_current flag — the standard CDC->warehouse history build
    (gaps-and-islands: change flag -> running-sum run id -> one agg,
    then lead() for the closing timestamp).

    Scale shape: ONE exchange on user_id; every window and the run
    aggregation reuse that same partitioning (Catalyst collapses them
    into a single sort within the shuffle), so a 10^12-row change log
    costs one shuffle. Skew bound = events per user, bounded by
    per-entity activity, not corpus size.

    Timestamps are emitted as epoch MICROS bigints (engine-portable;
    valid_to = -1 marks the open/current interval).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    us = ts_micros(events, "ts")
    ev = events.select(
        "user_id",
        F.col("event_type").alias("state"),
        us.alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    runs = ev.withColumn(
        "chg",
        F.when(
            F.lag("state").over(w).isNull()
            | (F.lag("state").over(w) != F.col("state")),
            1,
        ).otherwise(0),
    ).withColumn("run_id", F.sum("chg").over(w))
    hist = runs.groupBy("user_id", "run_id").agg(
        F.first("state").alias("state"),
        F.min("ts_us").alias("valid_from_us"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    return hist.select(
        "user_id",
        "state",
        "valid_from_us",
        F.coalesce(
            F.lead("valid_from_us").over(w2), F.lit(-1).cast("long")
        ).alias("valid_to_us"),
        (F.lead("valid_from_us").over(w2).isNull()).alias("is_current"),
        "n_events",
    )


def trailing_window_agg(
    orders: DataFrame, days: int = 30
) -> DataFrame:
    """Trailing time-RANGE window aggregate: for every order, the
    count / sum / avg of the same customer's order totals over the
    preceding `days` days INCLUSIVE of the current row — the moving
    feature used for spend velocity and fraud baselines. A RANGE frame
    over epoch micros (not ROWS) so simultaneous orders are all in
    frame regardless of tie order, which is what makes the result
    engine-deterministic.

    One exchange on o_custkey; the frame scan is sort-local within the
    partition. Skew bound = orders per customer.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    us = ts_micros(orders, "o_orderdate")
    span = days * 86400 * 1_000_000
    base = orders.select(
        "o_orderkey", "o_custkey", us.alias("order_us"), "o_totalprice"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_us")
        .rangeBetween(-span, 0)
    )
    return base.select(
        "o_orderkey",
        "o_custkey",
        "order_us",
        F.count("*").over(w).cast("bigint").alias("n_in_window"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_sum"),
        # avg derives from the ROUNDED sum: the totals have 2 decimals,
        # so round(sum, 2) is exact and order-independent, and the avg
        # inherits that determinism instead of re-summing doubles
        F.round(
            F.round(F.sum("o_totalprice").over(w), 2)
            / F.count("*").over(w),
            6,
        ).alias("trailing_avg"),
    )


# ---------------------------------------------------------------------------
# declarative data-quality checks (dbt-test-style) over any tables
# ---------------------------------------------------------------------------


def data_quality_report(
    tables: dict[str, DataFrame], checks: list[dict]
) -> DataFrame:
    """Declarative constraint validation (the dbt-tests / Deequ
    pattern): run a list of checks and return one row per check with
    its violation count — the gate a 100 TB ingest runs before
    publishing a snapshot. Check specs:

      {"id", "type": "not_null",   "table", "column"}
      {"id", "type": "unique",     "table", "columns": [..]}
      {"id", "type": "range",      "table", "column", "min"?, "max"?}
      {"id", "type": "accepted",   "table", "column", "values": [..]}
      {"id", "type": "referential","table", "column",
                                   "ref_table", "ref_column"}

    Scale shape: every check is a single column-pruned scan + one
    algebraic aggregate; `unique` is a map-side-combinable count per
    key; `referential` is a left_anti join whose strategy is left to
    the planner/AQE (a dimension-sized parent broadcasts on its own;
    forcing broadcast would OOM on a fact-sized parent). The checks
    never materialize violating ROWS (that is a debugging query),
    only counts, so each costs one pass regardless of violation
    volume. The per-check counts are collected in a driver loop (one
    tiny job per check — the checks scan DIFFERENT tables/columns, so
    there is no shared exchange to fuse; at scale the wins come from
    column pruning and partial aggs, not from stuffing unrelated
    scans into one plan).
    """
    spark = next(iter(tables.values())).sparkSession
    outs = []
    for c in checks:
        t = tables[c["table"]]
        kind = c["type"]
        if kind == "not_null":
            n = t.filter(F.col(c["column"]).isNull()).count()
        elif kind == "unique":
            n = (
                t.groupBy(*c["columns"])
                .agg(F.count("*").alias("c"))
                .filter(F.col("c") > 1)
                .agg(
                    F.coalesce(
                        F.sum(F.col("c") - 1), F.lit(0)
                    ).alias("n")
                )
                .first()["n"]
            )
        elif kind == "range":
            cond = F.lit(False)
            if "min" in c:
                cond = cond | (F.col(c["column"]) < F.lit(c["min"]))
            if "max" in c:
                cond = cond | (F.col(c["column"]) > F.lit(c["max"]))
            n = t.filter(cond | F.col(c["column"]).isNull()).count()
        elif kind == "accepted":
            n = t.filter(
                ~F.col(c["column"]).isin(c["values"])
                | F.col(c["column"]).isNull()
            ).count()
        elif kind == "referential":
            parent = tables[c["ref_table"]].select(
                F.col(c["ref_column"]).alias(c["column"])
            )
            n = (
                t.select(c["column"])
                .join(parent, c["column"], "left_anti")
                .count()
            )
        else:
            raise ValueError(f"unknown check type: {kind}")
        outs.append((c["id"], kind, c["table"], int(n)))
    return spark.createDataFrame(
        outs,
        "check_id string, check_type string, table_name string,"
        " n_violations bigint",
    )


# ---------------------------------------------------------------------------
# exact set-similarity join (prefix filtering) + weighted sampling
# ---------------------------------------------------------------------------


def prefix_jaccard_join(
    documents: DataFrame, threshold: float = 0.5, n: int = 3
) -> DataFrame:
    """EXACT Jaccard self-join over n-word shingle sets via prefix
    filtering (PPJoin family) — the deterministic complement to the
    MinHash/SimHash LSH paths: every pair at or above the threshold is
    RETURNED, none missed, yet no all-pairs stage exists.

    Pruning guarantee: order each doc's distinct tokens by ascending
    document frequency (rarest first, df ties broken by token); two
    sets with Jaccard >= t must share a token within each other's
    first floor((1-t)*|set|)+1 tokens, so blocking on that prefix
    loses nothing. Rare-first ordering makes prefix tokens the LEAST
    frequent — candidate buckets stay small exactly because the
    blocking keys are unpopular (the inverse of LSH's random bands).

    Scale shape: one tokenize pass -> df counts (map-side combinable)
    -> per-doc ordered token rank (one exchange on doc_id) -> prefix
    explode (bounded by (1-t)*|set|+1 per doc) -> bucket self-join on
    the prefix token -> pair-distinct -> ONE verify join computing
    exact intersection via the shared token lists. Verification joins
    only candidate pairs; bucket fanout is sum over prefix tokens of
    df(token)^2 where df is small BY CONSTRUCTION of the ordering.

    Returns (doc_a, doc_b, jaccard) for pairs >= threshold, doc_a <
    doc_b, jaccard rounded to 6 dp.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    # same shingle convention as minhash/ngram_jaccard, so the exact
    # and LSH near-dup families are directly comparable
    toks = (
        word_shingles(documents, n=n)
        .select("doc_id", F.col("shingle").alias("tok"))
        .filter(F.col("tok") != "")
        # reused by df counts, sizes, ranking, and the verify join —
        # shingle the corpus once
        .localCheckpoint(eager=True)
    )
    df_counts = toks.groupBy("tok").agg(F.count("*").alias("df"))
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ranked = (
        toks.join(df_counts, "tok")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "tok")
            ),
        )
        .join(sizes, "doc_id")
    )
    prefix = ranked.filter(
        F.col("rnk")
        <= F.floor((1.0 - threshold) * F.col("sz")) + F.lit(1)
    ).select("doc_id", "tok")
    a = prefix.select(F.col("doc_id").alias("doc_a"), "tok")
    b = prefix.select(F.col("doc_id").alias("doc_b"), "tok")
    cand = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("sza") + F.col("szb") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def weighted_sample(
    documents: DataFrame,
    weight_col: str,
    k: int = 100,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    Efraimidis-Spirakis A-ES scheme): draw k rows with inclusion
    odds proportional to `weight_col` — the training-mix primitive
    for "sample by quality score" — but with the uniform draw derived
    from an md5 hash of the key instead of rand(), so the SAME rows
    are chosen on every engine, run, and cluster size (auditable
    subsets, and a DuckDB oracle can reproduce them exactly).

    key = ln(u) / w with u = (hash64(key) + 1) / (2^60 + 1) in (0, 1];
    the k LARGEST keys win (equivalently top-k by u^(1/w)). One
    column-pruned scan + TakeOrderedAndProject — no shuffle beyond
    the top-k reduction. Zero/negative weights are excluded (their
    inclusion probability is 0).

    Returns (key_col, weight, sample_key) for the k winners.
    """
    h = md5_hash60(F.col(key_col))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float((1 << 60) + 1))
    sample_key = F.log(u) / F.col(weight_col)
    return (
        documents.filter(F.col(weight_col) > 0)
        .select(
            key_col,
            F.col(weight_col).alias("weight"),
            sample_key.alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), F.col(key_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# mergeable distinct-count sketches (incremental statistics at 100 TB)
# ---------------------------------------------------------------------------


def hll_partition_sketches(
    events: DataFrame, key: str = "user_id", part: str = "event_type"
) -> DataFrame:
    """Per-partition HLL sketches (Apache DataSketches via Spark's
    hll_sketch_agg): one binary sketch per `part` value. This is the
    INCREMENTAL distinct-count pattern for 100 TB pipelines — each
    ingest batch/day/partition aggregates its own fixed-size sketch
    (map-side combinable, bytes not rows), the sketches persist as a
    tiny table, and ANY grouping's distinct count is answered later by
    merging sketches — no rescan of the corpus, ever."""
    return events.groupBy(part).agg(
        F.hll_sketch_agg(key).alias("sketch"),
        F.count("*").cast("bigint").alias("n_rows"),
    )


def hll_merged_distinct(
    events: DataFrame, key: str = "user_id", part: str = "event_type"
) -> DataFrame:
    """Merge the per-partition sketches to (per-partition estimate,
    global estimate) — the global number is computed from the SKETCHES
    (hll_union_agg), not the data, demonstrating the algebra a
    snapshot-level stats table relies on. Returns one row per `part`
    plus a '__all__' row."""
    # sketch once; the per-partition projection and the union row both
    # read the (tiny) sketch table
    sk = hll_partition_sketches(events, key=key, part=part).localCheckpoint(
        eager=True
    )
    per = sk.select(
        F.col(part).alias("partition"),
        "n_rows",
        F.hll_sketch_estimate("sketch").cast("bigint").alias(
            "distinct_est"
        ),
    )
    allrow = sk.agg(
        F.lit("__all__").alias("partition"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("bigint")
        .alias("distinct_est"),
    )
    return per.unionByName(allrow)


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-independent content checksum of a table: xor of per-row
    64-bit md5 hashes + row count. Two snapshots are byte-equal in
    content iff (n_rows, checksum) match — the O(1)-output equality
    probe for migration cutovers, snapshot compaction, and CDC
    reconciliation at 100 TB (one map-side pass, a single xor
    aggregate; no sort, no collect, no row movement).

    xor (not sum) keeps the aggregate exact and order-independent in
    64-bit ANSI arithmetic — a sum of full-range hashes overflows.
    Each column is hashed SEPARATELY into a fixed-width token (NULL ->
    a distinct sentinel) before the row hash, so NULL-position swaps
    and values containing a would-be separator cannot collide.
    Multiset caveat: xor cancels DUPLICATE rows in pairs, so tables
    differing only by an even number of copies of the same row
    collide; include a uniquifying key in `cols` when rows can repeat.
    """
    cols = cols or df.columns
    row_hash = md5_hash60(
        F.concat(
            *[
                F.coalesce(F.md5(F.col(c).cast("string")), F.lit("-"))
                for c in cols
            ]
        )
    )
    return df.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.coalesce(F.bit_xor(row_hash), F.lit(0)).cast("bigint").alias(
            "checksum"
        ),
    )


def bigram_lm_score(documents: DataFrame, alpha: float = 0.4) -> DataFrame:
    """Bigram language-model quality gate with stupid-backoff — the
    step up from unigram_lm_score toward the CCNet/KenLM filter, still
    trained entirely in-engine: p(w2|w1) = c(w1 w2)/c(w1 *) when the
    bigram was seen, else alpha * p_unigram(w2). Documents full of
    never-seen-together word pairs (shuffled/gibberish text) score
    high even when every individual word is common — the failure mode
    a unigram LM cannot see.

    Scale shape: one tokenize pass feeds three map-side-combinable
    counts (doc-bigram tf, corpus bigram, corpus unigram); scoring is
    one hash join on the bigram + a backoff join on the second word.
    LM tables have vocab / vocab^2-observed cardinality, joined on
    their keys — corpus-size-independent state, same join shape as an
    external KenLM lookup.

    Returns (doc_id, n_bigrams, avg_neg_logp, ppl) rounded to 6 dp;
    single-word docs have no bigrams and are absent (same convention
    as unigram_lm_score on empty docs).
    """
    words = F.split(norm_text(F.col("text")), " ")
    tail_len = F.greatest(F.size(words) - 1, F.lit(0))
    bigrams = documents.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(words, 1, tail_len),
                F.slice(words, 2, tail_len),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2").filter(
        (F.col("w1") != "") & (F.col("w2") != "")
    ).localCheckpoint(eager=True)  # feeds four aggregation branches
    tf = bigrams.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").alias("tf")
    )
    bg_counts = bigrams.groupBy("w1", "w2").agg(
        F.count("*").alias("c12")
    )
    w1_counts = bigrams.groupBy("w1").agg(F.count("*").alias("c1"))
    uni = bigrams.groupBy(F.col("w2").alias("u_w")).agg(
        F.count("*").alias("cu")
    )
    uni_total = uni.agg(F.sum("cu").alias("ut"))
    scored = (
        tf.join(bg_counts, ["w1", "w2"])
        .join(w1_counts, "w1")
        .join(uni, tf["w2"] == F.col("u_w"))
        .crossJoin(F.broadcast(uni_total))
        .select(
            "doc_id",
            "tf",
            # every (w1,w2) here was observed (self-trained), so the
            # seen-bigram branch always applies on this corpus; the
            # backoff expression stays for external-LM parity and for
            # scoring documents not in the training set
            F.when(
                F.col("c12") > 0,
                F.col("c12") / F.col("c1"),
            )
            .otherwise(
                F.lit(alpha) * F.col("cu") / F.col("ut")
            )
            .alias("p"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        (F.sum(F.col("tf") * -F.log("p")) / F.sum("tf")).alias("anlp"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        F.round("anlp", 6).alias("avg_neg_logp"),
        F.round(F.exp("anlp"), 6).alias("ppl"),
    )


def char_entropy(documents: DataFrame) -> DataFrame:
    """Shannon entropy of the character distribution per document (in
    bits) — the cheap gibberish/binary-junk detector that complements
    the word-level gates: natural language sits near 4-4.5 bits/char,
    base64 blobs and key-mash noise push past 5, single-char spam
    drops toward 0. One explode over characters -> per-(doc, char)
    counts (map-side combinable) -> one algebraic agg; entropy derives
    from sum(c*log c) and the total, so no per-doc probability
    materializes.

    Returns (doc_id, n_chars_norm, entropy_bits) rounded to 6 dp; the
    entropy is over the NORMALIZED text (case-folded, whitespace
    collapsed) so it composes with the other fingerprint ops.
    """
    chars = documents.select(
        "doc_id",
        F.explode(F.split(norm_text(F.col("text")), "(?!$)")).alias("ch"),
    ).filter(F.col("ch") != "")
    cc = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    agg = cc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.log2("c")).alias("clogc"),
    )
    return agg.select(
        "doc_id",
        F.col("n").alias("n_chars_norm"),
        F.round(
            F.log2("n") - F.col("clogc") / F.col("n"), 6
        ).alias("entropy_bits"),
    )


def filtered_ann(
    embeddings: DataFrame,
    allowed: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Metadata-filtered vector search (the vector-DB 'pre-filter'
    strategy): restrict the candidate set with a semi-join on the
    allowed-id frame BEFORE any distance math, then exact cosine
    top-k over the survivors. Pre-filtering (vs post-filtering the
    top-k) guarantees k results whenever k matches exist and never
    wastes distance computations on rows the predicate excludes; the
    allowed set is typically a dimension-sized id list (broadcast) or
    a partition-pruned scan. One narrow scan + TakeOrderedAndProject,
    same as brute_force_ann."""
    from .query import cosine_score  # noqa: PLC0415

    cand = embeddings.join(
        allowed.select(F.col(allowed.columns[0]).alias(id_col)),
        id_col,
        "left_semi",
    )
    return (
        cand.select(
            id_col,
            cosine_score(F.col("embedding"), query_vec).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def curate_corpus(
    documents: DataFrame, k: int = 50, threshold_pct: float = 0.25
) -> DataFrame:
    """End-to-end training-corpus curation, composed from the
    engine's own primitives — the pipeline a data team actually runs,
    as ONE lazy plan:

      1. exact dedup (keep min doc_id per normalized fingerprint);
      2. model-based quality scoring of the survivors
         (quality_classifier — broadcast fixed-size weight table);
      3. SELF-CALIBRATED cutoff: drop the worst `threshold_pct`
         quantile of the corpus's own score distribution (exact
         interpolated percentile — no magic constants to re-tune per
         crawl);
      4. deterministic weighted sampling of the keepers by quality
         (A-ES, md5-derived uniforms) down to k documents.

    Every stage is individually oracle-checked elsewhere; this query
    checks their COMPOSITION end-to-end. Shuffle budget: dedup agg +
    classifier agg + one 1-row percentile + a zero-shuffle
    TakeOrdered — nothing quadratic, nothing collected but the
    threshold scalar.
    """
    survivors = exact_dedup(documents).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    kept_docs = documents.join(survivors, "doc_id", "left_semi")
    qc = quality_classifier(kept_docs).select("doc_id", "quality_prob")
    thr = qc.agg(
        F.expr(
            f"percentile(quality_prob, {threshold_pct})"
        ).alias("__thr")
    )
    keep = qc.crossJoin(F.broadcast(thr)).filter(
        F.col("quality_prob") >= F.col("__thr")
    )
    return weighted_sample(keep, "quality_prob", k=k)


def ewma_features(
    events: DataFrame, alpha: float = 0.5, window_rows: int = 10
) -> DataFrame:
    """Exponentially-weighted moving average of `value` per user — the
    recency-weighted feature behind spend-velocity / engagement-decay
    signals. Truncated to the last `window_rows` events and
    RENORMALIZED over the weights actually present, so early rows
    (fewer lags) are unbiased rather than damped toward zero.

    Implementation: the EWMA recurrence is unrolled into a FIXED
    weighted sum of lag(value, j) expressions over one (user_id,
    time)-ordered window — a single projection per row, one exchange
    on user_id, and (because the expression tree, not partition
    order, fixes the summation order) bit-deterministic across
    engines and cluster sizes. alpha defaults to 1/2 so every weight
    alpha*(1-alpha)^j is a negative power of two — binary-exact.

    Returns (event_id, user_id, ts_us, value, ewma) with ewma rounded
    to 6 dp.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    us = ts_micros(events, "ts")
    base = events.select(
        "event_id", "user_id", us.alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(window_rows):
        wj = alpha * (1.0 - alpha) ** j
        lagv = F.lag("value", j).over(w) if j else F.col("value")
        num = num + F.coalesce(lagv * F.lit(wj), F.lit(0.0))
        den = den + F.when(lagv.isNotNull(), F.lit(wj)).otherwise(
            F.lit(0.0)
        )
    return base.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.round(num / den, 6).alias("ewma"),
    )


def funnel_stages(
    events: DataFrame, stages: list[str] | None = None
) -> DataFrame:
    """Ordered funnel analysis: how many users reach each stage IN
    ORDER (stage k counts only events at-or-after the user's stage
    k-1 timestamp). One pass per stage: an algebraic min-timestamp agg
    on user_id, joined back to filter the next stage's candidate
    events — k stages = k small aggs on the SAME key, no windows over
    the whole stream, no per-user event sorting.

    Returns one row per stage: (stage_index, stage, n_users,
    median_hours_from_prev) — the conversion table.
    """
    stages = stages or ["signup", "view", "purchase"]
    us = ts_micros(events, "ts")
    ev = events.select(
        "user_id", "event_type", us.alias("ts_us")
    )
    spark = events.sparkSession
    prev = None  # DataFrame (user_id, reach_us) of the previous stage
    out_rows = []
    for i, stage in enumerate(stages):
        cand = ev.filter(F.col("event_type") == stage)
        if prev is not None:
            cand = cand.join(prev, "user_id").filter(
                F.col("ts_us") >= F.col("reach_us")
            )
        reached = cand.groupBy("user_id").agg(
            F.min("ts_us").alias("r_us"),
            *(
                [F.min(F.col("reach_us")).alias("p_us")]
                if prev is not None
                else []
            ),
        )
        if prev is not None:
            med = reached.agg(
                F.round(
                    F.expr("percentile((r_us - p_us) / 3.6e9, 0.5)"), 6
                ).alias("m")
            ).first()["m"]
        else:
            med = None
        n = reached.count()
        out_rows.append((i, stage, int(n), med))
        prev = reached.select(
            "user_id", F.col("r_us").alias("reach_us")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out_rows,
        "stage_index int, stage string, n_users bigint,"
        " median_hours_from_prev double",
    )


def value_moments(events: DataFrame) -> DataFrame:
    """Per-type distribution moments of the value stream: count, mean,
    sample stddev, skew proxy (mean - median), and the correlation of
    value with hour-of-day — the drift-monitoring panel a feature
    store recomputes per partition. All algebraic/sketchable
    aggregates (corr/stddev accumulate co-moments map-side), one
    exchange on the small group key.
    """
    us = ts_micros(events, "ts")
    hour = (us / F.lit(3.6e9)) % 24
    base = events.select(
        "event_type", "value", hour.alias("hod")
    )
    return base.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev_samp("value"), 6).alias("stddev_value"),
        F.round(
            F.avg("value") - F.expr("percentile(value, 0.5)"), 6
        ).alias("mean_minus_median"),
        F.round(F.corr("value", "hod"), 6).alias("corr_value_hour"),
    )


def dsir_importance(
    documents: DataFrame,
    target: DataFrame,
    n_buckets: int = QUALITY_CLF_BUCKETS,
    smoothing: float = 1.0,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023) over hashed n-gram features: score every corpus document by
    how much more likely its (hashed) unigram features are under a
    TARGET distribution than under the corpus distribution —
    log p_target(f)/p_corpus(f) averaged over the doc's features —
    then resample by that importance. The standard recipe for tilting
    a web crawl toward a quality domain (e.g. 'books+wiki') without a
    trained classifier.

    Scale shape: both feature distributions are FIXED-SIZE
    (n_buckets) hashed-count tables with add-`smoothing` smoothing —
    the target table is computed from the (small) target set, the
    corpus table from one map-side-combinable pass; the per-bucket
    log-ratio table broadcasts, so scoring 10^12 docs is one explode
    + one broadcast join + one per-doc agg, identical to
    quality_classifier's shape with a LEARNED (well, estimated)
    weight vector instead of a pseudo-model.

    Returns (doc_id, n_tokens, importance) — importance is the
    average per-token log-ratio, rounded to 6 dp; feed it to
    weighted_sample(F.exp(importance)-style weights) to resample.
    """
    def feats(df):
        return (
            df.select(
                "doc_id",
                F.explode(
                    F.split(norm_text(F.col("text")), " ")
                ).alias("word"),
            )
            .filter(F.col("word") != "")
            .select(
                "doc_id",
                hash_bucket(F.col("word"), n_buckets).alias("bucket"),
            )
        )
    spark = documents.sparkSession
    buckets = spark.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    def dist(df):
        # smoothed bucket distribution over ALL n_buckets ids
        c = df.groupBy("bucket").agg(F.count("*").alias("c"))
        full = buckets.join(c, "bucket", "left").select(
            "bucket", F.coalesce("c", F.lit(0)).alias("c")
        )
        tot = full.agg(F.sum("c").alias("t"))
        return full.crossJoin(F.broadcast(tot)).select(
            "bucket",
            (
                (F.col("c") + F.lit(smoothing))
                / (F.col("t") + F.lit(smoothing * n_buckets))
            ).alias("p"),
        )
    ratio = (
        dist(feats(target))
        .withColumnRenamed("p", "pt")
        .join(dist(feats(documents)).withColumnRenamed("p", "pc"), "bucket")
        .select(
            "bucket", (F.log("pt") - F.log("pc")).alias("logratio")
        )
    )
    return (
        feats(documents)
        .join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.avg("logratio"), 6).alias("importance"),
        )
    )


def equidepth_histogram(
    events: DataFrame, col: str = "value", k: int = 10
) -> DataFrame:
    """Equi-depth (equal-count) histogram of a column: k buckets with
    ~n/k rows each, reporting each bucket's [lo, hi] range, count, and
    mean — the optimizer-statistics / data-profiling histogram that an
    equal-WIDTH histogram cannot replace on skewed values. Built on
    distributed_ntile, so the global ordering never collapses into a
    single window task; the final per-bucket agg is k groups.
    """
    bucketed = distributed_ntile(
        events.select(col, "event_id"), [col, "event_id"], k=k
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.round(F.min(col), 6).alias("lo"),
        F.round(F.max(col), 6).alias("hi"),
        F.round(F.avg(col), 6).alias("mean_value"),
    )


def fuzzy_string_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Approximate string join between two TABLES: every (left, right)
    pair whose values are within `max_dist` Levenshtein edits — the
    record-linkage primitive (entity reconciliation, typo'd lookup
    tables), generalizing the query-side fuzzy term expansion to an
    arbitrary table pair.

    Blocking: two strings within d=1 edit share at least one char
    q-gram when long enough (an edit destroys at most q overlapping
    grams); grams are emitted at q=3 AND q=2 (q=2 keeps short-string
    recall, same ladder as the keyword-fuzzy index) and candidates
    additionally require |len difference| <= max_dist. The verify is
    one JVM levenshtein per CANDIDATE pair — never all-pairs; bucket
    fanout is bounded by gram frequency, and the gram tables are the
    only shuffles.

    Returns (left value, right value, dist) distinct pairs.
    """
    def _gram_at(s, q):
        # closure factory: a bare 2-arg lambda would be parsed as the
        # (element, index) binary transform form
        def f(i):
            return F.concat(F.lit(f"{q}|"), s.substr(i, F.lit(q)))

        return f

    def grams(df, col, out):
        s = F.lower(F.col(col))
        parts = []
        for q in (3, 2):
            n = F.greatest(F.length(s) - (q - 1), F.lit(1))
            parts.append(
                F.transform(
                    F.sequence(F.lit(1), n),
                    _gram_at(s, q),
                )
            )
        return df.select(
            F.col(col).alias(out),
            F.explode(
                F.array_distinct(F.flatten(F.array(*parts)))
            ).alias("gram"),
        )

    lg = grams(left, left_col, "l_val")
    rg = grams(right, right_col, "r_val")
    cand = (
        lg.join(rg, "gram")
        .select("l_val", "r_val")
        .filter(
            F.abs(F.length("l_val") - F.length("r_val"))
            <= F.lit(max_dist)
        )
        .distinct()
    )
    return cand.select(
        "l_val",
        "r_val",
        F.levenshtein(F.lower("l_val"), F.lower("r_val")).alias("dist"),
    ).filter(F.col("dist") <= max_dist)


# ---------------------------------------------------------------------------
# SemDeDup-style cluster-blocked semantic dedup (r4)
# ---------------------------------------------------------------------------

def semantic_dedup_pairs(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vectorized: bool | None = None,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """SemDeDup-shaped semantic near-dup (Abbas et al. 2023): cluster
    the embeddings first (k-means cells — here the same IVF assignment
    kernel the ANN index uses, argmax-cosine against a broadcast
    centroid set), then compare pairs ONLY within a cell. The third
    point of the engine's near-dup design space:

      * embedding_near_dup      — exact O(n^2), the declared oracle anchor
      * embedding_near_dup_lsh  — random-hyperplane banding (probabilistic)
      * semantic_dedup_pairs    — cluster-blocked exact-within-cell: the
        quadratic term collapses from n^2 to sum(n_cell^2), and the
        cell self-join shuffles on the cell key, so at 10^12 docs the
        cost is governed by the largest CLUSTER, not the corpus.
        Recall is bounded by cluster purity (true dups land in the
        same cell when centroids are meaningful) — the trade SemDeDup
        makes deliberately; the LSH variant covers the complement.

    Assignment auto-vectorizes above LITERAL_MATH_MAX_TERMS exactly
    like the ANN path. Returns (vec_a, vec_b, cell, cosine) pairs,
    vec_a < vec_b, cosine >= threshold — keep min(vec_a) per group for
    the survivor set, same convention as the other near-dup ops.

    `max_cell_rows` caps the quadratic term per cell: a DEGENERATE
    giant cell (exactly what boilerplate floods produce at crawl
    scale) is otherwise O(n_cell^2) no matter how good the centroids
    are. Cells above the cap are split deterministically by a
    secondary md5 hash of the vector id into ceil(n_cell /
    max_cell_rows) sub-cells, and pairs are generated only WITHIN a
    sub-cell — bounding every self-join group at ~max_cell_rows rows
    at a documented recall cost (cross-sub-cell dups are missed; the
    same trade as the Adamic-Adar hub cap). Off (None) by default —
    the exact-within-cell mode is the oracle anchor."""
    src = embeddings
    if id_col != "vec_id":
        # ivf_assign requires/emits the (vec_id, embedding) contract;
        # adapt the caller's id column on the way in and restore it on
        # the way out
        src = embeddings.withColumnRenamed(id_col, "vec_id")
    assigned = ivf_assign(src, centroids, vectorized=vectorized)
    if id_col != "vec_id":
        assigned = assigned.withColumnRenamed("vec_id", id_col)
    keys = ["cell"]
    if max_cell_rows is not None:
        # the cap path reads `assigned` three times (the size agg and
        # both self-join sides) and each read would re-run the full
        # pandas-UDF assignment matmul at production dims — checkpoint
        # it once, exactly the iterative-op discipline pagerank uses.
        # The cap-off (oracle) path keeps the pure lazy plan.
        assigned = assigned.localCheckpoint(eager=True)
        sizes = assigned.groupBy("cell").agg(
            F.ceil(F.count("*") / F.lit(max_cell_rows)).cast("int").alias("__n_sub")
        )
        # n_cells rows — broadcastable at any realistic nlist
        assigned = assigned.join(F.broadcast(sizes), "cell").withColumn(
            "subcell",
            F.pmod(
                F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                       16, 10).cast("long"),
                F.greatest(F.col("__n_sub"), F.lit(1)),
            ).cast("int"),
        ).drop("__n_sub")
        keys = ["cell", "subcell"]
    a = assigned.select(
        F.col(id_col).alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        *keys,
    )
    b = assigned.select(
        F.col(id_col).alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        *keys,
    )
    return (
        a.join(b, keys)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", "cell",
            pair_cosine(F.col("emb_a"), F.col("emb_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# per-source corpus composition report (r4)
# ---------------------------------------------------------------------------

def source_mix_report(documents: DataFrame) -> DataFrame:
    """Training-mix composition by source (the per-domain/per-crawl
    report a data team reads before weighting a mixture): per `source`
    — document count, distinct normalized-content fingerprints, the
    implied exact-dup rate, mean document length, and total whitespace
    tokens (same token semantics as token_stats so the two reports
    reconcile).

    Shape: one fingerprint projection + one two-level agg
    (count distinct via the fingerprint groupBy underneath a per-source
    rollup would double-shuffle; count(DISTINCT) lets Catalyst plan the
    single expand + two-phase agg). Columns are all algebraic — at
    10^12 docs this is one scan + one exchange on source (tens of
    groups), the cheapest possible report."""
    t = F.col("text")
    ws_tokens = F.when(
        F.length(F.trim(t)) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    return (
        documents.select(
            "source",
            F.md5(norm_text(t)).alias("fp"),
            F.length(t).cast("long").alias("n_chars"),
            ws_tokens.cast("long").alias("n_tok"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("fp").cast("long").alias("n_unique"),
            F.sum("n_tok").cast("long").alias("total_ws_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .withColumn(
            "dup_rate",
            F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 6),
        )
    )


# ---------------------------------------------------------------------------
# cross-source corpus diagnostics + balanced sampling (r4)
# ---------------------------------------------------------------------------

def source_overlap(
    documents: DataFrame, prefix_tokens: int | None = None
) -> DataFrame:
    """Exact content overlap between sources: Jaccard similarity of the
    normalized-fingerprint sets of every source pair that shares at
    least one document — the cross-source contamination diagnostic run
    before mixing crawls/dumps (a mirror site or re-crawled domain
    shows up as a high-Jaccard pair and would silently double-weight
    its content in a training mix).

    Scale shape: distinct (source, fp) projection, then a self-join on
    the FINGERPRINT — fanout is per-fp source multiplicity (tiny),
    never sources^2; pairs with zero intersection never materialize,
    which is what makes this work at millions of domains. Set sizes
    join back by source (two small aggs).

    `prefix_tokens=n` fingerprints only the first n normalized tokens
    — the lead-paragraph/syndication detector (mirrors and wire-copy
    share openings long before they share full bodies); None = exact
    full-content overlap."""
    if prefix_tokens is None:
        fp = F.md5(norm_text(F.col("text")))
    else:
        fp = F.md5(
            F.array_join(
                F.slice(
                    F.split(norm_text(F.col("text")), " "),
                    1, prefix_tokens,
                ),
                " ",
            )
        )
    fps = documents.select("source", fp.alias("fp")).distinct()
    sizes = fps.groupBy("source").agg(F.count("*").alias("n_fp"))
    a = fps.select(F.col("source").alias("source_a"), "fp")
    b = fps.select(F.col("source").alias("source_b"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return (
        inter.join(
            sizes.select(
                F.col("source").alias("source_a"), F.col("n_fp").alias("n_a")
            ),
            "source_a",
        )
        .join(
            sizes.select(
                F.col("source").alias("source_b"), F.col("n_fp").alias("n_b")
            ),
            "source_b",
        )
        .select(
            "source_a", "source_b", "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


def per_source_sample(documents: DataFrame, k: int = 5) -> DataFrame:
    """Deterministic balanced sample: k documents per source, chosen by
    md5(doc_id) order — the per-domain/per-crawl eval-set draw that is
    reproducible across engines, runs, and cluster sizes (no rand()).
    One exchange on source + a per-group window; group state is the
    top-k heap, so a billion-doc source costs its scan, not its sort."""
    from pyspark.sql import Window  # noqa: PLC0415

    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        documents.select(
            "source", "doc_id", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= k)
    )


def zipf_slope(documents: DataFrame, top_n: int = 500) -> DataFrame:
    """Zipf exponent of the corpus term distribution: OLS slope of
    ln(freq) on ln(rank) over the top_n terms — natural text sits near
    -1; a slope far off flags boilerplate floods or synthetic/spammy
    text before any model sees it. One tokenize->agg pass, then
    orderBy().limit(top_n) — TakeOrderedAndProject: a per-partition
    heap of top_n rows, never a global sort — and only the surviving
    <=top_n rows flow through the rank window + the 1-row regression
    agg (regr_slope is algebraic — map-side combinable). The r4 shape
    (global window, THEN filter rank<=top_n) ranked the entire distinct
    vocabulary through one task — at web scale [a-z0-9]+ over 10^12
    docs yields 10^9+ distinct tokens, so the limit must come first
    (same fix key_skew_stats uses)."""
    from pyspark.sql import Window  # noqa: PLC0415

    terms = (
        documents.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.col("term"))
    ranked = (
        terms.orderBy(F.desc("freq"), F.col("term"))
        .limit(top_n)
        .select("freq", F.row_number().over(w).cast("double").alias("rank"))
    )
    return ranked.agg(
        F.round(F.regr_slope(F.log("freq"), F.log("rank")), 6).alias(
            "zipf_slope"
        ),
        F.count("*").cast("long").alias("n_terms"),
    )


# ---------------------------------------------------------------------------
# collocations, vector sanity, cluster quality, temporal TWAP (r4, batch 2)
# ---------------------------------------------------------------------------

def collocations_pmi(
    documents: DataFrame, min_count: int = 5, k: int = 25
) -> DataFrame:
    """Top-k word collocations by pointwise mutual information:
    PMI(a,b) = ln( p(ab) / (p(a) p(b)) ) over ADJACENT token pairs —
    the phrase-mining primitive (multi-word entities, tokenizer merge
    candidates, boilerplate phrase detection). `min_count` suppresses
    the low-frequency PMI explosion (a pair seen once between two rare
    words scores absurdly high — the classic PMI failure mode).

    Shape: posexplode tokens, bigrams via a (doc_id, pos+1) self-join
    (join-based adjacency is engine-portable; array-slice zip needs
    length guards ANSI mode rejects), then two counting aggs (unigram,
    bigram — both map-side combinable). The corpus totals N and B ride
    as broadcast 1-row aggregates INSIDE the plan (no driver actions,
    no second pass over the token stream). Top-k is
    TakeOrderedAndProject on (rounded PMI, pair)."""
    toks = documents.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("pos", "w"),
    )
    uni = toks.groupBy("w").agg(F.count("*").cast("double").alias("n_w"))
    lhs = toks.select("doc_id", "pos", F.col("w").alias("a"))
    rhs = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("w").alias("b")
    )
    big_all = (
        lhs.join(rhs, ["doc_id", "pos"])
        .groupBy("a", "b")
        .agg(F.count("*").cast("double").alias("n_ab"))
    )
    totals = uni.agg(F.sum("n_w").alias("n_tokens")).crossJoin(
        big_all.agg(F.sum("n_ab").alias("n_bigrams"))
    )
    big = big_all.filter(F.col("n_ab") >= min_count)
    pmi = F.log(
        (F.col("n_ab") / F.col("n_bigrams"))
        / (
            (F.col("n_a") / F.col("n_tokens"))
            * (F.col("n_b") / F.col("n_tokens"))
        )
    )
    return (
        big.join(uni.select(F.col("w").alias("a"),
                            F.col("n_w").alias("n_a")), "a")
        .join(uni.select(F.col("w").alias("b"),
                         F.col("n_w").alias("n_b")), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a", "b",
            F.col("n_ab").cast("long").alias("n_pair"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "a", "b")
        .limit(k)
    )


def embedding_norm_stats(embeddings: DataFrame) -> DataFrame:
    """Vector sanity gate run before any ANN/dedup job: one row with
    corpus size, dimension spread, zero-norm count, and the norm
    distribution (a normalized corpus shows avg~1; a mixed-dim or
    zero-norm batch is an upstream bug caught here, not as NaN scores
    later — Spark sorts NaN ABOVE all doubles, so an unguarded zero
    norm would silently win every top-k). One scan, one algebraic agg."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(
                F.col("embedding"),
                lambda x: x.cast("double") * x.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return embeddings.select(
        F.size("embedding").alias("dim"), norm.alias("norm")
    ).agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.min("dim").cast("long").alias("dim_min"),
        F.max("dim").cast("long").alias("dim_max"),
        F.sum((F.col("norm") == 0).cast("long")).alias("n_zero_norm"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
    )


def kmeans_inertia(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vectorized: bool | None = None,
) -> DataFrame:
    """Clustering-quality report: per cell, member count and mean
    cosine DISTANCE (1 - cos) to the assigned centroid — the inertia
    curve that picks k and flags degenerate cells before an IVF index
    or a SemDeDup pass trusts the clustering. Same argmax-cosine
    assignment kernel as ivf_assign (auto-vectorized above the literal
    threshold) run with `with_score=True`, so the winning cosine comes
    out of the assignment itself — on the vectorized path that is the
    row max the matmul already computed, NOT a re-score against a
    centroid-literal array (re-scoring was the r4 codegen blowup: at
    dim 3072 x nlist 1024 the literal array is 3M terms and cannot
    codegen, defeating the vectorized assignment). One agg on cell."""
    assigned = ivf_assign(
        embeddings, centroids, vectorized=vectorized, with_score=True
    )
    return (
        assigned.select(
            "cell", (F.lit(1.0) - F.col("best_cos")).alias("dist")
        )
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.round(F.avg("dist"), 6).alias("avg_cos_dist"),
        )
        .orderBy("cell")
    )


def value_twap(events: DataFrame) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's value
    is weighted by the seconds until the user's NEXT event, so a
    reading that held for an hour outweighs ten one-second blips —
    the standard fix for irregularly-sampled metrics (price feeds,
    sensor states, engagement levels). The user's last event has no
    holding interval and drops out (users with one event emit NULL-free
    zero rows).

    One exchange on user_id; lead() reuses the same sort; the weighted
    mean derives from two SUMs of exact integer microsecond weights
    times values — engine-deterministic after the final round."""
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    mic = ts_micros(events, "ts")
    rows = events.select(
        "user_id", "value",
        (F.lead(mic, 1).over(w) - mic).alias("w_us"),
    ).filter(F.col("w_us").isNotNull())
    return (
        rows.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.round(
                F.sum(F.col("value") * F.col("w_us"))
                / F.sum("w_us"),
                6,
            ).alias("twap"),
        )
    )


def lm_perplexity_buckets(
    documents: DataFrame, head: float = 1.0 / 3, tail: float = 2.0 / 3
) -> DataFrame:
    """CCNet's signature move (Wenzek et al. 2020): split the corpus
    into head / middle / tail by LANGUAGE-MODEL perplexity percentiles
    of the corpus's own score distribution — head (lowest
    avg-neg-logp third) is near-certain clean prose, tail is the
    gibberish/boilerplate end, middle is where human review or a
    secondary classifier earns its keep. Self-calibrated like
    curate_corpus: no absolute perplexity constant to re-tune per
    crawl/language.

    Composition of oracle-checked parts: unigram_lm_score (the
    in-engine SQL-trainable LM; an external KenLM drops into the same
    join shape) -> two exact interpolated percentiles (one 1-row agg)
    -> a broadcast threshold row -> one CASE per doc. Bucketing
    compares the ROUNDED score against percentiles OF the rounded
    scores, so the cut is bit-deterministic across engines."""
    sc = unigram_lm_score(documents).select("doc_id", "avg_neg_logp")
    thr = sc.agg(
        F.expr(f"percentile(avg_neg_logp, {head!r})").alias("__t_head"),
        F.expr(f"percentile(avg_neg_logp, {tail!r})").alias("__t_tail"),
    )
    return sc.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "avg_neg_logp",
        F.when(F.col("avg_neg_logp") < F.col("__t_head"), F.lit("head"))
        .when(F.col("avg_neg_logp") < F.col("__t_tail"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
