"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched `mapInPandas` stages.

The Spark-side plumbing — schemas, UDF signatures, batch shapes,
partitioning — is real and tested. The codec work (JPEG decode, audio
resample, video frame extraction) is NOT: this container has no
image/audio libraries, so decode runs against a deterministic fake
container format (`KGSM`, below) and the real-codec path is a
clearly-marked stub behind an import-try (PIL), raising
NotImplementedError when absent. Swapping `_decode_payload` for a real
codec changes no schema, no partitioning, and no driver code.

Fake container format (deterministic, seeded by media_id):

    bytes 0-3   magic  b"KGSM"
    byte  4     kind   0=image 1=audio 2=video
    bytes 5-6   width  uint16 big-endian   (images/video)
    bytes 7-8   height uint16 big-endian   (images/video)
    bytes 9-10  n_frames uint16            (video; 1 for image, 0 audio)
    bytes 11-14 sample_rate uint32         (audio; 0 otherwise)
    bytes 15-   payload: n_frames fixed 64-byte frames (image/video)
                or sample bytes (audio), generated from sha256(media_id)

Reference parity note: the reference pipeline is text-only (PDF->text,
src/processors/pdf_reader.py:9-45); multimodal handling is an
extension required by the training-data-pipeline brief, not a port.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MAGIC = b"KGSM"
KINDS = {0: "image", 1: "audio", 2: "video"}
KIND_IDS = {v: k for k, v in KINDS.items()}
FRAME_BYTES = 64
HEADER_LEN = 15

MEDIA_DDL = (
    "media_id string, url string, kind string, content binary, "
    "meta map<string,string>"
)
META_DDL = (
    "media_id string, kind string, width int, height int, "
    "n_frames int, sample_rate int, n_payload_bytes long, valid boolean"
)
FRAMES_DDL = "media_id string, frame_idx int, frame binary"
FEATURES_DDL = "media_id string, feature array<float>"


# ---------------------------------------------------------------------------
# fake container codec (deterministic; the bit the real codec replaces)
# ---------------------------------------------------------------------------

def _payload_bytes(media_id: str, n: int) -> bytes:
    out = bytearray()
    counter = 0
    seed = media_id.encode("utf-8")
    while len(out) < n:
        out += hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return bytes(out[:n])


def encode_media(media_id: str, kind: str, width: int = 0, height: int = 0,
                 n_frames: int = 0, sample_rate: int = 0) -> bytes:
    head = MAGIC + struct.pack(
        ">BHHHI", KIND_IDS[kind], width, height, n_frames, sample_rate
    )
    n_payload = (
        n_frames * FRAME_BYTES if kind in ("image", "video") else sample_rate // 100
    )
    return head + _payload_bytes(media_id, n_payload)


def _decode_header(content: bytes | None) -> tuple:
    """(kind, width, height, n_frames, sample_rate, n_payload, valid)."""
    if not content or len(content) < HEADER_LEN or content[:4] != MAGIC:
        return (None, 0, 0, 0, 0, 0 if not content else len(content), False)
    kind_id, w, h, nf, sr = struct.unpack(">BHHHI", content[4:HEADER_LEN])
    kind = KINDS.get(kind_id)
    n_payload = len(content) - HEADER_LEN
    # truncated payload (shorter than the header declares) is invalid:
    # at corpus scale truncation is routine and must be quarantined,
    # not silently decoded into short frames
    truncated = kind in ("image", "video") and n_payload < nf * FRAME_BYTES
    return (kind, w, h, nf, sr, n_payload, kind is not None and not truncated)


def _decode_payload(content: bytes):  # pragma: no cover - stub
    """Real-codec decode stub. With PIL installed this would return a
    numpy pixel array; this container has no image libraries."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(content))
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL, which is not installed; "
            "use the KGSM deterministic-fake path (decode_meta/sample_frames)"
        ) from exc


# ---------------------------------------------------------------------------
# synthetic media corpus (seeded)
# ---------------------------------------------------------------------------

def media_df(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table: round-robin image/audio/video
    with size parameters derived from the id."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                kind = KINDS[i % 3]
                mid = f"m{i:08d}"
                w, h = 16 + (i % 7) * 16, 16 + (i % 5) * 16
                nf = 1 if kind == "image" else (0 if kind == "audio" else 2 + i % 6)
                sr = 8000 + (i % 4) * 4000 if kind == "audio" else 0
                rows.append({
                    "media_id": mid,
                    "url": f"https://example.org/media/{mid}",
                    "kind": kind,
                    "content": encode_media(mid, kind, w, h, nf, sr),
                    "meta": {"source": "synthetic", "seq": str(i)},
                })
            yield pd.DataFrame(rows)

    return (
        spark.range(n, numPartitions=partitions)
        .withColumnRenamed("id", "i")
        .mapInPandas(gen, schema=MEDIA_DDL)
    )


# ---------------------------------------------------------------------------
# decode / feature-extract / frame-sample stages (Arrow-batched)
# ---------------------------------------------------------------------------

def decode_meta(media: DataFrame) -> DataFrame:
    """Parse typed metadata out of the binary column. Malformed blobs
    yield valid=false rows instead of failing the stage (poison-pill
    safety at 10^12 scale)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_header(c) for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": [d[0] for d in decoded],
                "width": pd.array([d[1] for d in decoded], dtype="int32"),
                "height": pd.array([d[2] for d in decoded], dtype="int32"),
                "n_frames": pd.array([d[3] for d in decoded], dtype="int32"),
                "sample_rate": pd.array([d[4] for d in decoded], dtype="int32"),
                "n_payload_bytes": pd.array(
                    [d[5] for d in decoded], dtype="int64"
                ),
                "valid": [d[6] for d in decoded],
            })

    return media.select("media_id", "content").mapInPandas(run, schema=META_DDL)


def sample_frames(media: DataFrame, every_n: int = 1) -> DataFrame:
    """Video frame sampling: explode each video blob into one row per
    kept frame (frame_idx % every_n == 0). One narrow map stage; output
    is partitioned as the input (no shuffle)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                kind, _, _, nf, _, _, valid = _decode_header(content)
                if not valid or kind not in ("video", "image"):
                    continue
                payload = bytes(content)[HEADER_LEN:]
                for f in range(0, nf, every_n):
                    fr = payload[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    if len(fr) < FRAME_BYTES:  # incomplete trailing frame
                        break
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(fr)
            yield pd.DataFrame({
                "media_id": ids,
                "frame_idx": pd.array(idxs, dtype="int32"),
                "frame": frames,
            })

    return media.select("media_id", "content").mapInPandas(run, schema=FRAMES_DDL)


def media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction over the binary column: deterministic
    hash-derived unit vector per blob (stands in for a CNN/CLIP encoder;
    identical Spark shape — binary in, array<float> out, Arrow batches)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                digest = hashlib.sha256(bytes(content or b"")).digest()
                need = dim * 4
                buf = bytearray()
                c = 0
                while len(buf) < need:
                    buf += hashlib.sha256(digest + c.to_bytes(2, "big")).digest()
                    c += 1
                v = np.frombuffer(bytes(buf[:need]), dtype=">u4").astype("float64")
                v = v / 2**32 - 0.5
                n = float(np.linalg.norm(v)) or 1.0
                feats.append((v / n).astype("float32"))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(), "feature": feats
            })

    return media.select("media_id", "content").mapInPandas(run, schema=FEATURES_DDL)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: rewrites the header dims and re-derives the
    payload at the new size (fake path). The real-codec path would call
    _decode_payload + PIL resize; schema and batching are identical."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for mid, kind, content, url, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["content"], pdf["url"],
                pdf["meta"],
            ):
                k, _, _, nf, sr, _, valid = _decode_header(content)
                if valid and k == "image":
                    content = encode_media(mid, k, width, height, nf, sr)
                out_rows.append({
                    "media_id": mid, "url": url, "kind": kind,
                    "content": bytes(content), "meta": meta,
                })
            yield pd.DataFrame(out_rows)

    return media.mapInPandas(run, schema=MEDIA_DDL)


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind size/shape aggregate over decoded metadata — JVM-side
    after the decode map stage."""
    return (
        decode_meta(media)
        .filter(F.col("valid"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_payload_bytes").alias("total_payload_bytes"),
            F.max("width").alias("max_width"),
            F.max("n_frames").alias("max_frames"),
        )
    )
