"""Multimodal plumbing: binary columns + typed metadata through
Arrow-batched mapInPandas stages, deterministic across partitionings
and parquet round-trips."""

import pytest
from pyspark.sql import functions as F

from kgspark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_df(spark, 60, partitions=4).cache()


def test_decode_meta_roundtrip(media):
    got = {r["media_id"]: r for r in mm.decode_meta(media).collect()}
    assert len(got) == 60
    for i in range(60):
        r = got[f"m{i:08d}"]
        assert r["valid"]
        assert r["kind"] == mm.KINDS[i % 3]
        if r["kind"] != "audio":
            assert r["width"] == 16 + (i % 7) * 16
            assert r["height"] == 16 + (i % 5) * 16
        if r["kind"] == "video":
            assert r["n_frames"] == 2 + i % 6
            assert r["n_payload_bytes"] == r["n_frames"] * mm.FRAME_BYTES
        if r["kind"] == "audio":
            assert r["sample_rate"] in (8000, 12000, 16000, 20000)


def test_decode_meta_poison_pill(spark):
    bad = spark.createDataFrame(
        [("x1", None), ("x2", b"not-a-container"), ("x3", b"KG")],
        "media_id string, content binary",
    )
    rows = {r["media_id"]: r for r in mm.decode_meta(bad).collect()}
    assert not any(r["valid"] for r in rows.values())
    assert rows["x2"]["n_payload_bytes"] == len(b"not-a-container")


def test_sample_frames(media):
    frames = mm.sample_frames(media, every_n=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
        assert len(r["frame"]) == mm.FRAME_BYTES
    for i in range(60):
        mid = f"m{i:08d}"
        kind = mm.KINDS[i % 3]
        if kind == "image":
            assert [r["frame_idx"] for r in by_id[mid]] == [0]
        elif kind == "video":
            nf = 2 + i % 6
            assert sorted(r["frame_idx"] for r in by_id[mid]) == list(
                range(0, nf, 2)
            )
        else:
            assert mid not in by_id


def test_features_deterministic_across_partitioning(spark, media):
    a = {r["media_id"]: list(r["feature"]) for r in mm.media_features(media).collect()}
    b = {
        r["media_id"]: list(r["feature"])
        for r in mm.media_features(media.repartition(7)).collect()
    }
    assert a == b
    assert all(len(v) == 16 for v in a.values())
    # unit-norm
    import math

    for v in list(a.values())[:5]:
        assert math.isqrt(int(sum(x * x for x in v))) <= 1
        assert abs(sum(x * x for x in v) - 1.0) < 1e-3


def test_resize_images_rewrites_dims_only_for_images(media):
    resized = mm.resize_images(media, 32, 32)
    meta = {r["media_id"]: r for r in mm.decode_meta(resized).collect()}
    for i in range(60):
        r = meta[f"m{i:08d}"]
        if mm.KINDS[i % 3] == "image":
            assert (r["width"], r["height"]) == (32, 32)
        elif mm.KINDS[i % 3] == "video":
            assert r["width"] == 16 + (i % 7) * 16  # untouched


def test_parquet_roundtrip(tmp_path, spark, media):
    path = str(tmp_path / "media.parquet")
    media.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.schema.simpleString() == media.schema.simpleString()
    a = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["content"]) for r in back.collect()}
    assert a == b


def test_media_stats(media):
    stats = {r["kind"]: r for r in mm.media_stats(media).collect()}
    assert stats["image"]["n_media"] == 20
    assert stats["audio"]["n_media"] == 20
    assert stats["video"]["n_media"] == 20
    assert stats["image"]["max_frames"] == 1


def test_real_codec_stub_is_marked(media):
    with pytest.raises(NotImplementedError, match="PIL"):
        mm._decode_payload(b"KGSM" + b"\x00" * 20)
