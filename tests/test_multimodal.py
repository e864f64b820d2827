"""Multimodal binary-column plumbing: probe, metadata, decode, resize,
frame sampling (reference parser/decoder/encoder tier analogs)."""

import pyspark.sql.functions as F
import pytest

from nvimagecodec_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"document number {i} with some text body " * (i % 3 + 1)) for i in range(20)],
        "doc_id long, text string",
    )


def test_attach_and_metadata_roundtrip(spark, docs):
    meta = M.media_metadata(M.attach_fake_images(docs).select("doc_id", "image"))
    rows = {r["doc_id"]: r for r in meta.collect()}
    assert len(rows) == 20
    for r in rows.values():
        assert r["codec"] == "fimg"
        assert 16 <= r["width"] <= 63 and 16 <= r["height"] <= 63
        assert r["channels"] == 3
        assert r["n_bytes"] == 29  # 4 magic + 8 dims + 1 channels + 16 payload


def test_decode_matches_metadata(spark, docs):
    imgs = M.attach_fake_images(docs)
    meta = {r["doc_id"]: r for r in M.media_metadata(imgs.select("doc_id", "image")).collect()}
    dec = {r["doc_id"]: r for r in M.decode_images(imgs).collect()}
    assert set(dec) == set(meta)
    for did, d in dec.items():
        assert (d["width"], d["height"]) == (meta[did]["width"], meta[did]["height"])
        assert 0 <= d["payload_sum"] <= 16 * 255
        assert d["payload_h32"] >= 0


def test_resize_rewrites_header_keeps_payload(spark, docs):
    imgs = M.attach_fake_images(docs)
    before = {r["doc_id"]: r["payload_h32"] for r in M.decode_images(imgs).collect()}
    resized = M.resize_images(imgs, new_width=32, new_height=24)
    after = M.decode_images(resized).collect()
    for r in after:
        assert (r["width"], r["height"]) == (32, 24)
        assert r["payload_h32"] == before[r["doc_id"]]  # payload untouched


def test_frame_sampling(spark, docs):
    vids = M.attach_fake_videos(docs)
    n_frames = {
        r["doc_id"]: r["n_frames"]
        for r in M.media_metadata(vids.select("doc_id", "video"), binary_col="video").collect()
    }
    frames = M.sample_frames(vids, every_n=2).collect()
    per_doc: dict = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for did, nf in n_frames.items():
        expected = list(range(0, nf, 2))
        assert sorted(per_doc[did]) == expected


def test_unknown_magic_dead_letters(spark):
    df = spark.createDataFrame([(1, bytearray(b"XXXX" + b"\x00" * 25))], "doc_id long, image binary")
    row = M.media_metadata(df).collect()[0]
    assert row["codec"] is None and row["width"] is None


def test_real_decode_rejects_unknown_formats():
    """_real_decode is now a REAL BMP/PNM decoder (tests/test_real_decode.py);
    formats with no codec in this sandbox (JPEG etc.) still raise."""
    with pytest.raises(ValueError):
        M._real_decode(b"\xff\xd8\xff\xe0 jpeg soi")


def test_audio_metadata_and_probe(spark, docs):
    aud = M.attach_fake_audio(docs)
    rows = M.audio_metadata(aud.select("doc_id", "audio")).collect()
    assert rows
    for r in rows:
        assert r["codec"] == "faud"
        assert r["sample_rate"] in (8000, 16000, 22050, 44100)
        assert 1000 <= r["duration_ms"] <= 9999
        assert r["channels"] in (1, 2)
        assert r["n_samples"] == r["sample_rate"] * r["duration_ms"] // 1000
        assert r["n_bytes"] == 29
    # the probe chain distinguishes all three formats on one column
    imgs = M.attach_fake_images(docs)
    mixed = (
        aud.select("doc_id", F.col("audio").alias("payload")).limit(3)
        .unionAll(imgs.select("doc_id", F.col("image").alias("payload")).limit(3))
    )
    codecs = {
        r["codec"]
        for r in mixed.select(M.detect_codec("payload").alias("codec")).collect()
    }
    assert codecs == {"faud", "fimg"}


def test_audio_windowed_stats(spark, docs):
    aud = M.attach_fake_audio(docs)
    meta = {
        r["doc_id"]: r["duration_ms"]
        for r in M.audio_metadata(aud.select("doc_id", "audio")).collect()
    }
    win = M.audio_windowed_stats(aud, window_ms=1000).collect()
    per_doc: dict = {}
    for r in win:
        assert 0 <= r["energy"] <= 0xFFFF and 0 <= r["peak"] <= 0xFF
        per_doc.setdefault(r["doc_id"], []).append(r["window_idx"])
    for did, dur in meta.items():
        expect = -(-dur // 1000)
        assert sorted(per_doc[did]) == list(range(expect))
