"""Multimodal plumbing: binary payload columns through the mapInPandas
decode/feature pass. Header decode (PNG/JPEG/GIF width/height) is REAL
pure-Python parsing, tested against crafted byte fixtures; pixel decode /
feature extraction still needs a codec (absent here) and stays the
deterministic digest stand-in."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bravewebcrawler_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    codec_available,
    decode_available,
    extract_media_features,
    media_table_from_documents,
    parse_image_header,
)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\xf7\x00\x00"


def _jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_header_decode_available_codec_absent():
    assert decode_available()  # header parsing is pure Python
    assert not codec_available()  # no pixel codec in this sandbox


def test_parse_image_header_fixtures():
    assert parse_image_header(_png(640, 480)) == (640, 480)
    assert parse_image_header(_gif(320, 200)) == (320, 200)
    assert parse_image_header(_jpeg(1024, 768)) == (1024, 768)
    # progressive JPEG (SOF2) and a restart-marker-led stream
    prog = _jpeg(99, 77).replace(b"\xff\xc0", b"\xff\xc2")
    assert parse_image_header(prog) == (99, 77)
    # negatives: text bytes, truncated PNG, empty, EOI-before-SOF jpeg
    assert parse_image_header(b"hello world, not an image") is None
    assert parse_image_header(_png(640, 480)[:15]) is None
    assert parse_image_header(None) is None
    assert parse_image_header(b"\xff\xd8\xff\xd9") is None


def test_real_headers_through_mapinpandas(spark):
    media = spark.createDataFrame(
        [
            ("m-png", _png(640, 480), "image/png", 33),
            ("m-gif", _gif(320, 200), "image/gif", 13),
            ("m-jpg", _jpeg(1024, 768), "image/jpeg", 43),
            ("m-txt", b"just some text bytes here", "text/plain", 25),
            ("m-null", None, "image/png", None),
        ],
        MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert (out["m-png"]["width"], out["m-png"]["height"]) == (640, 480)
    assert (out["m-gif"]["width"], out["m-gif"]["height"]) == (320, 200)
    assert (out["m-jpg"]["width"], out["m-jpg"]["height"]) == (1024, 768)
    # non-image bytes fall back to the deterministic digest stand-in
    assert 64 <= out["m-txt"]["width"] <= 255
    assert out["m-null"]["width"] is None and out["m-null"]["feature"] is None
    # feature vector is present for all non-null payloads (digest stand-in)
    assert len(out["m-png"]["feature"]) == 4


def test_media_feature_plumbing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = media_table_from_documents(docs)
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r["media_id"].startswith("media-")
    assert 64 <= r["width"] <= 255 and 64 <= r["height"] <= 255
    assert len(r["feature"]) == 4
    assert all(0.0 <= x <= 1.0 for x in r["feature"])
    # deterministic: same payload -> same feature
    again = {x["media_id"]: x["feature"] for x in extract_media_features(media).collect()}
    assert again[r["media_id"]] == r["feature"]
    # mime partitioning stats line up with payload sizes
    stats = media.groupBy("mime").agg(F.count("*").alias("n")).collect()
    assert sum(s["n"] for s in stats) == len(rows)
