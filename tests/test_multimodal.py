"""Multimodal plumbing: binary payload columns through the mapInPandas
decode/feature pass (codec stubbed; schema/batch shape are the real test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bravewebcrawler_spark.operators.multimodal import (
    decode_available,
    extract_media_features,
    media_table_from_documents,
)


def test_decode_is_stubbed_here():
    assert not decode_available()  # no codec in this sandbox — fake path


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
