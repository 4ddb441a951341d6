"""Bloom seen-set: no false negatives, exact-join authority, crawl parity."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bravewebcrawler_spark.operators.seen import (
    bloom_insert,
    bloom_split,
    dedup_with_bloom,
    empty_bloom,
)

N_BUCKETS = 8
M_BITS = 1 << 10  # deliberately tiny → forces false positives


def _hashes_df(spark, values):
    return spark.createDataFrame([(int(v),) for v in values], "url_hash long")


def test_bloom_no_false_negatives(spark):
    rng = random.Random(42)
    inserted = [rng.randrange(0, 1 << 60) for _ in range(400)]
    other = [rng.randrange(0, 1 << 60) for _ in range(400)]
    bloom = bloom_insert(empty_bloom(spark, N_BUCKETS), _hashes_df(spark, inserted), N_BUCKETS, M_BITS)
    tagged = bloom_split(_hashes_df(spark, inserted + other), bloom, N_BUCKETS, M_BITS)
    res = {r["url_hash"]: r["maybe_seen"] for r in tagged.collect()}
    # every inserted hash MUST be flagged (no false negatives)
    assert all(res[v] for v in inserted)
    # tiny filter → some false positives exist (so the exact join matters)
    fps = sum(res[v] for v in other)
    assert 0 < fps < len(other)


def test_dedup_with_bloom_equals_exact_antijoin(spark):
    rng = random.Random(7)
    seen_vals = [rng.randrange(0, 1 << 60) for _ in range(300)]
    cand_vals = seen_vals[:100] + [rng.randrange(0, 1 << 60) for _ in range(300)]
    seen = _hashes_df(spark, seen_vals)
    cands = _hashes_df(spark, cand_vals).withColumn("tag", F.col("url_hash") % 10)
    bloom = bloom_insert(empty_bloom(spark, N_BUCKETS), seen, N_BUCKETS, M_BITS)
    got = {r["url_hash"] for r in dedup_with_bloom(cands, seen, bloom, N_BUCKETS, M_BITS).collect()}
    expect = {r["url_hash"] for r in cands.join(seen, "url_hash", "left_anti").collect()}
    assert got == expect


def test_bloom_insert_idempotent(spark):
    vals = list(range(1000, 1100))
    b1 = bloom_insert(empty_bloom(spark, N_BUCKETS), _hashes_df(spark, vals), N_BUCKETS, M_BITS)
    b2 = bloom_insert(b1, _hashes_df(spark, vals), N_BUCKETS, M_BITS)
    f1 = {r["bucket"]: bytes(r["filter"]) for r in b1.collect()}
    f2 = {r["bucket"]: bytes(r["filter"]) for r in b2.collect()}
    assert f1 == f2
