"""Cuckoo-filter seen-set variant: no false negatives, exact-join parity
with the bloom path, and deletion (the cuckoo's edge over bloom)."""

from __future__ import annotations

import random

from bravewebcrawler_spark.operators.seen import cuckoo_delete, cuckoo_insert, cuckoo_split

N_BUCKETS = 4
TABLE_BUCKETS = 256  # power of 2; 256*4 slots per partition


def _hashes_df(spark, values):
    return spark.createDataFrame([(int(v),) for v in values], "url_hash long")


def _empty(spark):
    return spark.createDataFrame([], "bucket int, filter binary")


def test_cuckoo_no_false_negatives_and_low_fp(spark):
    rng = random.Random(11)
    inserted = [rng.randrange(0, 1 << 60) for _ in range(500)]
    other = [rng.randrange(0, 1 << 60) for _ in range(500)]
    ck = cuckoo_insert(_empty(spark), _hashes_df(spark, inserted), N_BUCKETS, TABLE_BUCKETS)
    tagged = cuckoo_split(_hashes_df(spark, inserted + other), ck, N_BUCKETS, TABLE_BUCKETS)
    res = {r["url_hash"]: r["maybe_seen"] for r in tagged.collect()}
    assert all(res[v] for v in inserted), "false negative!"
    fps = sum(res[v] for v in other)
    assert fps < len(other) * 0.05  # 16-bit fingerprints => ~2^-13 per probe


def test_cuckoo_insert_idempotent(spark):
    vals = list(range(5000, 5200))
    c1 = cuckoo_insert(_empty(spark), _hashes_df(spark, vals), N_BUCKETS, TABLE_BUCKETS)
    c2 = cuckoo_insert(c1, _hashes_df(spark, vals), N_BUCKETS, TABLE_BUCKETS)
    tagged = cuckoo_split(_hashes_df(spark, vals), c2, N_BUCKETS, TABLE_BUCKETS)
    assert all(r["maybe_seen"] for r in tagged.collect())


def test_cuckoo_delete(spark):
    rng = random.Random(13)
    keep = [rng.randrange(0, 1 << 60) for _ in range(200)]
    drop = [rng.randrange(0, 1 << 60) for _ in range(200)]
    ck = cuckoo_insert(_empty(spark), _hashes_df(spark, keep + drop), N_BUCKETS, TABLE_BUCKETS)
    ck2 = cuckoo_delete(ck, _hashes_df(spark, drop), N_BUCKETS, TABLE_BUCKETS)
    res = {r["url_hash"]: r["maybe_seen"] for r in cuckoo_split(
        _hashes_df(spark, keep + drop), ck2, N_BUCKETS, TABLE_BUCKETS
    ).collect()}
    assert all(res[v] for v in keep), "delete must not remove other keys"
    # deleted keys are gone modulo fingerprint collisions with kept keys
    still = sum(res[v] for v in drop)
    assert still < len(drop) * 0.1
