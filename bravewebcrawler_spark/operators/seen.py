"""Partitioned bloom-filter URL-seen state (SURVEY.md §2.4 A6, §2.10 U4).

At a 10^10-entry frontier the exact seen table is ~80 GB of hashes; joining
every discovered candidate against it each round is the dominant shuffle. The
bloom layer cuts that: the filter is partitioned into ``n_buckets`` buckets
co-partitioned with candidates on ``pmod(url_hash, n_buckets)``; membership
testing is a per-bucket vectorized numpy pass inside ``applyInPandas``.

CONTRACT (north rule / risk R3): the bloom NEVER decides membership. It
splits candidates into
  * definitely-new  (bloom miss → no false negatives, skip the exact join),
  * maybe-seen      (bloom hit → confirmed by the exact ``left_anti`` join).
Seen-set equality with the oracle therefore holds bit-for-bit regardless of
the false-positive rate; FPR only moves work between the two branches.

Sizing (documented for the 10^10 case, BENCH/BASELINE.md): k=7 hashes at
~9.6 bits/key → 1% FPR; 10^10 keys ⇒ ~12 GB of filter split over 1024
buckets ≈ 12 MB/bucket — one Arrow batch per task, far under executor memory.
Local tests use small m_bits to force false positives and prove the exact
join still protects membership.

The per-bucket update is the partial/final UDAF pattern: new hashes are
grouped with the bucket's current filter bytes, each task ORs its bits
locally, and the updated bytes are the new state row (idempotent — re-adding
a hash is a no-op, which is what makes resume replays safe).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_SCHEMA = "bucket int, filter binary"
K_HASHES = 7


def _bit_positions(hashes: np.ndarray, m_bits: int, k: int = K_HASHES) -> np.ndarray:
    """(n, k) bit positions via double hashing of the 60-bit portable hash."""
    h1 = hashes % np.int64(m_bits)
    h2 = (hashes >> np.int64(17)) % np.int64(m_bits - 1) + 1  # never 0 mod m
    i = np.arange(k, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.int64(m_bits)


def _set_bits(filt: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(filt, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def _test_bits(filt: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """True where ALL k bits are set (bloom 'maybe seen')."""
    bits = (filt[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def empty_bloom(spark: SparkSession, n_buckets: int) -> DataFrame:
    return spark.createDataFrame([], BLOOM_SCHEMA)


def bloom_insert(bloom: DataFrame, hashes: DataFrame, n_buckets: int, m_bits: int) -> DataFrame:
    """Fold new url_hash rows into the bucketed filters (applyInPandas).

    ``hashes``: a DataFrame with a ``url_hash`` column. Missing buckets are
    created; untouched buckets pass through unchanged (no full-state rewrite
    beyond the union — at scale the state table is partitioned by bucket and
    only dirty buckets are rewritten).
    """
    # h = -1 marks existing-filter rows: a NULLABLE long column would reach
    # pandas as float64 and corrupt 60-bit hashes above 2^53.
    tagged_new = hashes.select(
        F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.col("url_hash").alias("h"),
        F.lit(None).cast("binary").alias("filter"),
    )
    existing = bloom.select("bucket", F.lit(-1).cast("long").alias("h"), "filter")

    def update(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        filt = np.zeros(m_bits // 8, dtype=np.uint8)
        for b in pdf["filter"].dropna():
            filt |= np.frombuffer(bytes(b), dtype=np.uint8)
        hs = pdf.loc[pdf["h"] >= 0, "h"].to_numpy(dtype=np.int64)
        if len(hs):
            _set_bits(filt, _bit_positions(hs, m_bits))
        return pd.DataFrame({"bucket": [bucket], "filter": [filt.tobytes()]})

    return existing.unionByName(tagged_new).groupBy("bucket").applyInPandas(update, BLOOM_SCHEMA)


def bloom_split(
    candidates: DataFrame, bloom: DataFrame, n_buckets: int, m_bits: int, hash_col: str = "url_hash"
) -> DataFrame:
    """Tag candidates with ``maybe_seen``: False is authoritative (no false
    negatives); True must be confirmed by the exact anti-join.

    Implemented as a broadcast-free co-partitioned join on bucket + a
    vectorized test per Arrow batch (cogroup/applyInPandas)."""
    cand = candidates.withColumn("__bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int"))
    blm = bloom.withColumnRenamed("bucket", "__bucket")

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", maybe_seen boolean"

    def test(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=[*left.columns, "maybe_seen"]).drop(columns=["__bucket"], errors="ignore").iloc[0:0]
        hs = left[hash_col].to_numpy(dtype=np.int64)
        if right.empty or right["filter"].dropna().empty:
            maybe = np.zeros(len(hs), dtype=bool)
        else:
            filt = np.frombuffer(bytes(right["filter"].dropna().iloc[0]), dtype=np.uint8)
            maybe = _test_bits(filt, _bit_positions(hs, m_bits))
        res = left.drop(columns=["__bucket"])
        res["maybe_seen"] = maybe
        return res

    return (
        cand.groupBy("__bucket")
        .cogroup(blm.groupBy("__bucket"))
        .applyInPandas(test, out_schema)
    )


def dedup_with_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: DataFrame,
    n_buckets: int,
    m_bits: int,
    hash_col: str = "url_hash",
) -> DataFrame:
    """J2 with the bloom pre-filter: definitely-new rows bypass the exact
    anti-join; bloom hits are confirmed against the authoritative table."""
    tagged = bloom_split(candidates, bloom, n_buckets, m_bits, hash_col)
    fresh = tagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = tagged.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = suspect.join(seen.select(hash_col), hash_col, "left_anti")
    return fresh.unionByName(confirmed_new)
