"""Atomic per-round O(delta) state commits + exact resume (SURVEY.md §2.9 T3).

The reference flushes its buffered CSV sink every 5 items and can lose up to 4
rows on a kill (brave_processor.py:316-323). The engine upgrades this to
lose-nothing semantics with LSM-style commits whose size is bounded by the
ROUND, not by total state:

  * ``seen``           — append-only: each round dir holds only that round's
                         selected keys; the seen set is the union of dirs.
  * ``frontier``       — base + delta: a full snapshot every
                         ``policy.compact_every`` rounds (the "base"), and a
                         ``frontier_delta`` dir (only rediscovered/new rows)
                         in between. Current frontier =
                         min-depth-merge(base ∪ deltas) minus keys selected
                         since the base round.
  * ``bloom``          — dirty buckets only per round (with a ``round``
                         column); current filter = newest row per bucket
                         since the base round's full snapshot.
  * ``host_state``     — tiny (one row per host), full write each round.
  * ``documents`` / ``crawl_log`` — per-round outputs (append-only by
                         construction).

A manifest file is committed LAST via an atomic rename — a round either
fully exists or doesn't; the manifest records ``base_round`` so resume knows
which dirs reconstruct the state. tests/test_checkpoint_resume.py proves a
killed-and-resumed crawl equals an uninterrupted one bit-for-bit.

This is the Iceberg-semantics seam: no Iceberg runtime jar ships in this
sandbox's Spark, so snapshots are plain Parquet directories + a JSON manifest
(same observable properties: atomic append, per-round lineage/time travel,
O(delta) commits). Swapping in real Iceberg is a write-path change only.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OUTPUT_TABLES = ("documents", "crawl_log")


@dataclass(frozen=True)
class RoundMetrics:
    round_no: int
    dequeued: int
    fetched_ok: int
    frontier_size: int
    seen_size: int
    wall_s: float


def _manifest_path(state_dir: str, round_no: int) -> str:
    return os.path.join(state_dir, f"_MANIFEST-{round_no:06d}.json")


def round_dir(state_dir: str, round_no: int) -> str:
    # NOT "round=k": a k=v directory name would trigger Spark partition
    # discovery and shadow the real `round` column on multi-round reads.
    return os.path.join(state_dir, f"round-{round_no:06d}")


def write_tables(state_dir: str, round_no: int, tables: dict[str, DataFrame]) -> str:
    """Write a round's tables (not yet visible to resume until the manifest).

    Concurrent by default: every table written here reads WARM caches (the
    caller materializes selected/fetched/additions/fdelta via the two count
    jobs first), so parallel write jobs are pure scan+encode and overlap
    their fixed per-job latency. Concurrency over COLD caches is the thing
    that measured badly (Spark does not dedupe in-flight computation of a
    persisted partition: 70s vs 23s for a 100k-URL round at local[32]) —
    which is why the warm-up counts in plans/crawl.py run before this.
    BWC_WRITE_PAR=1 restores serial writes for diagnostics."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    rd = round_dir(state_dir, round_no)
    debug = os.environ.get("BWC_DEBUG_TIMING", "") == "1"
    if debug:
        print(f"    write_tables enter {_time.time():.2f}", flush=True)

    def write_one(name: str) -> None:
        t0 = _time.time()
        # delta tables are small relative to partition count at round scale;
        # fewer output files = fewer write tasks now + fewer open()s on the
        # next round's read. (At 10^10 scale partition sizing is governed by
        # maxPartitionBytes on read, so this stays safe.)
        tables[name].coalesce(16).write.mode("overwrite").parquet(os.path.join(rd, name))
        if debug:
            print(f"    write {name:14s} {_time.time() - t0:6.2f}s", flush=True)

    names = list(tables)
    workers = int(os.environ.get("BWC_WRITE_PAR", "6"))
    if workers <= 1:
        for name in names:
            write_one(name)
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(write_one, names))
    return rd


def start_writes(
    state_dir: str, round_no: int, tables: dict[str, DataFrame], pool
) -> list:
    """Kick off table writes on ``pool`` and return their futures — lets the
    caller overlap fetch-derived output writes with the discovery pipeline
    (the two only share WARM caches, so concurrency is pure overlap). The
    caller must ``result()`` every future before publishing the manifest."""
    rd = round_dir(state_dir, round_no)
    debug = os.environ.get("BWC_DEBUG_TIMING", "") == "1"

    def write_one(name: str) -> None:
        import time as _time

        t0 = _time.time()
        tables[name].coalesce(16).write.mode("overwrite").parquet(os.path.join(rd, name))
        if debug:
            print(f"    write {name:14s} {_time.time() - t0:6.2f}s (overlapped)", flush=True)

    return [pool.submit(write_one, name) for name in tables]


def publish_manifest(
    state_dir: str, round_no: int, metrics: RoundMetrics, base_round: int,
    band_hist: dict[int, int] | None = None,
) -> None:
    """Atomically publish a fully-written round (the commit point)."""
    rd = round_dir(state_dir, round_no)
    manifest = {
        "round": round_no,
        "base_round": base_round,  # newest round (<= this) with full frontier/bloom snapshots
        "round_dir": rd,
        "metrics": metrics.__dict__,
        "committed_at": time.time(),
    }
    if band_hist is not None:
        # dequeue band histogram (JSON keys are strings; load converts back)
        manifest["band_hist"] = {str(b): c for b, c in band_hist.items()}
    tmp = _manifest_path(state_dir, round_no) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, _manifest_path(state_dir, round_no))  # atomic publish


def latest_round(state_dir: str) -> int | None:
    """Newest fully-committed round, or None (fresh start)."""
    if not os.path.isdir(state_dir):
        return None
    rounds = [
        int(fn[len("_MANIFEST-") : -len(".json")])
        for fn in os.listdir(state_dir)
        if fn.startswith("_MANIFEST-") and fn.endswith(".json")
    ]
    return max(rounds) if rounds else None


def _manifest(state_dir: str, round_no: int) -> dict:
    with open(_manifest_path(state_dir, round_no)) as f:
        return json.load(f)


def load_seen(spark: SparkSession, state_dir: str, round_no: int) -> DataFrame:
    """Union of all per-round seen deltas (append-only log)."""
    paths = [os.path.join(round_dir(state_dir, r), "seen") for r in range(round_no + 1)]
    return spark.read.parquet(*paths)


def load_bloom(
    spark: SparkSession, state_dir: str, base_round: int, round_no: int
) -> DataFrame:
    """Newest filter bytes per bucket: the base round's full snapshot
    overlaid with the dirty-bucket deltas committed since."""
    paths = [os.path.join(round_dir(state_dir, base_round), "bloom")] + [
        os.path.join(round_dir(state_dir, r), "bloom_delta")
        for r in range(base_round + 1, round_no + 1)
    ]
    rows = spark.read.parquet(*paths)
    return rows.groupBy("bucket").agg(F.max_by("filter", "round").alias("filter"))


def load_frontier(
    spark: SparkSession, state_dir: str, base_round: int, round_no: int
) -> DataFrame:
    """Reconstruct the current frontier from base + deltas.

    merge_frontier picks the max-(priority,-depth) version of each key, so a
    key updated in several deltas resolves to its newest (shallowest)
    version; keys selected since the base round are removed by the anti-join
    against the seen deltas of those rounds (selected == seen delta)."""
    from bravewebcrawler_spark.plans.round import merge_frontier

    paths = [os.path.join(round_dir(state_dir, base_round), "frontier")] + [
        os.path.join(round_dir(state_dir, r), "frontier_delta")
        for r in range(base_round + 1, round_no + 1)
    ]
    frontier = merge_frontier(spark.read.parquet(*paths))
    if round_no > base_round:
        removed_paths = [
            os.path.join(round_dir(state_dir, r), "seen")
            for r in range(base_round + 1, round_no + 1)
        ]
        removed = spark.read.parquet(*removed_paths).select("url_hash")
        frontier = frontier.join(removed, "url_hash", "left_anti")
    return frontier


def load_state(spark: SparkSession, state_dir: str, round_no: int) -> dict[str, DataFrame]:
    """Resume state (frontier/seen/host_state/bloom) as of ``round_no`` —
    round outputs are cumulative and read via plans.crawl.read_outputs."""
    base = _manifest(state_dir, round_no)["base_round"]
    return {
        "frontier": load_frontier(spark, state_dir, base, round_no),
        "seen": load_seen(spark, state_dir, round_no),
        "host_state": spark.read.parquet(os.path.join(round_dir(state_dir, round_no), "host_state")),
        "bloom": load_bloom(spark, state_dir, base, round_no),
    }


def load_metrics(state_dir: str, round_no: int) -> dict:
    return _manifest(state_dir, round_no)["metrics"]


def load_band_hist(state_dir: str, round_no: int) -> dict[int, int] | None:
    """Dequeue band histogram committed with the round (None if the crawl
    that wrote it ran without band pruning)."""
    h = _manifest(state_dir, round_no).get("band_hist")
    return None if h is None else {int(b): c for b, c in h.items()}


def load_base_round(state_dir: str, round_no: int) -> int:
    return _manifest(state_dir, round_no)["base_round"]
