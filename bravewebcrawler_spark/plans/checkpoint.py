"""Atomic per-round state commits + exact resume (SURVEY.md §2.9 T3, risk R1).

The reference flushes its buffered CSV sink every 5 items and can lose up to 4
rows on a kill (brave_processor.py:316-323). The engine upgrades this to
lose-nothing semantics: after every round, the full state (frontier, seen,
host_state) and the round outputs (documents, crawl_log) are written to a
round directory, and a manifest file is committed LAST via an atomic rename —
a round either fully exists or doesn't. Resume loads the newest manifest and
replays from round k+1; tests/test_checkpoint_resume.py proves a killed-and-
resumed crawl equals an uninterrupted one bit-for-bit.

This is the Iceberg-semantics seam: no Iceberg runtime jar ships in this
sandbox's Spark, so snapshots are plain Parquet directories + a JSON manifest
(same observable properties: atomic append, per-round lineage/time travel).
Swapping in real Iceberg is a write-path change only.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

STATE_TABLES = ("frontier", "seen", "host_state", "bloom")
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
    """Write state+outputs for a round (not yet visible to resume).

    The six tables are independent branches over the round's cached
    dequeue/fetch results, so their write jobs are submitted concurrently —
    Spark's scheduler interleaves them, hiding the per-job fixed cost (this
    is what a real cluster does with concurrent output stages)."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    rd = round_dir(state_dir, round_no)
    debug = os.environ.get("BWC_DEBUG_TIMING", "") == "1"

    def write_one(name: str) -> None:
        t0 = _time.time()
        # state tables are small relative to partition count at round scale;
        # fewer output files = fewer write tasks now + fewer open()s on the
        # next round's read. (At 10^10 scale partition sizing is governed by
        # maxPartitionBytes on read, so this stays safe.)
        tables[name].coalesce(16).write.mode("overwrite").parquet(os.path.join(rd, name))
        if debug:
            print(f"    write {name:10s} {_time.time() - t0:6.2f}s", flush=True)

    # Serial by default: with the round intermediates cache-warmed, each
    # write is scan+encode only, and measured local-mode runs showed
    # concurrent write jobs LOSING to serial (scheduler/GC contention:
    # 70s -> 23s for a 100k-URL round at local[32]). On a real cluster with
    # idle executors, BWC_WRITE_PAR>1 re-enables concurrent output stages.
    workers = int(os.environ.get("BWC_WRITE_PAR", "1"))
    if workers <= 1:
        for name in STATE_TABLES + OUTPUT_TABLES:
            write_one(name)
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(write_one, STATE_TABLES + OUTPUT_TABLES))
    return rd


def publish_manifest(state_dir: str, round_no: int, metrics: RoundMetrics) -> None:
    """Atomically publish a fully-written round (the commit point)."""
    rd = round_dir(state_dir, round_no)
    manifest = {
        "round": round_no,
        "tables": {n: os.path.join(rd, n) for n in STATE_TABLES + OUTPUT_TABLES},
        "metrics": metrics.__dict__,
        "committed_at": time.time(),
    }
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


def load_state(spark: SparkSession, state_dir: str, round_no: int) -> dict[str, DataFrame]:
    """Resume state only (frontier/seen/host_state) — round outputs are
    cumulative across rounds and are read via plans.crawl.read_outputs."""
    with open(_manifest_path(state_dir, round_no)) as f:
        manifest = json.load(f)
    return {n: spark.read.parquet(manifest["tables"][n]) for n in STATE_TABLES}


def load_metrics(state_dir: str, round_no: int) -> dict:
    with open(_manifest_path(state_dir, round_no)) as f:
        return json.load(f)["metrics"]
