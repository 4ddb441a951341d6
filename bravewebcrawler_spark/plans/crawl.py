"""Driver loop: crawl a SynthWeb from a seed list, round by round (T1/T3).

Equivalent of the reference's batch entry points
(brave_parallel_processing.py:327-396 and brave_processor.py:211-323) lifted
to DataFrame micro-batches. Each round is one job (plans/round.py); state is
committed atomically per round (plans/checkpoint.py) and a killed crawl
resumes exactly from the last committed round.

Seed ingestion mirrors the reference's input-CSV validation (P7,
brave_processor.py:249-261): malformed rows become dead-letter rows with a
status and are never silently dropped (K3).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bravewebcrawler_spark.plans import checkpoint as ckpt
from bravewebcrawler_spark.plans.policy import CrawlPolicy
from bravewebcrawler_spark.plans.round import (
    FRONTIER_SCHEMA,
    HOST_STATE_SCHEMA,
    SEEN_SCHEMA,
    admit_candidates,
    robots_df,
    run_round,
)
from bravewebcrawler_spark.sources.synthweb import SynthWeb

INVALID_ROW = "INVALID_INPUT_ROW_STRUCTURE"  # analog of brave_processor.py:253
EMPTY_URL = "EMPTY_URL_IN_INPUT"  # analog of EMPTY_COMPANY_NAME_IN_INPUT (:259)


def validate_seeds(seeds: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split seed rows into (valid, dead_letter) — dead letters keep a status."""
    tagged = seeds.withColumn(
        "status",
        F.when(F.col("url").isNull(), F.lit(INVALID_ROW))
        .when(F.trim(F.col("url")) == "", F.lit(EMPTY_URL))
        .otherwise(F.lit(None)),
    )
    valid = tagged.where(F.col("status").isNull()).drop("status")
    dead = tagged.where(F.col("status").isNotNull())
    return valid, dead


def initial_state(
    spark: SparkSession, web: SynthWeb, seeds: DataFrame, policy: CrawlPolicy
) -> dict[str, DataFrame]:
    robots = robots_df(spark, web)
    valid, dead = validate_seeds(seeds)
    frontier = admit_candidates(
        valid.select("url", F.lit(0).alias("d0")), "d0", 0, robots, policy
    )
    # distinct canonical seeds (messy duplicates collapse); min-depth merge is
    # a no-op at depth 0 but reuses the shared rule
    from bravewebcrawler_spark.plans.round import merge_frontier

    return {
        "frontier": merge_frontier(frontier),
        "seen": spark.createDataFrame([], SEEN_SCHEMA),
        "host_state": spark.createDataFrame([], HOST_STATE_SCHEMA),
        "dead_letter": dead,
        "robots": robots,
    }


def crawl(
    spark: SparkSession,
    web: SynthWeb,
    seeds: DataFrame,
    policy: CrawlPolicy,
    state_dir: str,
    resume: bool = False,
    stop_after_round: int | None = None,
) -> dict:
    """Run (or resume) a crawl; returns summary metrics.

    ``stop_after_round`` simulates a kill for resume tests.
    """
    if not resume and os.path.isdir(state_dir):
        shutil.rmtree(state_dir)
    os.makedirs(state_dir, exist_ok=True)

    from bravewebcrawler_spark.operators.seen import empty_bloom

    robots = robots_df(spark, web)
    start_round = 0
    last = ckpt.latest_round(state_dir) if resume else None
    if last is not None:
        state = ckpt.load_state(spark, state_dir, last)
        frontier, seen, host_state = state["frontier"], state["seen"], state["host_state"]
        bloom = state["bloom"]
        start_round = last + 1
    else:
        st = initial_state(spark, web, seeds, policy)
        frontier, seen, host_state = st["frontier"], st["seen"], st["host_state"]
        bloom = empty_bloom(spark, policy.bloom_buckets)
        # K3: dead-letter rows are kept with their status, never dropped
        st["dead_letter"].write.mode("overwrite").parquet(os.path.join(state_dir, "dead_letter"))

    total_fetched = 0
    for rnd in range(start_round, policy.max_rounds):
        t0 = time.time()
        out = run_round(spark, web, frontier, seen, host_state, robots, policy, rnd, bloom)
        # Materialize round outputs; state for round rnd is committed atomically.
        tables = {
            "frontier": out["frontier"],
            "seen": out["seen"],
            "host_state": out["host_state"],
            "bloom": out["bloom"],
            "documents": out["documents"],
            "crawl_log": out["crawl_log"],
        }
        # Materialize the round's cached intermediates ONCE, in dependency
        # order, BEFORE the concurrent writes: Spark does not dedupe
        # in-flight computations of a persisted partition, so three parallel
        # write jobs hitting a cold cache would each recompute the dequeue +
        # fetch chain (measured: 3x CPU + GC storm at local[32]).
        debug = os.environ.get("BWC_DEBUG_TIMING", "") == "1"
        t_warm = time.time()
        for df in out["_cached"]:
            df.count()
        if debug:
            print(f"  round {rnd} cache warm in {time.time() - t_warm:6.2f}s", flush=True)
        rd = ckpt.write_tables(state_dir, rnd, tables)
        if debug:
            print(f"  round {rnd} writes done at {time.time() - t0:6.2f}s", flush=True)
        # metrics from the warm cache (no parquet re-reads); frontier/seen
        # sizes from parquet metadata (row-group stats, no data scan)
        fetched = out["fetched"]
        dequeued = out["selected_count"].count()
        fetched_ok = fetched.where(F.col("status") == "FETCHED_OK").count()
        metrics = ckpt.RoundMetrics(
            round_no=rnd,
            dequeued=dequeued,
            fetched_ok=fetched_ok,
            frontier_size=spark.read.parquet(os.path.join(rd, "frontier")).count(),
            seen_size=spark.read.parquet(os.path.join(rd, "seen")).count(),
            wall_s=time.time() - t0,
        )
        # tables already written: publish manifest atomically (commit point)
        ckpt.publish_manifest(state_dir, rnd, metrics)
        for df in out["_cached"]:
            df.unpersist()
        if debug:
            print(f"  round {rnd}: dequeued={dequeued} total={time.time() - t0:6.2f}s", flush=True)
        total_fetched += dequeued
        # reload committed state => bounded lineage across rounds
        frontier = spark.read.parquet(os.path.join(rd, "frontier"))
        seen = spark.read.parquet(os.path.join(rd, "seen"))
        host_state = spark.read.parquet(os.path.join(rd, "host_state"))
        bloom = spark.read.parquet(os.path.join(rd, "bloom"))
        if dequeued == 0:
            break
        if stop_after_round is not None and rnd >= stop_after_round:
            break

    return {
        "last_round": ckpt.latest_round(state_dir),
        "total_dequeued": total_fetched,
        "state_dir": state_dir,
    }


def read_outputs(spark: SparkSession, state_dir: str) -> dict[str, DataFrame]:
    """Union of per-round outputs + final state of the newest committed round."""
    last = ckpt.latest_round(state_dir)
    assert last is not None, "no committed rounds"
    doc_paths = [os.path.join(ckpt.round_dir(state_dir, r), "documents") for r in range(last + 1)]
    log_paths = [os.path.join(ckpt.round_dir(state_dir, r), "crawl_log") for r in range(last + 1)]
    docs = spark.read.parquet(*doc_paths)
    log = spark.read.parquet(*log_paths)
    st = ckpt.load_state(spark, state_dir, last)
    return {"documents": docs, "crawl_log": log, **st}
