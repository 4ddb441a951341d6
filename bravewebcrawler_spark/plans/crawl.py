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

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from bravewebcrawler_spark.plans import checkpoint as ckpt
from bravewebcrawler_spark.plans.policy import CrawlPolicy
from bravewebcrawler_spark.plans.round import (
    FRONTIER_SCHEMA,
    HOST_STATE_SCHEMA,
    SEEN_SCHEMA,
    admit_candidates,
    band_col,
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
    seen_size = 0
    frontier_size = 0
    base_round = 0
    init_frontier = None  # fresh-start-only persist, released after round 0
    band_hist: dict[int, int] | None = {} if policy.dequeue_band_pruning else None
    last = ckpt.latest_round(state_dir) if resume else None
    if last is not None:
        state = ckpt.load_state(spark, state_dir, last)
        frontier, seen, host_state = state["frontier"], state["seen"], state["host_state"]
        bloom = state["bloom"]
        m = ckpt.load_metrics(state_dir, last)
        seen_size = m["seen_size"]
        frontier_size = m["frontier_size"]
        base_round = ckpt.load_base_round(state_dir, last)
        start_round = last + 1
        if policy.dequeue_band_pruning:
            saved = ckpt.load_band_hist(state_dir, last)
            band_hist = saved if saved is not None else {
                int(r["b"]): r["count"]
                for r in frontier.groupBy(band_col(F.col("priority")).alias("b")).count().collect()
            }
    else:
        st = initial_state(spark, web, seeds, policy)
        frontier, seen, host_state = st["frontier"], st["seen"], st["host_state"]
        # Round 0 consumes the initial frontier several times (the dequeue
        # ranking scan in jobA, then the selected/touched/untouched split in
        # jobB) — without a persist each consumer re-runs the 1.6M-row seed
        # canonicalize+merge chain (phase-log finding, round 3). jobA's full
        # ranking scan warms the cache before jobB's joins read it, so the
        # in-flight-recompute trap (BENCH item 2) does not apply; released
        # after round 0 commits.
        from pyspark.storagelevel import StorageLevel

        frontier = frontier.persist(StorageLevel.MEMORY_AND_DISK)
        init_frontier = frontier
        bloom = empty_bloom(spark, policy.bloom_buckets)
        # K3: dead-letter rows are kept with their status, never dropped
        st["dead_letter"].write.mode("overwrite").parquet(os.path.join(state_dir, "dead_letter"))

    total_fetched = 0
    debug = os.environ.get("BWC_DEBUG_TIMING", "") == "1"
    from concurrent.futures import ThreadPoolExecutor

    write_pool = ThreadPoolExecutor(max_workers=4, thread_name_prefix="bwc-write")
    for rnd in range(start_round, policy.max_rounds):
        t0 = time.time()
        out = run_round(
            spark, web, frontier, seen, host_state, robots, policy, rnd, bloom,
            band_hist=band_hist,
        )
        if debug:
            print(f"  round {rnd} construct+dequeue-collect in {time.time() - t0:6.2f}s", flush=True)
        # Bookkeeping rides on the writes (zero extra jobs in the common
        # path): the crawl_log write IS the warm+count job — an Observation
        # on it yields (dequeued, fetched_ok) while materializing the
        # selected+fetched caches — and the frontier_delta write carries the
        # frontier-size counts the same way. Ordering is still serial on
        # purpose where caches are cold: Spark does not dedupe in-flight
        # computation of a persisted partition, so parallel jobs over a cold
        # cache would each recompute the dequeue+fetch chain (measured: 3x
        # CPU + GC storm at local[32]).
        t_warm = time.time()
        obs_a = Observation()
        log_obs = out["crawl_log"].observe(
            obs_a,
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("status") == "FETCHED_OK").alias("ok"),
        )
        ckpt.write_tables(state_dir, rnd, {"crawl_log": log_obs})
        counts = obs_a.get
        dequeued, fetched_ok = counts["n"], counts["ok"]
        if debug:
            print(f"  round {rnd} jobA fetch+crawl_log write in {time.time() - t_warm:6.2f}s", flush=True)
        # remaining fetched-derived outputs need only warm caches — write
        # them WHILE the discover→dedup→merge chain computes; pure overlap
        early_futs = ckpt.start_writes(
            state_dir, rnd,
            {
                "seen": out["seen_delta"],
                "host_state": out["host_state"],
                "documents": out["documents"],
            },
            write_pool,
        )
        # Commit O(delta): seen/bloom/frontier deltas every round; a full
        # frontier+bloom snapshot every compact_every rounds bounds both the
        # reconstruction read fan-in and the lazy cross-round plan depth.
        is_compaction = rnd % max(policy.compact_every, 1) == 0
        t_b = time.time()
        fd_rows = None
        fdelta_cnt = touched_cnt = 0
        obs_b = None
        if policy.dequeue_band_pruning and not is_compaction:
            # Band-histogram path: the per-(old,new)-band count MAP cannot
            # ride an Observation (fixed aggregate list only), so one tiny
            # groupBy over the tagged delta materializes the chain AND
            # yields the per-band deltas + the frontier-size counts.
            fd_rows = (
                out["fdelta_tagged"]
                .groupBy(
                    F.col("__touched").alias("old_band"),
                    band_col(F.col("priority")).alias("new_band"),
                )
                .count()
                .collect()
            )
            fdelta_cnt = sum(r["count"] for r in fd_rows)
            touched_cnt = sum(r["count"] for r in fd_rows if r["old_band"] > -1000)
            if debug:
                print(f"  round {rnd} jobB fdelta in {time.time() - t_b:6.2f}s", flush=True)
        if is_compaction:
            base_round = rnd
            # The snapshot write materializes the whole discovery chain
            # (additions, fdelta_tagged, bloom probe incl. bloom_delta) in
            # dependency order; the bloom write after it is a warm scan.
            # Written one at a time — concurrent writes over these COLD
            # caches would duplicate the chain in flight.
            rd = ckpt.write_tables(state_dir, rnd, {"frontier": out["frontier"]})
            ckpt.write_tables(
                state_dir, rnd, {"bloom": out["bloom"].withColumn("round", F.lit(rnd))}
            )
        else:
            fdelta = out["frontier_delta"]
            if fd_rows is None:
                obs_b = Observation()
                fdelta = (
                    out["fdelta_tagged"]
                    .observe(
                        obs_b,
                        F.count(F.lit(1)).alias("n"),
                        F.count_if(F.col("__touched") > -1000).alias("touched"),
                    )
                    .drop("__touched")
                )
            # frontier_delta first and alone (cold chain — see above), then
            # the bloom delta as a warm scan of its persisted buckets.
            rd = ckpt.write_tables(state_dir, rnd, {"frontier_delta": fdelta})
            ckpt.write_tables(
                state_dir, rnd, {"bloom_delta": out["bloom_delta"].withColumn("round", F.lit(rnd))}
            )
            if obs_b is not None:
                b = obs_b.get
                fdelta_cnt, touched_cnt = b["n"], b["touched"]
        if debug:
            print(f"  round {rnd} jobB/delta-writes in {time.time() - t_b:6.2f}s", flush=True)
        for f in early_futs:  # all tables durable before the manifest commit
            f.result()
        if debug:
            print(f"  round {rnd} writes done at {time.time() - t0:6.2f}s", flush=True)

        # Exact new-frontier size WITHOUT scanning the frontier: selected
        # rows leave (dequeued), touched rows move into the delta
        # (touched_cnt), the delta contributes fdelta_cnt. On compaction
        # rounds the freshly-written snapshot's footer count is authoritative
        # (and asserts the arithmetic's invariant cheaply at test scale).
        if policy.dequeue_band_pruning:
            if is_compaction:
                # exact re-base from the snapshot (also zeroes any drift)
                band_hist = {
                    int(r["b"]): r["count"]
                    for r in spark.read.parquet(os.path.join(rd, "frontier"))
                    .groupBy(band_col(F.col("priority")).alias("b"))
                    .count()
                    .collect()
                }
            else:
                # arithmetic update: selected rows leave their band, touched
                # rows leave their OLD band, every delta row enters its band
                for r in out["selected_count"].groupBy(
                    band_col(F.col("priority")).alias("b")
                ).count().collect():
                    band_hist[int(r["b"])] = band_hist.get(int(r["b"]), 0) - r["count"]
                for r in fd_rows:
                    if r["old_band"] > -1000:
                        band_hist[int(r["old_band"])] = band_hist.get(int(r["old_band"]), 0) - r["count"]
                    band_hist[int(r["new_band"])] = band_hist.get(int(r["new_band"]), 0) + r["count"]
                band_hist = {b: c for b, c in band_hist.items() if c > 0}
        frontier_size = (
            sum(band_hist.values())
            if policy.dequeue_band_pruning and is_compaction
            else spark.read.parquet(os.path.join(rd, "frontier")).count()
            if is_compaction
            else frontier_size - dequeued - touched_cnt + fdelta_cnt
        )
        seen_size += dequeued
        metrics = ckpt.RoundMetrics(
            round_no=rnd,
            dequeued=dequeued,
            fetched_ok=fetched_ok,
            frontier_size=frontier_size,
            seen_size=seen_size,
            wall_s=time.time() - t0,
        )
        # tables already written: publish manifest atomically (commit point)
        ckpt.publish_manifest(state_dir, rnd, metrics, base_round, band_hist=band_hist)
        for df in out["_cached"]:
            df.unpersist()
        if init_frontier is not None:
            init_frontier.unpersist()
            init_frontier = None
        if debug:
            print(f"  round {rnd}: dequeued={dequeued} total={time.time() - t0:6.2f}s", flush=True)
        total_fetched += dequeued
        # Next-round state from COMMITTED parquet (bounded lineage, O(delta)
        # reads): the frontier chains one broadcast-filtered delta per round
        # onto the last full snapshot — identical to load_frontier's
        # reconstruction, applied incrementally.
        seen = ckpt.load_seen(spark, state_dir, rnd)
        host_state = spark.read.parquet(os.path.join(rd, "host_state"))
        if is_compaction:
            frontier = spark.read.parquet(os.path.join(rd, "frontier"))
            bloom = spark.read.parquet(os.path.join(rd, "bloom")).select("bucket", "filter")
        else:
            fdelta = spark.read.parquet(os.path.join(rd, "frontier_delta"))
            removed = spark.read.parquet(os.path.join(rd, "seen")).select("url_hash")
            # no broadcast hints: AQE picks broadcast only when the delta is
            # genuinely small (see the matching note in plans/round.py)
            frontier = (
                frontier.join(removed, "url_hash", "left_anti")
                .join(fdelta.select("url_hash"), "url_hash", "left_anti")
                .unionByName(fdelta)
            )
            bloom = ckpt.load_bloom(spark, state_dir, base_round, rnd)
        if dequeued == 0:
            break
        if stop_after_round is not None and rnd >= stop_after_round:
            break

    write_pool.shutdown(wait=True)
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
