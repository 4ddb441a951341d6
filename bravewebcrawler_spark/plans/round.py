"""One crawl round as a single declarative DataFrame micro-batch.

The reference's outer loop processes one company per iteration
(brave_processor.py:248, brave_parallel_processing.py:366-371 pool fan-out);
the engine lifts it to sets: every round is one DataFrame job —

    frontier ──rank──► dequeue (politeness-budgeted, salted host windows)
        │                   │ mapInPandas fetch+parse (Arrow batches)
        │                   ▼
        │              documents(spans) + crawl_log + seen'
        │                   │ explode outlinks → canonicalize → admit
        └──anti-join──► frontier'  (min-depth merge, dedup vs seen')

Scale notes (1000-executor / 10^10-frontier design, verified on the local
plan with .explain):
  * the per-host dequeue is a salted two-phase window (W1 in SURVEY.md §2.6):
    ``row_number() over (host, salt)`` bounds any single task's window to
    1/SALT_N of a hot host before the exact per-host re-rank — salting
    changes placement, never rank (risk R2);
  * the global round cap is ``orderBy(total_order).limit(K)`` which Spark
    executes as TakeOrderedAndProject (distributed top-K) — NOT a
    single-partition window; the seq-assigning window then runs over ≤K rows;
  * dedup is an exact ``left_anti`` join on url_hash (J2); the bloom
    pre-filter (operators/seen.py) cheapens it but never decides membership
    (risk R3);
  * robots rules are a broadcast join (J3, north rule);
  * all heavy expressions (canonicalization, priority, admission) are
    column expressions inside whole-stage codegen; Python appears only in the
    fetch+parse mapInPandas, where fetch is the stand-in for network I/O and
    parsing is pandas-vectorized (functions/extract.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bravewebcrawler_spark.functions import extract
from bravewebcrawler_spark.functions.canon import (
    canonicalize_url_col,
    host_of_col,
    is_blacklisted_col,
    url_hash_col,
)
from bravewebcrawler_spark.plans.policy import CrawlPolicy, path_of_col, priority_col
from bravewebcrawler_spark.sources.synthweb import SynthWeb

SALT_N = 8  # dequeue-window salt fan-out (defuses hot-host skew)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("round_added", T.IntegerType(), False),
        # per-partition provenance (north rule): which round and which source
        # partition appended this entry — debugging/audit only, never part of
        # the ordering or equality contracts
        T.StructField("lineage", T.StringType(), False),
        # T2: number of prior fetch attempts (a TIMEOUT returns the URL to the
        # frontier with attempts+1 and it is retried on a later round)
        T.StructField("attempts", T.IntegerType(), False),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("round_seen", T.IntegerType(), False),
    ]
)

HOST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("tokens", T.DoubleType(), False),
    ]
)

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("media_ref", T.StringType(), True),
            T.StructField("offset", T.IntegerType(), True),
        ]
    )
)

FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("spans", SPAN_TYPE, True),
        T.StructField("outlinks", T.ArrayType(T.StringType()), True),
    ]
)


def robots_df(spark: SparkSession, web: SynthWeb) -> DataFrame:
    """Robots dimension as a DataFrame plan — broadcast at join time (J3).

    Was a driver-side Python loop materializing one row per host: fine at 20k
    hosts, a real driver bottleneck at the north rule's millions ("robots.txt
    cache broadcast to executors"). Now ``spark.range(n_hosts)`` + column
    expressions reproduce ``SynthWeb.host`` / ``SynthWeb.robots_disallow``
    bit-for-bit (the md5-derived rule evaluates JVM-side), so the dim is
    generated distributed, never materialized on the driver, and the
    crawl-vs-oracle equality is unchanged (pytest parity-checks all hosts).
    In production this is one ``spark.read.parquet`` of a robots snapshot —
    the join shape (J3) is identical either way.
    """
    host = F.format_string(
        "host%03d.example.%s",
        F.col("id"),
        F.when(F.col("id") % 3 != 2, F.lit("ch")).otherwise(F.lit("com")),
    )
    # SynthWeb._rnd(seed, "robots", host): big-endian uint64 of md5[:8].
    # conv() emits the unsigned decimal string; decimal(20,0) holds 2^64-1,
    # so the %5 / %3 arithmetic matches Python's arbitrary-precision ints.
    r = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{web.seed}|robots|"), F.col("host"))), 1, 16),
        16, 10,
    ).cast("decimal(20,0)")
    return (
        spark.range(web.n_hosts)
        .withColumn("host", host)
        .withColumn("__r", r)
        .select(
            "host",
            F.when(
                F.col("__r") % 5 == 0,
                F.array(
                    F.concat(F.lit("/page/"), (F.lit(1) + (F.col("__r") % 3)).cast("int").cast("string"))
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("disallow_prefixes"),
        )
    )


def admit_candidates(raw_urls: DataFrame, depth_col: str, round_no: int, robots: DataFrame, policy: CrawlPolicy) -> DataFrame:
    """Discovery-time shaping + filtering (blacklist P1, robots, depth cap).

    ``raw_urls``: columns (url string, <depth_col> int). Returns FRONTIER_SCHEMA
    rows. Everything is column expressions; robots is a broadcast left join.
    """
    c = (
        raw_urls.where(F.col(depth_col) <= policy.max_depth)
        .withColumn("url_canon", canonicalize_url_col(F.col("url")))
        .withColumn("host", host_of_col(F.col("url")))
        .where((F.col("host") != "") & ~is_blacklisted_col(F.col("host")))
        .withColumn("path", path_of_col(F.col("url_canon")))
        .withColumn("url_hash", url_hash_col(F.col("url_canon")))
        .withColumn("priority", priority_col(F.col("host"), F.col("path"), F.col(depth_col)))
        .withColumn("depth", F.col(depth_col).cast("int"))
        .withColumn("round_added", F.lit(round_no))
        .withColumn(
            "lineage",
            F.concat(F.lit(f"r{round_no}:p"), F.spark_partition_id().cast("string")),
        )
        .withColumn("attempts", F.lit(0))
    )
    from bravewebcrawler_spark.operators.politeness import robots_allowed

    c = robots_allowed(c, robots)
    return c.select([f.name for f in FRONTIER_SCHEMA.fields])


def merge_frontier(parts: DataFrame, tag_col: str | None = None) -> DataFrame:
    """Min-depth merge of frontier entries sharing a canonical URL.

    Priority is a strictly depth-decreasing pure function of the URL, so
    keeping the max-(priority), min-(depth) struct keeps the first/shallowest
    discovery — the shared contract with the oracle.

    ``tag_col``: optional int column carried through as ``max(tag_col)`` per
    key — lets the caller piggyback bookkeeping (e.g. "did any merged row
    come from the existing frontier") on the same shuffle instead of paying a
    separate counting job over the frontier.
    """
    best = F.max(
        F.struct(
            F.col("priority"),
            (-F.col("depth")).alias("negd"),
            F.col("round_added"),
            F.col("lineage"),
        )
    ).alias("b")
    aggs = [best, F.max("attempts").alias("attempts")]
    if tag_col is not None:
        aggs.append(F.max(tag_col).alias(tag_col))
    return (
        parts.groupBy("url_canon", "url_hash", "host", "path")
        # attempts merges independently of the value struct: a retried entry
        # never loses its attempt count to a fresh rediscovery (T2)
        .agg(*aggs)
        .select(
            "url_canon",
            "url_hash",
            "host",
            "path",
            F.col("b.priority").alias("priority"),
            (-F.col("b.negd")).cast("int").alias("depth"),
            F.col("b.round_added").alias("round_added"),
            F.col("b.lineage").alias("lineage"),
            "attempts",
            *([tag_col] if tag_col is not None else []),
        )
    )


def _fetch_parse_factory(web: SynthWeb):
    """mapInPandas fn: fetch with the T2 failure taxonomy (the stand-in for
    executor-side HTTP I/O with a hard per-item budget, reference
    search_common.py:407-409 + brave_processor.py:42,276-304) + vectorized
    span/outlink parse. The per-URL loop IS the network call; parsing stays
    pandas-vectorized."""

    def fetch_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outcomes = [
                web.fetch_outcome(u, int(a))
                for u, a in zip(pdf["url_canon"], pdf["attempts"])
            ]
            html = pd.Series([o[1] for o in outcomes], index=pdf.index, dtype=object)
            spans = extract.parse_spans_pd(html)
            outlinks = extract.parse_outlinks_pd(html)
            yield pd.DataFrame(
                {
                    "url_canon": pdf["url_canon"],
                    "url_hash": pdf["url_hash"],
                    "seq": pdf["seq"],
                    "depth": pdf["depth"],
                    "attempts": pdf["attempts"],
                    "status": pd.Series([o[0] for o in outcomes], index=pdf.index),
                    "error": pd.Series([o[2] for o in outcomes], index=pdf.index, dtype=object),
                    "spans": spans,
                    "outlinks": outlinks,
                }
            )

    return fetch_parse


_PINNED_RANK_CACHES: list[DataFrame] = []
_SCOPED_RANK_CACHES: list[list[DataFrame]] = []  # rank_cache_scope() stack


def release_rank_caches() -> None:
    """Unpersist rank-cap caches pinned by registry-less dequeue callers.
    Only call once every DataFrame returned by those calls is fully consumed."""
    while _PINNED_RANK_CACHES:
        try:
            _PINNED_RANK_CACHES.pop().unpersist()
        except Exception:  # noqa: BLE001 — interpreter/JVM teardown
            pass


@contextmanager
def rank_cache_scope() -> Iterator[None]:
    """Scope-exit release for registry-less dequeue callers (tests, tools).

    Inside the ``with`` block, dequeue calls that would otherwise pin their
    placement-freezing caches in the module-global list register them in the
    scope instead; exit unpersists them all. This keeps the caches alive for
    exactly as long as the returned DataFrames can be consumed — the caller
    no longer has to remember ``release_rank_caches()`` (and a weakref
    finalizer remains unsafe: it would fire mid-query, see _global_rank_cap).
    The production loop is unaffected — crawl passes an explicit
    ``cache_registry`` released per round.
    """
    scope: list[DataFrame] = []
    _SCOPED_RANK_CACHES.append(scope)
    try:
        yield
    finally:
        _SCOPED_RANK_CACHES.remove(scope)
        for df in scope:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — interpreter/JVM teardown
                pass


def _global_rank_cap(
    survivors: DataFrame, order: list, cap: int, cache_registry: list | None
) -> tuple[DataFrame, int | None]:
    """Exact global top-``cap`` + dense seq, distributed; returns
    ``(ranked, survivors_total)`` — the total is known for free on the
    large-cap path (sum of the per-partition offset counts; band-pruned
    dequeues use it to prove the prune kept >= cap rows) and ``None`` on the
    small-cap path.

    For small caps TakeOrderedAndProject + a tiny window is optimal; for
    large caps both serialize (driver merge / single-partition window), so:
    range-partition on the total order, sort within partitions, compute
    per-partition offsets from a tiny counts job, seq = offset + local
    row_number. seq equals the global rank regardless of where the sampled
    range boundaries fall, so determinism (risk R2) is preserved.
    """
    spark = survivors.sparkSession
    if cap <= 20_000:
        capped = survivors.orderBy(*order).limit(cap)
        wseq = Window.orderBy(*order)
        return capped.withColumn("seq", (F.row_number().over(wseq) - 1).cast("int")), None

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # repartitionByRange SAMPLES its input in a separate job to pick range
    # boundaries — without this persist the expensive dequeue windows would
    # compute twice (once for the sample pass, once for the real shuffle).
    survivors = survivors.persist(StorageLevel.MEMORY_AND_DISK)
    s = (
        survivors.repartitionByRange(n_part, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # The persist is CORRECTNESS, not just perf: repartitionByRange samples
    # its range boundaries per execution, so without it the sizes job below
    # and the final consumer could place rows in different __pid partitions
    # and the offsets would be wrong (caught by test_global_rank_cap_large_
    # path). MEMORY_AND_DISK (explicit, spills instead of evicting) because
    # an evicted-and-recomputed `s` re-samples boundaries: under ANSI mode
    # the element_at(off_map, __pid) below then fails loudly with
    # MAP_KEY_DOES_NOT_EXIST — if that error ever appears here it means the
    # cache was dropped mid-query, not bad input. Callers pass cache_registry
    # to unpersist after the round; direct callers use rank_cache_scope()
    # (scope-exit release) or stay pinned until release_rank_caches().
    if cache_registry is not None:
        cache_registry.append(survivors)
        cache_registry.append(s)
    elif _SCOPED_RANK_CACHES:
        _SCOPED_RANK_CACHES[-1].extend((survivors, s))
    sizes = {r["__pid"]: r["c"] for r in s.groupBy("__pid").agg(F.count("*").alias("c")).collect()}
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    # offsets as a literal map lookup, NOT a broadcast join: a broadcast
    # build is driver-serial seconds per round (an Amdahl term), while this
    # ~n_part-entry CASE/map evaluates inside the same codegen stage.
    off_map = F.create_map(
        *[F.lit(v) for pair in (offsets or [(0, 0)]) for v in pair]
    )
    w = Window.partitionBy("__pid").orderBy(*order)
    ranked = s.withColumn(
        "seq",
        (F.element_at(off_map, F.col("__pid")) + F.row_number().over(w) - 1).cast("int"),
    )
    result = ranked.where(F.col("seq") < cap).drop("__pid")
    if cache_registry is None and not _SCOPED_RANK_CACHES:
        # No finalizer here — a weakref on `result` fires as soon as the
        # caller derives a new DataFrame and drops this one, unpersisting the
        # placement-freezing caches MID-QUERY; a recompute then re-samples the
        # range boundaries and produces overlapping seq ranges (caught by
        # tests/test_band_pruning.py). Registry-less callers outside a
        # rank_cache_scope() keep the pin for the session;
        # release_rank_caches() frees them.
        _PINNED_RANK_CACHES.extend((survivors, s))
    return result, acc


def band_col(priority: Column) -> Column:
    """Discrete priority band: priority is a multiple of 0.25 by construction
    (plans/policy.py), so ``priority*4`` is an exact integer."""
    return F.round(priority * 4).cast("int")


def _band_threshold(band_hist: dict[int, int], target: int) -> int:
    """Smallest band (scanning from the top) whose cumulative frontier rows
    reach ``target``; the lowest band if the whole frontier is smaller."""
    cum = 0
    bands = sorted(band_hist, reverse=True)
    for b in bands:
        cum += band_hist[b]
        if cum >= target:
            return b
    return bands[-1]


def dequeue(
    frontier: DataFrame,
    host_state: DataFrame,
    policy: CrawlPolicy,
    refill: bool,
    cache_registry: list | None = None,
    band_hist: dict[int, int] | None = None,
) -> DataFrame:
    """Politeness-budgeted, skew-salted priority dequeue (O1/O2/W1/A7).

    Returns frontier columns + ``seq`` (dequeue position within the round).

    ``band_hist`` (band -> frontier row count, maintained arithmetically by
    the crawl loop) enables EXACT band pruning at scale: ranking the whole
    10^10-row frontier each round to select ~10^6 is O(state) work; with the
    histogram the scan is restricted to the top priority bands holding >= 2x
    the cap. Exactness argument: politeness windows order by priority DESC,
    so dropping strictly-lower bands never changes an included row's
    row_number; if the pruned survivor count still reaches the cap, every
    global top-cap row lies in the included bands (anything below the
    threshold band is outranked by all cap selected rows). When the pruned
    survivors fall short (budget-starved top bands), one fallback pass runs
    unpruned — detected from the survivor total the rank-cap computes anyway.
    """
    from bravewebcrawler_spark.operators.politeness import host_budget

    order = [F.col("priority").desc(), F.col("depth").asc(), F.col("url_hash").asc(), F.col("url_canon").asc()]
    cap = policy.max_urls_per_round

    def rank(fr: DataFrame) -> tuple[DataFrame, int | None]:
        budgeted = fr.join(host_state, "host", "left").withColumn(
            "budget", host_budget(policy, refill)
        )
        # phase 1: salted per-(host,salt) prefix — bounds hot-host window size
        salted = budgeted.withColumn("salt", F.pmod(F.col("url_hash"), F.lit(SALT_N)))
        w1 = Window.partitionBy("host", "salt").orderBy(*order)
        phase1 = salted.withColumn("rn1", F.row_number().over(w1)).where(F.col("rn1") <= F.col("budget"))
        # phase 2: exact per-host prefix over the ≤ SALT_N×budget survivors
        w2 = Window.partitionBy("host").orderBy(*order)
        phase2 = phase1.withColumn("rn2", F.row_number().over(w2)).where(F.col("rn2") <= F.col("budget"))
        # global round cap + seq assignment (distributed for large caps)
        return _global_rank_cap(phase2, order, cap, cache_registry)

    prune = (
        policy.dequeue_band_pruning
        and band_hist
        and cap > 20_000  # the small-cap path never reports survivor totals
    )
    if prune:
        thr = _band_threshold(band_hist, 2 * cap)
        if thr > min(band_hist):
            pruned, total = rank(frontier.where(band_col(F.col("priority")) >= thr))
            if total is not None and total >= cap:
                return pruned.select(*[f.name for f in FRONTIER_SCHEMA.fields], "seq")
            # fall through: top bands were budget-starved — rank unpruned
    ranked, _ = rank(frontier)
    return ranked.select(*[f.name for f in FRONTIER_SCHEMA.fields], "seq")


def run_round(
    spark: SparkSession,
    web: SynthWeb,
    frontier: DataFrame,
    seen: DataFrame,
    host_state: DataFrame,
    robots: DataFrame,
    policy: CrawlPolicy,
    round_no: int,
    bloom: DataFrame | None = None,
    band_hist: dict[int, int] | None = None,
) -> dict[str, DataFrame]:
    """Execute one round; returns O(delta) state updates + round outputs.

    Commit-size contract (the 10^10-frontier design): everything a round
    WRITES is bounded by the round, not by total state —
      * ``seen_delta``      — this round's selected keys only,
      * ``bloom_delta``     — only buckets that received hashes,
      * ``frontier_delta``  — only rows whose key was (re)discovered this
        round, min-depth-merged against their current frontier version.
    The full-state views (``frontier``/``seen``/``bloom``) are lazy unions
    for in-round consumers and the periodic compaction write; the caller
    (plans/crawl.py) re-derives next-round state from the committed delta
    parquet so lineage never chains through a round's cached internals.

    The frontier split is two BROADCAST joins (selected keys <= round cap;
    discovered keys <= round fan-out), i.e. map-side filters — the frontier
    itself is never shuffled. At fan-outs where the discovered key set
    outgrows a broadcast (~100M+ keys/round), flip to a plain shuffle join
    for that round (AQE) — the commit stays O(delta) either way.
    """
    from bravewebcrawler_spark.operators.seen import bloom_hits, bloom_insert_delta, empty_bloom

    if bloom is None:
        bloom = empty_bloom(spark, policy.bloom_buckets)
    # selected and fetched fan out into every downstream branch (seen, log,
    # documents, host_state, frontier); persisting them makes the dequeue
    # windows and the mapInPandas fetch run ONCE per round instead of once
    # per state-table write. The caller unpersists after the round commit.
    #
    # CRITICAL for scaling: the global-cap TakeOrderedAndProject (and the seq
    # window) collapse to a single partition — without the repartition below,
    # the whole fetch+parse of a round would run in ONE task and adding
    # executors could not help (measured: local[8] beat local[32] before
    # this). seq is already assigned, so spreading by url_hash is free.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cached: list[DataFrame] = []
    selected = (
        dequeue(
            frontier, host_state, policy, refill=round_no > 0,
            cache_registry=cached, band_hist=band_hist,
        )
        .repartition(n_part, F.col("url_hash"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    fetched = (
        selected.select("url_canon", "url_hash", "seq", "depth", "attempts")
        .mapInPandas(_fetch_parse_factory(web), schema=FETCHED_SCHEMA)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # F18: error messages truncated to 30 chars in the log, never dropped
    # (brave_processor.py:179,198)
    crawl_log = fetched.select(
        F.lit(round_no).alias("round"),
        "seq",
        "url_canon",
        "status",
        F.substring("error", 1, 30).alias("error"),
    )
    documents = fetched.where(F.col("status") == "FETCHED_OK").select(
        F.col("url_canon").alias("doc_id"), F.lit(round_no).alias("round"), "spans"
    )

    # T2: a TIMEOUT is transient — the URL is NOT marked seen; it returns to
    # the frontier below with attempts+1 and is retried on a later round.
    seen_delta = fetched.where(F.col("status") != "TIMEOUT").select(
        "url_canon", "url_hash", F.lit(round_no).alias("round_seen")
    )
    new_seen = seen.unionByName(seen_delta)

    # token accounting: refill (rounds>0), then subtract this round's spend
    from bravewebcrawler_spark.operators.politeness import spend_tokens

    spends = selected.groupBy("host").agg(F.count("*").cast("double").alias("spent"))
    new_host_state = spend_tokens(host_state, spends, policy, refill=round_no > 0)

    # P6 wired into the round: only successfully fetched pages expand, and —
    # with the relevance gate on — pages whose <title> is generic do not
    # contribute outlinks (the reference gates its expensive stage on the
    # relevance pre-check, brave_processor.py:94-102). The page itself is
    # still fetched, logged and kept as a document; only expansion is gated.
    expanding = fetched.where(F.col("status") == "FETCHED_OK")
    if policy.use_relevance_gate:
        from bravewebcrawler_spark.functions.relevance import is_generic_title_col

        title = F.element_at(F.col("spans"), 1)["text"]
        expanding = expanding.where(~is_generic_title_col(title))
    discovered_raw = (
        expanding.select("depth", F.explode_outer("outlinks").alias("url"))
        .where(F.col("url").isNotNull())
        .select("url", (F.col("depth") + 1).alias("link_depth"))
    )
    # RAW-link dedup BEFORE canonicalization: a page fan-out of ~30 links
    # means most discoveries are duplicates, so collapsing on the raw string
    # first (map-side partial agg + one skinny (url, min depth) shuffle) runs
    # the expensive canonicalize/hash/priority battery on |unique| rows, not
    # |links| (~30x less CPU+GC; measured 2x round-1 jobB at bench scale).
    # min(depth) keeps the shallowest discovery — the same contract
    # merge_frontier applies after canonical aliases collapse, so the final
    # (priority, depth) per canonical key is unchanged. The shuffle is the
    # same row COUNT a canonical-first merge pays, but ~60-byte rows instead
    # of fully-shaped frontier entries.
    discovered_uniq = discovered_raw.groupBy("url").agg(F.min("link_depth").alias("link_depth"))
    discovered = admit_candidates(discovered_uniq, "link_depth", round_no + 1, robots, policy)
    # Canonical-alias dedup (tiny: only raw forms that differ but canonicalize
    # equal remain) — also what keeps the bloom/anti-join input at |unique|.
    discovered = merge_frontier(discovered)
    # J2 dedup: the exact anti-join is always the authority; with use_bloom
    # the bucketed bloom splits candidates so only bloom HITS pay the join
    # against the (large) seen table (operators/seen.py, risk R3).
    # bloom_delta holds ONLY the dirty buckets (the O(delta) write); the
    # untouched buckets pass through JVM-side inside new_bloom.
    bloom_delta, new_bloom = bloom_insert_delta(
        bloom, selected.select("url_hash"), policy.bloom_buckets, policy.bloom_m_bits
    )
    bloom_delta = bloom_delta.persist(StorageLevel.MEMORY_AND_DISK)
    cached += [selected, fetched, bloom_delta]
    if policy.use_bloom:
        # hash-only membership probe: 12 bytes/candidate through Arrow, hit
        # hashes back. A bloom MISS is authoritative (no false negatives), so
        # only hits need exact confirmation:
        #   confirmed = hits ∩ seen        (two small sides)
        #   new       = discovered ⟂ confirmed  (ONE broadcast anti-join)
        # One anti-join scan of discovered plus the probe's hash-only scan,
        # and ONE broadcast (≤ |hits|) — the earlier fresh/suspect split
        # scanned discovered twice more and built three broadcast relations,
        # a per-round serial cost no parallelism removes.
        discovered = discovered.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(discovered)
        hits = bloom_hits(
            discovered.select("url_hash"), new_bloom, policy.bloom_buckets, policy.bloom_m_bits
        )
        confirmed = hits.join(new_seen.select("url_hash"), "url_hash", "left_semi")
        discovered = discovered.join(confirmed, "url_hash", "left_anti")
    else:
        discovered = discovered.join(new_seen.select("url_hash"), "url_hash", "left_anti")
    # T2 retries: timed-out URLs return to the frontier with attempts+1
    # (host/path/priority recomputed from the canonical URL — identical pure
    # functions, so the retried entry ranks exactly as the original did).
    retry = fetched.where(F.col("status") == "TIMEOUT").select(
        "url_canon",
        "url_hash",
        host_of_col(F.col("url_canon")).alias("host"),
        path_of_col(F.col("url_canon")).alias("path"),
        "depth",
        (F.col("attempts") + 1).alias("attempts"),
    )
    retry = retry.select(
        "url_canon",
        "url_hash",
        "host",
        "path",
        priority_col(F.col("host"), F.col("path"), F.col("depth")).alias("priority"),
        "depth",
        F.lit(round_no + 1).alias("round_added"),
        F.concat(F.lit(f"r{round_no}:retry:p"), F.spark_partition_id().cast("string")).alias("lineage"),
        "attempts",
    )
    additions = discovered.unionByName(retry)
    # additions feeds three consumers (the touched-keys broadcast below,
    # frontier_delta, and the warm/metrics count) — persist it so the
    # explode→canonicalize→dedup chain runs once per round.
    additions = additions.persist(StorageLevel.MEMORY_AND_DISK)
    cached.append(additions)

    # O(delta) frontier update: rows selected this round leave; rows whose
    # key was rediscovered (or timed out and re-enqueued) are merged against
    # their current frontier version; all other rows are untouched and NEVER
    # shuffled or rewritten. Both key sets are round-bounded → broadcast
    # (map-side) anti/semi joins.
    # No broadcast hints here: both key sets are round-bounded but can reach
    # tens of millions at a real fan-out (past any broadcast limit), and a
    # forced-broadcast build is driver-SERIAL time no parallelism removes.
    # Declared as plain joins, AQE converts to broadcast when the runtime
    # size is under spark.sql.adaptive.autoBroadcastJoinThreshold and keeps
    # the (parallel, scalable) shuffle join otherwise.
    selected_keys = selected.select("url_hash")
    touched_keys = additions.select("url_hash")
    remaining = frontier.join(selected_keys, "url_hash", "left_anti")
    touched = remaining.join(touched_keys, "url_hash", "left_semi")
    untouched = remaining.join(touched_keys, "url_hash", "left_anti")
    # __touched piggybacks on the merge shuffle so the caller can derive the
    # new frontier size ARITHMETICALLY (prev - selected - touched + |delta|)
    # instead of scanning the full frontier for a metrics count — at a 10^10
    # frontier an O(state) read per round just for a progress number. The tag
    # value is the touched row's OLD priority band (NOT a boolean): the same
    # merge then also yields the per-band removals the dequeue band histogram
    # needs; -1000 marks brand-new keys (max() keeps the old band when both
    # versions of a key are present — a frontier key is unique, so at most
    # one tagged row per key carries a real band).
    fdelta_tagged = merge_frontier(
        touched.withColumn("__touched", band_col(F.col("priority"))).unionByName(
            additions.withColumn("__touched", F.lit(-1000))
        ),
        tag_col="__touched",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cached.append(fdelta_tagged)
    frontier_delta = fdelta_tagged.drop("__touched")
    new_frontier = untouched.unionByName(frontier_delta)

    return {
        "frontier": new_frontier,
        "frontier_delta": frontier_delta,
        "fdelta_tagged": fdelta_tagged,
        "seen": new_seen,
        "seen_delta": seen_delta,
        "host_state": new_host_state,
        "bloom": new_bloom,
        "bloom_delta": bloom_delta,
        "documents": documents,
        "crawl_log": crawl_log,
        "selected_count": selected,  # caller may count for the empty-round gate
        "fetched": fetched,
        "additions": additions,  # discovered ∪ retries (frontier delta input)
        "_cached": cached,  # caller unpersists after commit
    }
