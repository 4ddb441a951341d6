"""Sub-stage profiling of round 1's jobB (discover→dedup→merge) at bench scale.

Builds round-0 committed state ONCE (cached under /dev/shm/bwc-profile/state0),
then per run resumes from it and times each sub-chain of the round-1 pipeline
separately. Run at two parallelism levels to see which stage fails to scale:

  python tools/profile_jobb.py build        # one-time round-0 state build
  taskset -c 0-1 python tools/profile_jobb.py 2
  taskset -c 0-7 python tools/profile_jobb.py 8
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
os.makedirs("/dev/shm/spark-tmp", exist_ok=True)

BASE = "/dev/shm/bwc-profile"
STATE0 = os.path.join(BASE, "state0")

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bravewebcrawler_spark.plans import checkpoint as ckpt  # noqa: E402
from bravewebcrawler_spark.plans.policy import CrawlPolicy  # noqa: E402
from bravewebcrawler_spark.session import get_spark  # noqa: E402
from bravewebcrawler_spark.sources.synthweb import SynthWeb  # noqa: E402

WEB = SynthWeb(seed=42, n_hosts=20000, pages_per_host=300, hot_hosts=10, weight=16)
POLICY = CrawlPolicy(
    capacity=40.0, rate=40.0, max_urls_per_round=250000, max_rounds=2,
    max_depth=8, use_bloom=True, bloom_buckets=64, bloom_m_bits=1 << 18,
)


def build() -> None:
    from bravewebcrawler_spark.plans.crawl import crawl

    spark = get_spark("profile-build", master="local[32]", shuffle_partitions=32)
    seeds = spark.createDataFrame(WEB.seed_urls(60000), "seed_id string, url string")
    shutil.rmtree(STATE0, ignore_errors=True)
    crawl(spark, WEB, seeds, POLICY, STATE0, stop_after_round=0)
    print("state0 built:", ckpt.latest_round(STATE0))


def profile(cpus: int) -> None:
    from bravewebcrawler_spark.plans.round import (
        FETCHED_SCHEMA,
        _fetch_parse_factory,
        admit_candidates,
        dequeue,
        merge_frontier,
        robots_df,
    )
    from bravewebcrawler_spark.operators.seen import bloom_hits, bloom_insert_delta

    spark = get_spark("profile-jobb", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    robots = robots_df(spark, WEB)
    st = ckpt.load_state(spark, STATE0, 0)
    frontier, seen, host_state, bloom = st["frontier"], st["seen"], st["host_state"], st["bloom"]

    def lap(label: str, t0: float) -> float:
        t = time.time()
        print(f"{label:34s} {t - t0:7.2f}s", flush=True)
        return t

    t0 = time.time()
    selected = (
        dequeue(frontier, host_state, POLICY, refill=True, cache_registry=[])
        .repartition(max(cpus, 8), F.col("url_hash"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = selected.count()
    t0 = lap(f"dequeue ({n})", t0)

    fetched = (
        selected.select("url_canon", "url_hash", "seq", "depth", "attempts")
        .mapInPandas(_fetch_parse_factory(WEB), schema=FETCHED_SCHEMA)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = fetched.count()
    t0 = lap(f"fetch+parse ({n})", t0)

    raw = (
        fetched.where(F.col("status") == "FETCHED_OK")
        .select("depth", F.explode_outer("outlinks").alias("url"))
        .where(F.col("url").isNotNull())
        .select("url", (F.col("depth") + 1).alias("d"))
    )
    n = raw.count()
    t0 = lap(f"explode raw links ({n})", t0)

    admitted = admit_candidates(raw, "d", 1, robots, POLICY).persist(StorageLevel.MEMORY_AND_DISK)
    n = admitted.count()
    t0 = lap(f"canon+admit OLD-shape ({n})", t0)

    merged_old = merge_frontier(admitted).persist(StorageLevel.MEMORY_AND_DISK)
    n = merged_old.count()
    t0 = lap(f"merge OLD-shape ({n})", t0)
    merged_old.unpersist()
    admitted.unpersist()

    # the shape run_round actually uses now: raw-string dedup BEFORE canon
    uniq = raw.groupBy("url").agg(F.min("d").alias("d"))
    merged = merge_frontier(admit_candidates(uniq, "d", 1, robots, POLICY)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = merged.count()
    t0 = lap(f"dedup+canon+merge NEW-shape ({n})", t0)

    bloom_delta, new_bloom = bloom_insert_delta(
        bloom, selected.select("url_hash"), POLICY.bloom_buckets, POLICY.bloom_m_bits
    )
    hits = bloom_hits(
        merged.select("url_hash"), new_bloom, POLICY.bloom_buckets, POLICY.bloom_m_bits
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = hits.count()
    t0 = lap(f"bloom probe hits ({n})", t0)

    new_seen = seen.unionByName(
        fetched.where(F.col("status") != "TIMEOUT").select(
            "url_canon", "url_hash", F.lit(1).alias("round_seen")
        )
    )
    fresh = merged.join(hits, "url_hash", "left_anti")
    suspect = merged.join(hits, "url_hash", "left_semi")
    additions = fresh.unionByName(
        suspect.join(new_seen.select("url_hash"), "url_hash", "left_anti")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = additions.count()
    t0 = lap(f"seen anti-join additions ({n})", t0)

    selected_keys = selected.select("url_hash")
    touched_keys = additions.select("url_hash")
    remaining = frontier.join(F.broadcast(selected_keys), "url_hash", "left_anti")
    touched = remaining.join(F.broadcast(touched_keys), "url_hash", "left_semi")
    fdelta = merge_frontier(
        touched.withColumn("__touched", F.lit(1)).unionByName(
            additions.withColumn("__touched", F.lit(0))
        ),
        tag_col="__touched",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    row = fdelta.agg(F.count("*").alias("n"), F.count_if(F.col("__touched") == 1).alias("t")).first()
    t0 = lap(f"touched-merge fdelta ({row['n']}/{row['t']})", t0)

    fdelta.drop("__touched").coalesce(16).write.mode("overwrite").parquet(f"{BASE}/fdelta_{cpus}")
    t0 = lap("write fdelta", t0)


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    else:
        profile(int(sys.argv[1]))
