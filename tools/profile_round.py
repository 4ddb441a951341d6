"""Phase-level profiling of one crawl round at a given parallelism.

Usage: python tools/profile_round.py <cpus>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from bravewebcrawler_spark.plans.crawl import initial_state
from bravewebcrawler_spark.plans.policy import CrawlPolicy
from bravewebcrawler_spark.plans.round import _fetch_parse_factory, dequeue, FETCHED_SCHEMA, robots_df, admit_candidates
from bravewebcrawler_spark.session import get_spark
from bravewebcrawler_spark.sources.synthweb import SynthWeb

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
spark = get_spark("profile", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))

web = SynthWeb(seed=42, n_hosts=3000, pages_per_host=200, hot_hosts=5, weight=6)
policy = CrawlPolicy(capacity=32.0, rate=32.0, max_urls_per_round=50000, max_rounds=3, max_depth=8)
seeds = spark.createDataFrame(web.seed_urls(8000), "seed_id string, url string")


def lap(label, t0):
    t = time.time()
    print(f"{label:28s} {t - t0:7.2f}s", flush=True)
    return t


t0 = time.time()
st = initial_state(spark, web, seeds, policy)
frontier = st["frontier"].persist(StorageLevel.MEMORY_AND_DISK)
n = frontier.count()
t0 = lap(f"seed frontier ({n})", t0)

# simulate round-1-scale frontier: crawl round 0 quickly to grow it
robots = robots_df(spark, web)
sel0 = dequeue(frontier, st["host_state"], policy, refill=False).persist(StorageLevel.MEMORY_AND_DISK)
n = sel0.count()
t0 = lap(f"dequeue r0 ({n})", t0)
fetched0 = sel0.select("url_canon", "url_hash", "seq", "depth", "attempts").mapInPandas(_fetch_parse_factory(web), FETCHED_SCHEMA).persist(StorageLevel.MEMORY_AND_DISK)
n = fetched0.count()
t0 = lap(f"fetch+parse r0 ({n})", t0)
raw = fetched0.select("depth", F.explode_outer("outlinks").alias("url")).where(F.col("url").isNotNull()).select("url", (F.col("depth") + 1).alias("d"))
disc = admit_candidates(raw, "d", 1, robots, policy).persist(StorageLevel.MEMORY_AND_DISK)
n = disc.count()
t0 = lap(f"admit/canon r1 cands ({n})", t0)
from bravewebcrawler_spark.plans.round import merge_frontier
big = merge_frontier(frontier.unionByName(disc)).persist(StorageLevel.MEMORY_AND_DISK)
n = big.count()
t0 = lap(f"merge frontier ({n})", t0)

sel1 = dequeue(big, st["host_state"], policy, refill=True).persist(StorageLevel.MEMORY_AND_DISK)
n = sel1.count()
t0 = lap(f"dequeue r1 BIG ({n})", t0)
fetched1 = sel1.select("url_canon", "url_hash", "seq", "depth", "attempts").mapInPandas(_fetch_parse_factory(web), FETCHED_SCHEMA).persist(StorageLevel.MEMORY_AND_DISK)
n = fetched1.count()
t0 = lap(f"fetch+parse r1 ({n})", t0)
raw1 = fetched1.select("depth", F.explode_outer("outlinks").alias("url")).where(F.col("url").isNotNull()).select("url", (F.col("depth") + 1).alias("d"))
disc1 = admit_candidates(raw1, "d", 2, robots, policy)
n = disc1.count()
t0 = lap(f"admit/canon r2 cands ({n})", t0)
fetched1.write.mode("overwrite").parquet(f"/tmp/profile_fetched_{cpus}")
t0 = lap("write fetched parquet", t0)
