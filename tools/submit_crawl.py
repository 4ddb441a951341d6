"""spark-submit entry point for the crawl — the north-rule deployment shape.

The reference is a single-process asyncio loop started from the shell
(/root/reference/brave_parallel_processing.py:327-396); the production analog
for this engine is

    python tools/package_pyfiles.py                       # -> dist/bwc_pyfiles.zip
    spark-submit --master <cluster> \
        --py-files dist/bwc_pyfiles.zip \
        tools/submit_crawl.py --seeds <parquet> --state-dir <dir> [options]

The script builds NO master of its own: the SparkSession comes from
spark-submit's conf (cluster manager, executor count/memory, --py-files
shipping the package to executor Python workers). Everything else — AQE,
shuffle sizing, Arrow, the crawl policy — is the same code path the tests and
the bench run, so a cluster deployment is configuration, not new code.

Smoke-tested in-sandbox via tests/test_spark_submit.py: a real spark-submit
against local-cluster[2,2,...] with the zip on --py-files (executors import
the engine from the zip, not the repo checkout).
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", required=True, help="parquet with (seed_id string, url string)")
    ap.add_argument("--state-dir", required=True, help="checkpoint/state directory")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--max-urls-per-round", type=int, default=800_000)
    ap.add_argument("--politeness", type=float, default=50.0, help="token-bucket capacity=rate")
    ap.add_argument("--bloom-buckets", type=int, default=128)
    ap.add_argument("--resume", action="store_true", help="resume from last committed round")
    # synthetic-web shape (the hermetic stand-in for live HTTP; a live
    # deployment swaps SynthWeb for the real fetcher, same round plan)
    ap.add_argument("--web-hosts", type=int, default=20_000)
    ap.add_argument("--web-pages-per-host", type=int, default=300)
    ap.add_argument("--web-seed", type=int, default=42)
    args = ap.parse_args()

    # Import AFTER spark-submit has set up sys.path from --py-files.
    from pyspark.sql import SparkSession

    from bravewebcrawler_spark.plans.crawl import crawl
    from bravewebcrawler_spark.plans.policy import CrawlPolicy
    from bravewebcrawler_spark.sources.synthweb import SynthWeb

    # Master/deploy conf comes from spark-submit; only engine-level SQL conf
    # is set here (idempotent with session.get_spark defaults).
    spark = (
        SparkSession.builder.appName("bwc-crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    web = SynthWeb(
        seed=args.web_seed, n_hosts=args.web_hosts, pages_per_host=args.web_pages_per_host
    )
    policy = CrawlPolicy(
        capacity=args.politeness,
        rate=args.politeness,
        max_urls_per_round=args.max_urls_per_round,
        max_rounds=args.rounds,
        bloom_buckets=args.bloom_buckets,
    )
    seeds = spark.read.parquet(args.seeds)
    res = crawl(spark, web, seeds, policy, args.state_dir, resume=args.resume)
    print(json.dumps({"submit_ok": True, **{k: res[k] for k in ("last_round", "total_dequeued")},
                      "master": spark.sparkContext.master,
                      "py_files": os.environ.get("PYSPARK_FILES", "")}))


if __name__ == "__main__":
    main()
