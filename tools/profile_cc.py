"""Profile the connected-components loop of dedup_components at a given SF:
rounds, per-round wall, and the cost split between the pairs chain and CC.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/profile_cc.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from bravewebcrawler_spark.operators import dedup as DD  # noqa: E402
from bravewebcrawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_MULT", "4")
    spark = get_spark("profile-cc")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    e.queries()["q1_pricing_summary"](spark, sf_dir).collect()

    corpus = e._neardup_corpus(spark, sf_dir)
    caches: list = []
    t0 = time.time()
    pairs = DD.lsh_refined_pairs(corpus, "doc_id", "text", k=3, threshold=0.6, cache_registry=caches)
    pairs = e._materialize_and_release(pairs, caches)
    t1 = time.time()
    print(f"pairs chain: {t1 - t0:.2f}s ({pairs.count()} pairs)")

    stats: dict = {}
    comp = DD.connected_components(pairs, corpus, id_col="doc_id", cache_registry=caches, stats=stats)
    out = comp.select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))
    out = e._materialize_and_release(out, caches)
    t2 = time.time()
    print(f"CC: {t2 - t1:.2f}s rounds={stats.get('rounds')} ({out.count()} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
