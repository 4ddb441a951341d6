"""Step-level profile of the dedup_lsh_refined chain (the round-6 hot path).

Reproduces lsh_refined_pairs step by step with a lap timer and the Spark UI
enabled, then dumps the slowest stages from /api/v1 (wall, executorRunTime,
tasks, utilization = runTime / (cores x wall)) so the serial fraction is
visible. Read-only: no engine behavior depends on this file.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/profile_refined.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from bravewebcrawler_spark.operators import dedup as DD  # noqa: E402
from bravewebcrawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_MULT", "4")
    spark = get_spark(
        "profile-refined",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    # warm codegen like bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    e.queries()["q1_pricing_summary"](spark, sf_dir).collect()

    t_all = time.time()
    marks = [("start", time.time())]

    def lap(label: str) -> None:
        marks.append((label, time.time()))
        print(f"{label:40s} {marks[-1][1] - marks[-2][1]:7.2f}s", flush=True)

    sc = spark.sparkContext
    corpus = e._neardup_corpus(spark, sf_dir)

    sc.setJobDescription("shd build+persist")
    shd = DD.hashed_shingles(corpus, "doc_id", "text", 3).persist(StorageLevel.MEMORY_AND_DISK)
    shd.count()
    lap("shd (hashed shingles) persist+count")

    sc.setJobDescription("signature agg")
    sig = DD.minhash_signature_cols(corpus, "doc_id", "text", 3, shingle_hashes=shd)
    sig.write.format("noop").mode("overwrite").save()
    lap("signature agg (noop)")

    sc.setJobDescription("cand pairs")
    caches: list = []
    cand = DD.minhash_lsh_pairs(
        corpus, "doc_id", "text", 3, shingle_hashes=shd, cache_registry=caches
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_cand = cand.count()
    lap(f"cand pairs persist+count (n={n_cand})")

    sc.setJobDescription("cand_docs+semi+sizes")
    cand_docs = cand.select(F.col("id_a").alias("doc")).unionByName(
        cand.select(F.col("id_b").alias("doc"))
    ).distinct()
    sh = shd.join(cand_docs, "doc", "left_semi")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    sizes.write.format("noop").mode("overwrite").save()
    lap("cand_docs+semi+sizes (noop)")

    sc.setJobDescription("full refined")
    pairs = DD.lsh_refined_pairs(corpus, "doc_id", "text", k=3, threshold=0.6)
    pairs.write.format("noop").mode("overwrite").save()
    lap("FULL lsh_refined_pairs fresh (noop)")

    sc.setJobDescription("registry dedup_lsh_refined")
    t0 = time.time()
    e.queries()["dedup_lsh_refined"](spark, sf_dir).collect()
    lap("registry dedup_lsh_refined collect")

    sc.setJobDescription("registry dedup_components")
    e.queries()["dedup_components"](spark, sf_dir).collect()
    lap("registry dedup_components collect")

    print(f"total {time.time() - t_all:.2f}s")

    # slowest stages from the UI REST API
    base = "http://localhost:4049/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/applications/{app_id}/stages?status=complete"))
    rows = []
    for s in stages:
        try:
            sub = s["submissionTime"]
            comp = s["completionTime"]
        except KeyError:
            continue
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        wall = (datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)).total_seconds()
        rows.append(
            (
                wall,
                s["stageId"],
                s["numCompleteTasks"],
                s["executorRunTime"] / 1000.0,
                (s.get("description") or s["name"])[:80],
            )
        )
    rows.sort(reverse=True)
    print("\nslowest stages (wall s, stage, tasks, runTime s, util, desc):")
    for wall, sid, ntask, rt, desc in rows[:25]:
        util = rt / (cpus * wall) if wall > 0 else 0.0
        print(f"{wall:7.2f}  {sid:4d}  {ntask:4d}  {rt:8.1f}  {util:5.2f}  {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
