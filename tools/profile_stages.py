"""Stage-level utilization profile of round-1 jobB (discover→dedup→merge).

Runs the same pipeline as tools/profile_jobb.py profile() but with the Spark
UI enabled, then pulls /api/v1 stage metrics and reports, per stage:
wall (completion-submission), executorRunTime sum, task count — and the
implied utilization executorRunTime / (cores x wall). Low-utilization stages
and inter-stage gaps are the serial fraction parallelism cannot touch.

Usage (state0 must exist — python tools/profile_jobb.py build):
  taskset -c 0-7 python tools/profile_stages.py 8
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-tmp")
os.makedirs("/dev/shm/spark-tmp", exist_ok=True)

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bravewebcrawler_spark.plans import checkpoint as ckpt  # noqa: E402
from bravewebcrawler_spark.session import get_spark  # noqa: E402
from tools.profile_jobb import POLICY, STATE0, WEB  # noqa: E402


def main(cpus: int) -> None:
    from bravewebcrawler_spark.operators.seen import bloom_hits, bloom_insert_delta
    from bravewebcrawler_spark.plans.round import (
        FETCHED_SCHEMA,
        _fetch_parse_factory,
        admit_candidates,
        dequeue,
        merge_frontier,
        robots_df,
    )

    spark = get_spark(
        "profile-stages",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    robots = robots_df(spark, WEB)
    st = ckpt.load_state(spark, STATE0, 0)
    frontier, seen, host_state, bloom = st["frontier"], st["seen"], st["host_state"], st["bloom"]

    marks: list[tuple[str, float]] = [("start", time.time())]

    def lap(label: str) -> None:
        marks.append((label, time.time()))
        prev = marks[-2][1]
        print(f"{label:34s} {marks[-1][1] - prev:7.2f}s", flush=True)

    selected = (
        dequeue(frontier, host_state, POLICY, refill=True, cache_registry=[])
        .repartition(max(cpus, 8), F.col("url_hash"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    selected.count()
    lap("dequeue")

    fetched = (
        selected.select("url_canon", "url_hash", "seq", "depth", "attempts")
        .mapInPandas(_fetch_parse_factory(WEB), schema=FETCHED_SCHEMA)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    fetched.count()
    lap("fetch+parse")

    raw = (
        fetched.where(F.col("status") == "FETCHED_OK")
        .select("depth", F.explode_outer("outlinks").alias("url"))
        .where(F.col("url").isNotNull())
        .select("url", (F.col("depth") + 1).alias("d"))
    )
    admitted = admit_candidates(raw, "d", 1, robots, POLICY)
    merged = merge_frontier(admitted).persist(StorageLevel.MEMORY_AND_DISK)
    merged.count()
    lap("explode+canon+merge")

    bloom_delta, new_bloom = bloom_insert_delta(
        bloom, selected.select("url_hash"), POLICY.bloom_buckets, POLICY.bloom_m_bits
    )
    hits = bloom_hits(
        merged.select("url_hash"), new_bloom, POLICY.bloom_buckets, POLICY.bloom_m_bits
    ).persist(StorageLevel.MEMORY_AND_DISK)
    hits.count()
    lap("bloom probe")

    new_seen = seen.unionByName(
        fetched.where(F.col("status") != "TIMEOUT").select(
            "url_canon", "url_hash", F.lit(1).alias("round_seen")
        )
    )
    confirmed = hits.join(new_seen.select("url_hash"), "url_hash", "left_semi")
    additions = merged.join(confirmed, "url_hash", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    additions.count()
    lap("seen anti-join")

    selected_keys = selected.select("url_hash")
    touched_keys = additions.select("url_hash")
    remaining = frontier.join(selected_keys, "url_hash", "left_anti")
    touched = remaining.join(touched_keys, "url_hash", "left_semi")
    fdelta = merge_frontier(
        touched.withColumn("__touched", F.lit(1)).unionByName(
            additions.withColumn("__touched", F.lit(0))
        ),
        tag_col="__touched",
    )
    fdelta.agg(F.count("*"), F.count_if(F.col("__touched") == 1)).first()
    lap("touched-merge fdelta")

    total = marks[-1][1] - marks[0][1]

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    # per-phase attribution: each stage's submission time falls in one lap window
    import datetime as dt

    def ts(s: str) -> float:
        return dt.datetime.strptime(s[:-3], "%Y-%m-%dT%H:%M:%S.%f").replace(
            tzinfo=dt.timezone.utc
        ).timestamp()

    per_phase: dict[str, dict[str, float]] = {}
    for s in stages:
        if "submissionTime" not in s or "completionTime" not in s:
            continue
        sub, comp = ts(s["submissionTime"]), ts(s["completionTime"])
        phase = None
        for (label, t_end), (_, t_start) in zip(marks[1:], marks[:-1]):
            if t_start <= sub < t_end:
                phase = label
                break
        if phase is None:
            phase = "(outside)"
        d = per_phase.setdefault(
            phase, {"wall": 0.0, "run": 0.0, "cpu": 0.0, "gc": 0.0, "tasks": 0, "stages": 0}
        )
        d["wall"] += comp - sub
        d["run"] += s["executorRunTime"] / 1000.0
        d["cpu"] += s["executorCpuTime"] / 1e9
        d["gc"] += s["jvmGcTime"] / 1000.0
        d["tasks"] += s["numCompleteTasks"]
        d["stages"] += 1

    print(f"\ncpus={cpus}  total={total:.2f}s — per-phase stage accounting:")
    print(
        f"{'phase':26s} {'lapwall':>8s} {'stgwall':>8s} {'runtime':>8s} {'cputime':>8s} {'gctime':>7s} {'util':>6s} {'gap':>7s} {'stages':>6s} {'tasks':>6s}"
    )
    for (label, t_end), (_, t_start) in zip(marks[1:], marks[:-1]):
        lw = t_end - t_start
        d = per_phase.get(
            label, {"wall": 0.0, "run": 0.0, "cpu": 0.0, "gc": 0.0, "tasks": 0, "stages": 0}
        )
        util = d["run"] / (cpus * lw) if lw > 0 else 0.0
        gap = lw - d["wall"]
        print(
            f"{label:26s} {lw:8.2f} {d['wall']:8.2f} {d['run']:8.2f} {d['cpu']:8.2f} {d['gc']:7.2f} {util:6.2f} {gap:7.2f} {d['stages']:6d} {d['tasks']:6d}"
        )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
