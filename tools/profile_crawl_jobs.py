"""Job-timeline profile of the FULL bench crawl: where does wall time go?

Runs bench.bench_crawl's exact configuration with the Spark UI enabled, then
pulls /api/v1 applications/<id>/jobs and prints, in submission order: job id,
name, wall, and the GAP since the previous job completed. Sum(job walls) vs
crawl wall separates executor-side time from driver-serial time (plan
construction, codegen compile, AQE re-planning, commit bookkeeping) — the
fixed floor that caps strong-scaling efficiency (BENCH/BASELINE.md).

Usage:  taskset -c 0-7 python tools/profile_crawl_jobs.py 8 [scale]
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
os.environ.setdefault("SPARK_GRAFT_STATE_DIR_BASE", "/dev/shm/bwc-state")
os.makedirs("/dev/shm/bwc-state", exist_ok=True)


def main(cpus: int, scale: float) -> None:
    os.environ["SPARK_GRAFT_BENCH_SCALE"] = str(scale)
    from bravewebcrawler_spark.session import get_spark

    spark = get_spark(
        "profile-crawl-jobs",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    import bench

    t0 = time.time()
    res = bench.bench_crawl(spark)
    wall = time.time() - t0
    app_id = spark.sparkContext.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"http://localhost:4049/api/v1/applications/{app_id}/jobs?status=succeeded")
    )
    jobs.sort(key=lambda j: j["submissionTime"])

    def ts(s: str) -> float:
        from datetime import datetime

        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    prev_done = None
    tot_wall = 0.0
    tot_gap = 0.0
    print(f"{'job':>4} {'wall':>8} {'gap':>8}  name")
    for j in jobs:
        sub, done = ts(j["submissionTime"]), ts(j["completionTime"])
        gap = sub - prev_done if prev_done is not None else 0.0
        # overlapped writes can start before the previous job finishes
        gap = max(gap, 0.0)
        tot_wall += done - sub
        tot_gap += gap
        name = (j.get("description") or j["name"])[:90]
        print(f"{j['jobId']:>4} {done - sub:8.2f} {gap:8.2f}  {name}")
        prev_done = max(prev_done or done, done)
    print(
        f"\ncrawl wall {wall:.1f}s  ({res['crawl_urls']} urls, {res['crawl_urls_per_s']} urls/s)"
        f"\nsum job walls {tot_wall:.1f}s   sum inter-job gaps {tot_gap:.1f}s"
        f"\n(driver-serial floor ~= gaps + non-overlapped small-job walls)"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8, float(sys.argv[2]) if len(sys.argv) > 2 else 1.0)
