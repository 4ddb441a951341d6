"""GC / off-heap A/B on the single-JVM local[N] crawl bench (VERDICT r4 #2).

The local[N] scaling residual was ATTRIBUTED to GC time growing with task
threads on one shared heap; this measures the attribution head-on instead:
the identical crawl-only bench under alternative JVM memory configs,
interleaved across configs (host phases hit every config equally), each draw
appended with its config tag to BENCH/reps_local_gc.jsonl — a separate file
so the scaling table's best-of (reps_local.jsonl) never mixes JVM configs.

Configs:
  baseline  engine default: ParallelGC, on-heap (session.py)
  g1tuned   G1 with a relaxed pause goal + 32 MB regions (throughput-lean G1)
  zgc       ZGC (Java 17 single-generation; low-pause, usually lower
            throughput for batch — measured, not assumed)
  offheap   ParallelGC + spark.memory.offHeap 24g: execution/storage memory
            moves off the Java heap, cutting the GC-scanned footprint
  zstd      ParallelGC + zstd shuffle/IO compression (default lz4): smaller
            shuffle blocks trade CPU for allocation/IO pressure

Usage: python BENCH/run_gc_ab.py [--levels 8,32] [--repeat K] [--configs a,b]
Render into BENCH/BASELINE.md with: python BENCH/run_scaling.py --render-only
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GC_JSONL = os.path.join(REPO, "BENCH", "reps_local_gc.jsonl")

CONFIGS: dict[str, dict[str, str]] = {
    "baseline": {},
    "g1tuned": {"BWC_JVM_OPTS": "-XX:+UseG1GC -XX:MaxGCPauseMillis=2000 -XX:G1HeapRegionSize=32m"},
    "zgc": {"BWC_JVM_OPTS": "-XX:+UseZGC"},
    "offheap": {
        "BWC_EXTRA_CONF": "spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=25769803776"
    },
    "zstd": {"BWC_EXTRA_CONF": "spark.io.compression.codec=zstd"},
    "offzstd": {
        "BWC_EXTRA_CONF": (
            "spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=25769803776;"
            "spark.io.compression.codec=zstd"
        )
    },
}


def run_once(cpus: int, cfg: str, rep: int) -> dict:
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    os.makedirs("/dev/shm/bwc-state", exist_ok=True)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_CRAWL_ONLY="1",
        SPARK_LOCAL_DIRS="/dev/shm/spark-tmp",
        SPARK_GRAFT_STATE_DIR_BASE="/dev/shm/bwc-state",
        **CONFIGS[cfg],
    )
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600, cwd=REPO)
    assert out.returncode == 0, (cfg, out.stderr[-3000:])
    shutil.rmtree("/dev/shm/bwc-state", ignore_errors=True)
    row = json.loads(out.stdout.strip().splitlines()[-1])
    row.update(rep=rep, mode="local_gc_ab", jvm=cfg, jvm_env=CONFIGS[cfg])
    with open(GC_JSONL, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def main() -> None:
    argv = sys.argv
    levels = (
        tuple(int(x) for x in argv[argv.index("--levels") + 1].split(","))
        if "--levels" in argv
        else (8,)
    )
    repeat = int(argv[argv.index("--repeat") + 1]) if "--repeat" in argv else 1
    configs = (
        argv[argv.index("--configs") + 1].split(",") if "--configs" in argv else list(CONFIGS)
    )
    rep0 = 0
    if os.path.exists(GC_JSONL):
        with open(GC_JSONL) as f:
            reps = [int(json.loads(l).get("rep", 0)) for l in f if l.strip()]
        rep0 = max(reps) + 1 if reps else 0
    for rep in range(rep0, rep0 + repeat):
        for cpus in levels:
            for cfg in configs:  # interleaved: every config sees each host phase
                r = run_once(cpus, cfg, rep)
                print(
                    f"rep {rep} local[{cpus}] {cfg}: {r['crawl_urls']} urls in "
                    f"{r['crawl_wall_s']}s = {r['crawl_urls_per_s']} urls/s",
                    flush=True,
                )


if __name__ == "__main__":
    main()
