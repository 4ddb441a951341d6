"""Scaling-efficiency evidence for the north rule.

No multi-node cluster exists in this sandbox, so the N-vs-4N-executor
criterion is evidenced by running the IDENTICAL crawl job on the IDENTICAL
input at two parallelism levels on this 32-core host:
  N  = local[8]   (8 executor threads)
  4N = local[32]  (32 executor threads)
Each run is a fresh subprocess (fresh JVM — no shared warm state).
Efficiency = throughput@4N / (4 x throughput@N); the north rule wants >= 0.8.

Usage: python BENCH/run_scaling.py [--repeat N] → updates BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_CRAWL_ONLY="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    repeat = int(sys.argv[sys.argv.index("--repeat") + 1]) if "--repeat" in sys.argv else 1
    results: dict[int, dict] = {}
    for cpus in (8, 32):
        best = None
        for _ in range(repeat):
            r = run_once(cpus)
            if best is None or r["crawl_urls_per_s"] > best["crawl_urls_per_s"]:
                best = r
        results[cpus] = best
        print(f"local[{cpus}]: {best['crawl_urls']} urls in {best['crawl_wall_s']}s "
              f"= {best['crawl_urls_per_s']} urls/s")

    t8, t32 = results[8]["crawl_urls_per_s"], results[32]["crawl_urls_per_s"]
    eff = t32 / (4 * t8)
    print(f"scaling efficiency (local[32] vs 4 x local[8]): {eff:.3f}")

    md = f"""# BENCH/BASELINE — crawl throughput + scaling efficiency

North-rule metric: URLs fetched+deduped per second over a synthetic frontier
(fixed seed list, SynthWeb seed=42 n_hosts=300 pages_per_host=80, politeness
capacity=8 rate=8, 4 rounds, cap 6000 URLs/round); identical job + input at
two parallelism levels, fresh JVM each (BENCH/run_scaling.py).

Measured {datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")} on this 32-core host:

| parallelism | URLs dequeued+deduped | wall (s) | throughput (urls/s) |
|---|---|---|---|
| local[8]  (N)  | {results[8]["crawl_urls"]} | {results[8]["crawl_wall_s"]} | {t8} |
| local[32] (4N) | {results[32]["crawl_urls"]} | {results[32]["crawl_wall_s"]} | {t32} |

**Scaling efficiency** = {t32} / (4 x {t8}) = **{eff:.3f}** (north rule: >= 0.8).

Caveats: local mode shares one JVM and one disk; the driver-side per-round
commit (parquet write + manifest) is a fixed cost that does not parallelize,
so small-scale efficiency UNDERSTATES what a real 4N-executor cluster gets on
a 10^10 frontier where per-round work dwarfs the commit constant.

## 10^10-frontier design math (not simulated in data volume)

- frontier hash-partitioned on pmod(url_hash, P); a round touches only the
  partitions holding dequeue candidates (partition pruning on priority tier).
- bloom seen-set: 10^10 keys at ~9.6 bits/key, k=7 => ~12 GB filter over
  1024 buckets = ~12 MB/bucket, one Arrow batch per task (operators/seen.py).
- politeness dequeue: two-phase salted window caps any task's window at
  budget x SALT_N rows per (host, salt) — hot hosts cannot skew a partition.
- round cap via TakeOrderedAndProject (distributed top-K), never a
  single-partition global window.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
