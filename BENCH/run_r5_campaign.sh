#!/bin/bash
# Round-5 measurement campaign (resumable): completes the contract-named
# local[8]/local[32] pair, runs the GC/off-heap/zstd A/B, records a fresh
# SCALE-4 exec pair with the round-0 fixes, then re-renders BASELINE.md.
# Stages run strictly in sequence — every stage taskset-pins the host, so
# overlap would contaminate draws.
set -u
cd "$(dirname "$0")/.."
echo "=== stage 1: complete rep4 local[32] partner + one more interleaved 8/32 pair"
python - <<'EOF'
import importlib.util, json, os
spec = importlib.util.spec_from_file_location("rs", "BENCH/run_scaling.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
rows = [json.loads(l) for l in open("BENCH/reps_local.jsonl") if l.strip()]
have = {(int(r.get("rep", 0)), int(r["cpus"])) for r in rows if r.get("mode") == "local"}
# complete any unpaired (rep, 8) missing its (rep, 32) partner
for rep, cpus in sorted(have):
    if cpus == 8 and (rep, 32) not in have:
        r = mod.run_once(32, rep)
        print(f"completed rep {rep} local[32]: {r['crawl_urls_per_s']} urls/s", flush=True)
nxt = max(r for r, _ in have) + 1
for cpus in (8, 32):
    r = mod.run_once(cpus, nxt)
    print(f"rep {nxt} local[{cpus}]: {r['crawl_urls_per_s']} urls/s", flush=True)
EOF
echo "=== stage 2: GC / off-heap / zstd A/B at local[8] and local[32]"
python BENCH/run_gc_ab.py --levels 8,32 --repeat 1
echo "=== stage 3: fresh SCALE-4 exec pair (1 vs 4 executor JVMs, round-0 fixes in)"
BENCH/run_exec_pair.sh 1 4
echo "=== stage 4: render"
python BENCH/run_scaling.py --render-only
echo CAMPAIGN DONE
