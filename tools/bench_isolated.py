"""Isolated per-query walls: each headline query in its OWN fresh JVM.

The in-suite per-query column of bench.py is only trustworthy if it matches
what a query costs alone (VERDICT r3 #1: in-suite numbers were off 4-6x in
both directions before the clearCache+GC breath landed). This tool runs
`bench.py` once per headline query with SPARK_GRAFT_QUERIES=<name> — the
IDENTICAL code path, env, and warmup, just a fresh JVM and an otherwise-empty
suite — and writes:

  BENCH/isolated.json   {"queries": {name: sec}, "sf": .., "cpus": ..}
  BENCH/ISOLATED.md     the published isolated column + the comparison rule

Usage: python tools/bench_isolated.py [--suite-json BENCH_rXX.json]
(the optional suite JSON adds an in-suite column + ratio to ISOLATED.md).
--rerun a,b,c re-measures just the named queries (fresh JVMs) and merges
them into the recorded column — for re-timing the queries an engine change
touched without re-running the whole suite.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_JSON = os.path.join(REPO, "BENCH", "isolated.json")
OUT_MD = os.path.join(REPO, "BENCH", "ISOLATED.md")


def run_one(name: str) -> dict:
    # bench.py runs each listed query best-of-2 (interleaved reps), so the
    # reported wall is the WARM one. A first run in a fresh JVM pays 1-3s of
    # JIT/codegen warmup that the suite amortizes across 28 queries —
    # comparing in-suite (warm) walls against cold isolated walls would
    # read as uniform "speedup" and hide real contamination. Warm-vs-warm
    # is the apples-to-apples basis.
    env = dict(os.environ, SPARK_GRAFT_QUERIES=name, SPARK_GRAFT_SKIP_CRAWL="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    assert out.returncode == 0, (name, out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    import bench

    suite = None
    if "--suite-json" in sys.argv:
        with open(sys.argv[sys.argv.index("--suite-json") + 1]) as f:
            suite = json.load(f)
        suite = suite.get("parsed", suite).get("queries", {})

    if "--render-only" in sys.argv or "--rerun" in sys.argv:
        with open(OUT_JSON) as f:
            prev = json.load(f)
        timings, sf, cpus = prev["queries"], prev["sf"], prev["cpus"]
        # drop queries no longer in the suite; RUN queries newly added to
        # HEADLINE (ADVICE r4: silently omitting them made the rendered file
        # claim full coverage it didn't have), then persist the merged json
        timings = {n: timings[n] for n in bench.HEADLINE if n in timings}
        missing = [n for n in bench.HEADLINE if n not in timings]
        if "--rerun" in sys.argv:
            names = sys.argv[sys.argv.index("--rerun") + 1].split(",")
            unknown = [n for n in names if n not in bench.HEADLINE]
            assert not unknown, f"not in bench.HEADLINE: {unknown}"
            missing = list(dict.fromkeys(missing + names))
        for name in missing:
            row = run_one(name)
            timings[name] = row["queries"][name]
            print(f"{name}: {timings[name]}s", flush=True)
        if missing:
            timings = {n: timings[n] for n in bench.HEADLINE}  # suite order
            with open(OUT_JSON, "w") as f:
                json.dump({"queries": timings, "sf": sf, "cpus": cpus}, f, indent=1)
    else:
        timings = {}
        sf = cpus = None
        for name in bench.HEADLINE:
            row = run_one(name)
            timings[name] = row["queries"][name]
            sf, cpus = row["sf"], row["cpus"]
            print(f"{name}: {timings[name]}s", flush=True)

        with open(OUT_JSON, "w") as f:
            json.dump({"queries": timings, "sf": sf, "cpus": cpus}, f, indent=1)

    rows = []
    for name, iso in timings.items():
        cells = [name, f"{iso:.2f}"]
        if suite and name in suite:
            ratio = suite[name] / iso if iso > 0 else float("inf")
            cells += [f"{suite[name]:.2f}", f"{ratio:.2f}x"]
        rows.append("| " + " | ".join(cells) + " |")
    hdr = (
        "| query | isolated (s) | in-suite (s) | in-suite / isolated |\n|---|---|---|---|"
        if suite else "| query | isolated (s) |\n|---|---|"
    )
    md = f"""# Isolated per-query walls (fresh JVM per query, warm run)

Each headline query timed alone: `SPARK_GRAFT_QUERIES=<name> python
bench.py` — same code path, warmup, best-of-2 reps, tmpfs dirs and
local[{cpus}] as the suite; one query per JVM, the warm (best-of-2) wall
reported, since the suite's walls are warm too (a fresh JVM's first run
pays 1-3s of JIT/codegen warmup the suite amortizes). sf={sf}. Rendered
{datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")} by
tools/bench_isolated.py (regenerate after engine changes; hand edits lost).

This is the column the in-suite numbers of BENCH_r*.json are validated
against: with the clearCache+GC breath between queries (bench.py), in-suite
walls should sit within ~1.5x of isolated-warm (host variance band) — a
larger gap means suite contamination, and the ISOLATED column is the honest
one.

{hdr}
{chr(10).join(rows)}
"""
    with open(OUT_MD, "w") as f:
        f.write(md)
    print(f"wrote {OUT_JSON} and {OUT_MD}")


if __name__ == "__main__":
    main()
