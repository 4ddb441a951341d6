"""Quantified ANN recall (VERDICT r4 #6): recall@10 of each approximate
method vs the exact brute-force top-k, together with what the method PAID
for it — candidates scored per query, the fraction of the corpus that
represents, and the lift over a random scan of the same size (the honest
ANN metric: recall alone rewards scanning everything).

Candidate counts use the public API with an uncapped k: the per-query top-k
window over ALL scored pairs returns exactly the candidate set each method
examined, so no internals are re-implemented here.

Usage: python tools/ann_recall.py [sf_dir] [n_queries]
Writes BENCH/RECALL.md + BENCH/recall.json; tests/test_ann_recall.py asserts
the pinned lower bounds so a recall regression fails CI.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BIG_K = 10**9  # uncapped: the top-k window passes every scored candidate


def compute_recall(spark, sf_dir: str, n_queries: int = 300, k: int = 10) -> dict:
    """recall@k / candidates-per-query / scan fraction / lift per method."""
    from pyspark.sql import functions as F

    from bravewebcrawler_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = emb.count()
    queries = emb.where(F.col("vec_id") < n_queries)
    nq = queries.count()
    args = (queries, emb, "vec_id", "embedding", "vec_id", "embedding")

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    exact = pairs(SIM.brute_force_topk(*args, k=k))
    methods = {
        "lsh": lambda kk: SIM.lsh_bucketed_topk(*args, k=kk, n_planes=8),
        "multiprobe": lambda kk: SIM.multiprobe_lsh_topk(*args, k=kk, n_planes=8),
        "ivf_untrained": lambda kk: SIM.ivf_topk(*args, k=kk, kmeans_iters=0),
        "ivf_learned": lambda kk: SIM.ivf_topk(*args, k=kk, kmeans_iters=2),
    }
    out = {"sf_dir": sf_dir, "n_corpus": n_corpus, "n_queries": nq, "k": k, "methods": {}}
    for name, fn in methods.items():
        recall = len(pairs(fn(k)) & exact) / len(exact)
        cand_per_q = fn(_BIG_K).count() / nq
        scan_frac = cand_per_q / (n_corpus - 1)
        out["methods"][name] = {
            "recall_at_k": round(recall, 4),
            "candidates_per_query": round(cand_per_q, 1),
            "scan_fraction": round(scan_frac, 4),
            "lift_vs_random_scan": round(recall / scan_frac, 2),
        }
    return out


def render_md(res: dict) -> str:
    lines = [
        "# ANN recall@{k} vs brute force — sf {sf} ({n} vectors, {q} queries)".format(
            k=res["k"], sf=res["sf_dir"].rstrip("/").rsplit("sf", 1)[-1],
            n=res["n_corpus"], q=res["n_queries"],
        ),
        "",
        "Recall alone rewards scanning everything, so each row also shows the",
        "price paid (candidates scored per query / corpus fraction) and the",
        "lift over a random scan of the same size — lift > 1 means the",
        "bucketing concentrates true neighbors better than chance.",
        "",
        "| method | recall@10 | candidates/query | scan fraction | lift vs random |",
        "|---|---|---|---|---|",
        "| brute force (baseline) | 1.0 | {} | 1.0 | 1.0 |".format(res["n_corpus"] - 1),
    ]
    for name, m in res["methods"].items():
        lines.append(
            f"| {name} | {m['recall_at_k']} | {m['candidates_per_query']} "
            f"| {m['scan_fraction']} | {m['lift_vs_random_scan']} |"
        )
    lines += [
        "",
        "Context: the synthetic embeddings are near-uniform in 64-d, the regime",
        "where cosine concentration makes sub-linear ANN hardest — absolute",
        "recall at sub-5% scan fractions is intrinsically low, which is why the",
        "pinned CI bounds (tests/test_ann_recall.py) are on BOTH recall floors",
        "and the lift. On structured input the same operators are exact-ish:",
        "the near-duplicate regime (cosine >= 0.99) is caught at recall 1.0 by",
        "the identical hyperplane bucketing (pinned in",
        "tests/test_allpairs_oracles.py::test_embed_lsh_recall_vs_exact).",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    from bravewebcrawler_spark.session import get_spark

    spark = get_spark("ann-recall", master="local[16]", shuffle_partitions=16,
                      extra_conf={"spark.driver.memory": "8g"})
    res = compute_recall(spark, sf_dir, n_queries)
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
    with open(os.path.join(base, "recall.json"), "w") as f:
        json.dump(res, f, indent=1)
    with open(os.path.join(base, "RECALL.md"), "w") as f:
        f.write(render_md(res))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
