"""Multi-probe LSH ANN: candidate-superset and recall guarantees.

Single-probe sign-LSH loses any neighbor that lies across exactly one
hyperplane from the query. Multi-probe (probe the query's bucket plus all
Hamming-1 buckets) must therefore (a) return a candidate set that is a
superset of single-probe's per query, and (b) never have lower recall
against the exact brute-force top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bravewebcrawler_spark.operators import similarity as SIM

K = 10
N_QUERIES = 40


def _pairs(df) -> set[tuple[int, int]]:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_multiprobe_recall_not_below_single_probe(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    args = (queries, emb, "vec_id", "embedding", "vec_id", "embedding")

    exact = _pairs(SIM.brute_force_topk(*args, k=K))
    single = _pairs(SIM.lsh_bucketed_topk(*args, k=K, n_planes=8))
    multi = _pairs(SIM.multiprobe_lsh_topk(*args, k=K, n_planes=8))

    assert exact, "brute-force baseline returned nothing"
    recall_single = len(single & exact) / len(exact)
    recall_multi = len(multi & exact) / len(exact)
    assert recall_multi >= recall_single


def test_multiprobe_candidates_superset_of_single_probe(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < N_QUERIES)

    # a neighbor ranked by single-probe shares the query's bucket, which the
    # multi-probe set always includes — so with an uncapped k the multi-probe
    # result must contain every single-probe (query, neighbor) pair
    big_k = 10_000
    single = _pairs(
        SIM.lsh_bucketed_topk(queries, emb, "vec_id", "embedding", "vec_id", "embedding", k=big_k, n_planes=8)
    )
    multi = _pairs(
        SIM.multiprobe_lsh_topk(queries, emb, "vec_id", "embedding", "vec_id", "embedding", k=big_k, n_planes=8)
    )
    assert single <= multi
    # and multi-probe genuinely widens the candidate set on this corpus
    assert len(multi) > len(single)


def test_ivf_learned_centroids_recall_and_determinism(spark, sf_dir):
    """Learned IVF (2 k-means iterations in DataFrame ops) must (a) actually
    train — the codebook moves off the lowest-id init, (b) not lose recall
    vs the untrained baseline on this (fixed, deterministic) corpus, and
    (c) be partitioning-independent: the quantized-integer mean makes the
    codebook identical whatever the input split (here: 1 vs 16 partitions)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    args = (queries, emb, "vec_id", "embedding", "vec_id", "embedding")

    exact = _pairs(SIM.brute_force_topk(*args, k=K))
    base = _pairs(SIM.ivf_topk(*args, k=K, kmeans_iters=0))
    learned = _pairs(SIM.ivf_topk(*args, k=K, kmeans_iters=2))
    recall_base = len(base & exact) / len(exact)
    recall_learned = len(learned & exact) / len(exact)
    assert recall_learned >= recall_base >= 0.5

    init = SIM.learn_ivf_centroids(emb, "vec_id", "embedding", 16, 0)
    c_few = SIM.learn_ivf_centroids(emb.coalesce(1), "vec_id", "embedding", 16, 2)
    c_many = SIM.learn_ivf_centroids(emb.repartition(16), "vec_id", "embedding", 16, 2)
    assert c_few != init  # training moved the codebook
    assert c_few == c_many  # bit-identical across partitionings
