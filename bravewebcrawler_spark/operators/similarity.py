"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed variant
(random-hyperplane signs from portable hashes) is the scale path: at 10^10
vectors the cross join is impossible, but hashing each vector to a small
bucket key turns ANN into an equi-join on bucket + a per-bucket re-rank.

All arithmetic is float32 → float64 casts then sequential folds, so Spark and
DuckDB produce bit-identical cosines (both fold the 64 dims left-to-right in
double precision).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bravewebcrawler_spark.operators.ranking import top_k_per_key

SIM_P = 1_000_000_007


def _dbl(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_col(u: Column, v: Column) -> Column:
    """Sequential-fold dot product in double precision (zip_with + aggregate)."""
    return F.aggregate(
        F.zip_with(_dbl(u), _dbl(v), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(u: Column) -> Column:
    return F.sqrt(dot_col(u, u))


def cosine_col(u: Column, v: Column) -> Column:
    return dot_col(u, v) / (norm_col(u) * norm_col(v))


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, q_id: str, q_vec: str, c_id: str, c_vec: str, k: int = 10
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query side across
    the corpus — one scan, no shuffle of the corpus — then per-query top-k."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("__qv"))
    c = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine_col(F.col("__qv"), F.col("__cv")).alias("cos_raw"))
    )
    top = top_k_per_key(
        scored, ["query_id"], [F.col("cos_raw").desc(), F.col("neighbor_id").asc()], k, rank_name="rank"
    )
    return top.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), F.round("cos_raw", 4).alias("cosine")
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, q_id: str, q_vec: str, c_id: str, c_vec: str,
    k: int = 10, n_centroids: int = 16, n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into centroid cells, probe
    the closest cells per query, exact re-rank inside.

    Centroids are the ``n_centroids`` lowest-id corpus vectors (deterministic
    stand-in for a k-means codebook — the operator shape, not the training,
    is what matters here). At 10^10 vectors the cell id is a write-time
    partition key: a query touches n_probe partitions instead of the corpus.
    """
    cents = corpus.where(F.col(c_id) < n_centroids).select(
        F.col(c_id).alias("cent_id"), F.col(c_vec).alias("centv")
    )
    cos_order = [F.col("cos_c").desc(), F.col("cent_id").asc()]

    assign = (
        corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("cv"))
        .crossJoin(F.broadcast(cents))
        .select("neighbor_id", "cv", "cent_id", cosine_col(F.col("cv"), F.col("centv")).alias("cos_c"))
    )
    cells = top_k_per_key(assign, ["neighbor_id"], cos_order, 1, rank_name="r").select(
        "neighbor_id", "cv", F.col("cent_id").alias("cell")
    )

    qprobe = (
        queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"))
        .crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cent_id", cosine_col(F.col("qv"), F.col("centv")).alias("cos_c"))
    )
    probes = top_k_per_key(qprobe, ["query_id"], cos_order, n_probe, rank_name="r").select(
        "query_id", "qv", F.col("cent_id").alias("cell")
    )

    cand = probes.join(cells, "cell").where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select("query_id", "neighbor_id", cosine_col(F.col("qv"), F.col("cv")).alias("cos_raw"))
    top = top_k_per_key(
        scored, ["query_id"], [F.col("cos_raw").desc(), F.col("neighbor_id").asc()], k, rank_name="rank"
    )
    return top.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), F.round("cos_raw", 4).alias("cosine")
    )


def hyperplane_sign_bucket(vec: Column, n_planes: int = 8) -> Column:
    """LSH bucket id: sign pattern of the vector against n deterministic
    pseudo-random hyperplanes. Plane p's weight for dimension i is derived
    from the portable hash of "p:i" mapped to {-1..1} range (integer-exact
    construction, so the oracle can reproduce it)."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)

    # NB: plain closures, never `lambda i, p=p:` — PySpark's higher-order
    # functions dispatch on lambda arity, so a defaulted extra parameter
    # would be bound to the array index column.
    def weight_fn(p: int):
        return lambda i: (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"plane{p}:"), i.cast("string"))), 1, 15), 16, 10).cast("long")
            % F.lit(1001)
            - 500
        ).cast("double")

    acc = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.zip_with(_dbl(vec), F.transform(dims, weight_fn(p)), lambda x, h: x * h)
        proj = F.aggregate(w, F.lit(0.0), lambda a, x: a + x)
        acc = acc + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def lsh_bucketed_topk(
    queries: DataFrame, corpus: DataFrame, q_id: str, q_vec: str, c_id: str, c_vec: str,
    k: int = 10, n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: equi-join on the hyperplane bucket, re-rank inside.

    The 10^10-scale path: the corpus is bucketed once (write-time partition
    key), each query probes one bucket — no cross join, shuffle only on the
    8-bit bucket id. Recall is traded for the 2^n_planes fan-in reduction;
    multi-probe (flip one bit) would raise recall at 9x the probes.
    """
    qb = queries.select(
        F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"),
        hyperplane_sign_bucket(F.col(q_vec), n_planes).alias("bucket"),
    )
    cb = corpus.select(
        F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("cv"),
        hyperplane_sign_bucket(F.col(c_vec), n_planes).alias("bucket"),
    )
    j = cb.join(F.broadcast(qb), "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    scored = j.select(
        "query_id", "neighbor_id", cosine_col(F.col("qv"), F.col("cv")).alias("cos_raw")
    )
    top = top_k_per_key(
        scored, ["query_id"], [F.col("cos_raw").desc(), F.col("neighbor_id").asc()], k, rank_name="rank"
    )
    return top.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), F.round("cos_raw", 4).alias("cosine")
    )
