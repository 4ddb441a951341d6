"""Round-6 Arrow-batched passes vs their column-expression twins.

Every optimization that moved work across the Python boundary claims
bit-identical values, not just statistical agreement; these tests pin that
claim row-for-row on the sf0.01 documents plus crafted edge cases (empty
text, shorter-than-k docs, newlines, '#'/'...' symbols, unicode).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bravewebcrawler_spark.functions import text as TX
from bravewebcrawler_spark.operators import dedup as DD

SF_DIR = "/root/testdata/sf0.01"

EDGE_DOCS = [
    (1, ""),
    (2, "one"),
    (3, "one two"),
    (4, "a b c a b c a b c"),
    (5, "line one\nline one\nline two\n\n"),
    (6, "the and of to a in is ### ... ...... x"),
    (7, "Grüße zürich łódź 北京 the the"),
    (8, "  double  spaces   here the  "),
    (9, "der die das und the the the le la les"),
]


def _docs(spark):
    real = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    edge = spark.createDataFrame(
        [(100000 + i, t) for i, t in EDGE_DOCS], "doc_id long, text string"
    )
    return real.unionByName(edge)


def test_shingle_hash_arrays_equals_hashed_shingles(spark):
    docs = _docs(spark)
    rows = DD.hashed_shingles(docs, "doc_id", "text", 3).collect()
    want: dict[int, set[int]] = {}
    for r in rows:
        want.setdefault(r["doc"], set()).add(r["H"])
    got = {
        r["doc"]: set(r["hs"])
        for r in DD.shingle_hash_arrays(docs, "doc_id", "text", 3).collect()
    }
    # row-per-shingle form emits nothing for shingle-less docs; the array
    # form emits an empty cell — same information
    got_nonempty = {d: hs for d, hs in got.items() if hs}
    assert got_nonempty == want
    assert set(got) == {r["doc_id"] for r in docs.collect()}


def test_exploded_shingle_strings_equals_column_form(spark):
    docs = _docs(spark)
    col_form = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(F.array_distinct(DD.shingles_col(F.col("text"), 5))).alias("sh"),
    ).withColumn("shh", TX.portable_hash64(F.col("sh")))
    want = {(r["doc"], r["sh"], r["shh"]) for r in col_form.collect()}
    got = {
        (r["doc"], r["sh"], r["shh"])
        for r in DD.exploded_shingle_strings(docs, "doc_id", "text", 5).collect()
    }
    assert got == want


def test_text_metrics_arrow_equals_column_form(spark):
    docs = _docs(spark)
    col_form = docs.select(
        "doc_id",
        TX.lang_id_col(F.col("text")).alias("lang_guess"),
        TX.lang_score_col(F.col("text"), "en").cast("long").alias("s_en"),
        TX.lang_score_col(F.col("text"), "de").cast("long").alias("s_de"),
        TX.lang_score_col(F.col("text"), "fr").cast("long").alias("s_fr"),
        TX.quality_score_col(F.col("text")).alias("quality"),
        TX.ws_token_count_col(F.col("text")).cast("long").alias("ws_tokens"),
        TX.bpe_ish_token_count_col(F.col("text")).cast("long").alias("bpe_tokens"),
        TX.stopword_ratio_col(F.col("text")).alias("stopword_ratio"),
        TX.dup_line_fraction_col(F.col("text")).alias("dup_line_frac"),
        TX.dup_ngram_fraction_col(F.col("text"), 2).alias("dup_2gram_frac"),
        TX.symbol_word_ratio_col(F.col("text")).alias("symbol_word_ratio"),
    )
    want = {r["doc_id"]: r for r in col_form.collect()}
    got = {
        r["doc_id"]: r
        for r in TX.text_metrics_arrow(docs, "doc_id", "text").collect()
    }
    assert set(got) == set(want)
    for d, g in got.items():
        w = want[d]
        for f in w.asDict():
            # exact equality, doubles included — the battery's contract
            assert g[f] == w[f], (d, f, g[f], w[f])


def test_lang_bpe_quality_arrow_equals_column_form(spark):
    docs = _docs(spark).withColumn("quality", TX.quality_score_col(F.col("text")))
    want = sorted(
        (r["lang_guess"], r["bpe"], r["quality"])
        for r in docs.select(
            TX.lang_id_col(F.col("text")).alias("lang_guess"),
            TX.bpe_ish_token_count_col(F.col("text")).cast("long").alias("bpe"),
            "quality",
        ).collect()
    )
    got = sorted(
        (r["lang_guess"], r["bpe"], r["quality"])
        for r in TX.lang_bpe_quality_arrow(docs, "text", "quality").collect()
    )
    assert got == want


def test_lsh_probe_topk_equals_bucket_join_form(spark):
    """The NumPy candidate-gather ANN engine vs the former bucket equi-join,
    single- and multi-probe, on the sf0.01 embeddings."""
    from bravewebcrawler_spark.operators import similarity as SIM
    from bravewebcrawler_spark.operators.ranking import top_k_per_key

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 40)

    def join_form(multiprobe: bool):
        qb = SIM._normed(queries, "vec_id", "embedding", "query_id", "qv", "qn").withColumn(
            "bucket0", SIM.hyperplane_sign_bucket(F.col("qv"), 8)
        )
        if multiprobe:
            probes = qb.select(
                "query_id", "qv", "qn",
                F.explode(
                    F.array(
                        F.col("bucket0"),
                        *[F.col("bucket0").bitwiseXOR(F.lit(1 << p)) for p in range(8)],
                    )
                ).alias("bucket"),
            )
        else:
            probes = qb.withColumnRenamed("bucket0", "bucket")
        cb = SIM._normed(emb, "vec_id", "embedding", "neighbor_id", "cv", "cn").withColumn(
            "bucket", SIM.hyperplane_sign_bucket(F.col("cv"), 8)
        )
        j = cb.join(F.broadcast(probes), "bucket").where(F.col("query_id") != F.col("neighbor_id"))
        scored = j.select(
            "query_id", "neighbor_id",
            (SIM._dot_raw(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos_raw"),
        )
        top = top_k_per_key(
            scored, ["query_id"], [F.col("cos_raw").desc(), F.col("neighbor_id").asc()], 10,
            rank_name="rank",
        )
        return top.select(
            "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
            (F.round("cos_raw", 4) + F.lit(0.0)).alias("cosine"),
        )

    for multiprobe, fn in (
        (False, SIM.lsh_bucketed_topk),
        (True, SIM.multiprobe_lsh_topk),
    ):
        want = sorted(map(tuple, join_form(multiprobe).collect()))
        got = sorted(
            map(
                tuple,
                fn(queries, emb, "vec_id", "embedding", "vec_id", "embedding", k=10, n_planes=8).collect(),
            )
        )
        assert got == want, f"multiprobe={multiprobe}"


def test_cc_empty_edge_list(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(x,) for x in (5, 7, 9)], "doc_id long")
    caches: list = []
    out = DD.connected_components(edges, nodes, id_col="doc_id", cache_registry=caches)
    got = {r["node"]: r["comp"] for r in out.collect()}
    for c in caches:
        c.unpersist()
    assert got == {5: 5, 7: 7, 9: 9}
