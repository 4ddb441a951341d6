"""connected_components: duplicate-cluster assignment over near-dup pairs.

The keep-one-per-cluster step after pairwise dedup (SURVEY §2 training-data
ladder): pairs (a,b),(b,c) must collapse to ONE cluster — no per-pair filter
can do that. Min-label propagation, O(diameter) rounds of one equi-join +
min-groupBy each; see operators/dedup.py:connected_components.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bravewebcrawler_spark.operators import dedup as DD


def _cc(spark, edges, nodes, algorithm="label", stats=None, max_iters=50):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
    caches: list = []
    out = DD.connected_components(
        e, n, id_col="doc_id", cache_registry=caches,
        algorithm=algorithm, stats=stats, max_iters=max_iters,
    )
    got = {r["node"]: r["comp"] for r in out.collect()}
    for df in caches:
        df.unpersist()
    return got


def test_chain_collapses_to_one_cluster(spark):
    # (1,2),(2,3),(3,4): diameter-3 chain — needs >1 propagation round
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)], [1, 2, 3, 4, 9])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}


def test_singletons_and_disjoint_clusters(spark):
    got = _cc(spark, [(10, 11), (20, 21), (21, 22)], [10, 11, 20, 21, 22, 30, 31])
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 30: 30, 31: 31}


def test_edge_direction_irrelevant(spark):
    # higher id listed first: undirected union must still propagate the min
    got = _cc(spark, [(7, 3), (3, 1)], [1, 3, 7])
    assert got == {1: 1, 3: 1, 7: 1}


def test_star_agrees_with_label_on_clique_plus_chain(spark):
    # clique {1..5}, chain 10-…-16, reversed-order chain, singleton
    edges = (
        [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
        + [(i, i + 1) for i in range(10, 16)]
        + [(25, 24), (24, 23), (23, 22)]
    )
    nodes = list(range(1, 6)) + list(range(10, 17)) + list(range(22, 26)) + [99]
    lab = _cc(spark, edges, nodes, algorithm="label")
    star = _cc(spark, edges, nodes, algorithm="star")
    assert star == lab
    assert star[5] == 1 and star[16] == 10 and star[25] == 22 and star[99] == 99


def test_star_bounds_rounds_on_long_chain(spark):
    # A 256-node path: min-label propagation needs O(diameter)=255 rounds —
    # it would exhaust any sane max_iters (asserted below) long before
    # converging; star contraction closes it in O(log n) rounds. Node ids
    # are bit-reversed so the path is NOT monotone in id order (monotone
    # chains collapse artificially fast under min-propagation).
    n = 256
    perm = [int(format(i, "08b")[::-1], 2) for i in range(n)]  # bit-reverse
    edges = [(perm[i], perm[i + 1]) for i in range(n - 1)]
    stats: dict = {}
    star = _cc(spark, edges, list(range(n)), algorithm="star", stats=stats)
    assert star == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 12, f"star contraction took {stats['rounds']} rounds"
    # the naive loop, capped at the rounds star needed, is still unconverged
    lab_stats: dict = {}
    lab = _cc(spark, edges, list(range(n)), algorithm="label",
              stats=lab_stats, max_iters=stats["rounds"])
    assert lab != star  # diameter-bound: would need ~255 rounds to agree


def test_no_residual_caches_star(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = {info.id() for info in jsc.getRDDStorageInfo()}
    _cc(spark, [(1, 2), (2, 3)], [1, 2, 3, 4], algorithm="star")
    leaked = {info.id() for info in jsc.getRDDStorageInfo()} - before
    assert not leaked, f"residual cached RDDs: {leaked}"


def test_no_residual_caches(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = {info.id() for info in jsc.getRDDStorageInfo()}
    _cc(spark, [(1, 2)], [1, 2, 3])
    leaked = {info.id() for info in jsc.getRDDStorageInfo()} - before
    assert not leaked, f"residual cached RDDs: {leaked}"


def test_cluster_tables_reuse_equals_self_contained(spark):
    # VERDICT r5 #6: passing a precomputed components table into
    # dedup_cluster_tables must yield the identical roster as the
    # self-contained path that recomputes the pairs+CC chain itself.
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again ok"),
        (2, "the quick brown fox jumps over the lazy dog again and again ok"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        (4, "a completely different document about spark query planning"),
        (5, "yet another unrelated text with its own words entirely here"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    comp_a, roster_a = DD.dedup_cluster_tables(corpus, "doc_id", "text")
    a_comp = sorted(tuple(r) for r in comp_a.collect())
    a_roster = sorted(tuple(r) for r in roster_a.collect())
    # reuse path: hand the computed components table back in — the chain
    # must not rerun (components is a plain DataFrame; equality of the
    # derived roster is the contract)
    comp_df = spark.createDataFrame(
        [tuple(r) for r in comp_a.collect()], "node long, comp long"
    )
    _, roster_b = DD.dedup_cluster_tables(
        corpus, "doc_id", "text", components=comp_df
    )
    b_roster = sorted(tuple(r) for r in roster_b.collect())
    assert a_roster == b_roster
    # and the self-contained roster agrees with a from-scratch second run
    comp_c, roster_c = DD.dedup_cluster_tables(corpus, "doc_id", "text")
    assert sorted(tuple(r) for r in comp_c.collect()) == a_comp
    assert sorted(tuple(r) for r in roster_c.collect()) == a_roster
