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


def _cc(spark, edges, nodes):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
    caches: list = []
    out = DD.connected_components(e, n, id_col="doc_id", cache_registry=caches)
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


def test_no_residual_caches(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = {info.id() for info in jsc.getRDDStorageInfo()}
    _cc(spark, [(1, 2)], [1, 2, 3])
    leaked = {info.id() for info in jsc.getRDDStorageInfo()} - before
    assert not leaked, f"residual cached RDDs: {leaked}"
