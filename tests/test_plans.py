"""Physical-plan guards: the optimizations the engine relies on must stay in
the plan (catching perf regressions that correctness tests can't see)."""

from __future__ import annotations

import __spark_entry__ as E
from pyspark.sql import functions as F

from bravewebcrawler_spark.plans.policy import CrawlPolicy
from bravewebcrawler_spark.plans.round import FRONTIER_SCHEMA, HOST_STATE_SCHEMA, dequeue


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _plan(E.q1_pricing_summary(spark, sf_dir))
    scan = next(line for line in plan.splitlines() if "FileScan parquet" in line)
    # predicate reaches the scan
    assert "l_shipdate" in scan and "DataFilters" in scan
    # column pruning: untouched columns are not read
    assert "l_orderkey" not in scan and "l_partkey" not in scan


def test_q5_broadcasts_all_dimensions(spark, sf_dir):
    plan = _plan(E.q5_region_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4  # region, nation, customer, orders
    assert "SortMergeJoin" not in plan


def test_dequeue_no_global_window_for_large_caps(spark):
    frontier = spark.createDataFrame([], FRONTIER_SCHEMA)
    hs = spark.createDataFrame([], HOST_STATE_SCHEMA)
    # small cap -> TakeOrderedAndProject (distributed top-K, not a sort-all)
    small = dequeue(frontier, hs, CrawlPolicy(max_urls_per_round=200), refill=True)
    assert "TakeOrderedAndProject" in _plan(small)
    # large cap -> range-partitioned rank, no driver-merge TakeOrdered
    big = dequeue(frontier, hs, CrawlPolicy(max_urls_per_round=100_000), refill=True)
    pb = _plan(big)
    assert "TakeOrderedAndProject" not in pb
    assert "rangepartitioning" in pb.lower()


def test_anti_join_stays_hash_based(spark, sf_dir):
    plan = _plan(E.j2_anti_join(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan  # never a theta anti-join


def test_multiprobe_ships_probes_not_corpus(spark, sf_dir):
    plan = _plan(E.ann_lsh_multiprobe(spark, sf_dir))
    # round-6 shape (_lsh_probe_topk): the tiny query/probe side ships to
    # every task inside the mapInArrow closure; the corpus is scanned in
    # place and candidates are gathered per batch — a shuffled or
    # sort-merge-joined corpus here would be the 10^10-vector scale-killer,
    # and so would any per-pair join materialization
    assert "MapInArrow" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # result equality with the former bucket equi-join is pinned in
    # tests/test_arrow_twins.py::test_lsh_probe_topk_equals_bucket_join_form


def test_search_api_fetch_is_arrow_batched(spark):
    # the HTTP sources must stay on the Arrow batch path (mapInPandas), never
    # a row-at-a-time PythonUDF
    from bravewebcrawler_spark.sources.search_api import search_candidates

    df = spark.createDataFrame([("s0", "Acme AG")], "seed_id string, company string")
    plan = _plan(search_candidates(df, "brave", "k", base_url="http://127.0.0.1:9/x"))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
