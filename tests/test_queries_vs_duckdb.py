"""Mini driver-gate: every __spark_entry__ query vs its DuckDB oracle at
sf0.001 (the full-size rehearsal is tools/check_queries.py at sf0.01)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tools.check_queries import compare, duck_con  # noqa: E402


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, sf_dir, con, name):
    fn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = fn(spark, sf_dir)
    if name not in oracles:
        assert df.count() >= 0  # rows-only check (driver does the same)
        return
    problems = compare(name, df, oracles[name], con)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "event_id", "event_type", "value", "rn"}
    # top-3 per user, rank within bounds
    assert all(1 <= r["rn"] <= 3 for r in rows)


def test_no_residual_caches_after_cache_managed_queries(spark, sf_dir):
    """Deterministic cache lifecycle (VERDICT r2 #6): the queries that persist
    intermediates (lsh_refined_pairs' cand/sh, corpus_prep's uniq) must leave
    the storage tab exactly as they found it — no ContextCleaner reliance."""
    import __spark_entry__ as E

    jsc = spark.sparkContext._jsc.sc()

    def storage_ids():
        return {info.id() for info in jsc.getRDDStorageInfo()}

    before = storage_ids()
    for name in ("dedup_lsh_refined", "corpus_prep"):
        E.queries()[name](spark, sf_dir).count()
    leaked = storage_ids() - before
    assert not leaked, f"residual cached RDDs: {leaked}"


def test_materialize_and_release_size_guard(spark):
    """Oversized results must stage through parquet, never a driver collect
    (VERDICT r3 #6): same rows back, caches released either way."""
    from pyspark import StorageLevel

    import __spark_entry__ as E

    jsc = spark.sparkContext._jsc.sc()
    before = {info.id() for info in jsc.getRDDStorageInfo()}
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    cache = df.persist(StorageLevel.MEMORY_AND_DISK)
    cache.count()
    out = E._materialize_and_release(df, [cache], row_cap=10)  # 100 > cap
    assert out.count() == 100
    assert {r["id"]: r["v"] for r in out.collect()} == {i: 2 * i for i in range(100)}
    assert "Scan parquet" in out._jdf.queryExecution().executedPlan().toString()
    leaked = {info.id() for info in jsc.getRDDStorageInfo()} - before
    assert not leaked, f"residual cached RDDs: {leaked}"
    # small result: plain local-relation path, no parquet scan
    small = spark.range(5).selectExpr("id")
    out2 = E._materialize_and_release(small, [], row_cap=10)
    assert out2.count() == 5
    assert "Scan parquet" not in out2._jdf.queryExecution().executedPlan().toString()
