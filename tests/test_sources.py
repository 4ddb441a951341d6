"""S1/S2 seed sources: newest-CSV discovery + utf-8-sig header read, and the
end-to-end seed ingest with dead-letter validation (P7/K3)."""

from __future__ import annotations

import os
import time

from bravewebcrawler_spark.plans.crawl import validate_seeds
from bravewebcrawler_spark.sources.tables import load_seeds, newest_csv


def test_newest_csv_wins(tmp_path):
    old = tmp_path / "a.csv"
    new = tmp_path / "b.csv"
    old.write_text("seed_id,url\ns1,http://x.example.ch/\n")
    time.sleep(0.05)
    new.write_text("seed_id,url\ns2,http://y.example.ch/\n")
    os.utime(old, (time.time() - 100, time.time() - 100))
    assert newest_csv(str(tmp_path)).endswith("b.csv")


def test_utf8_sig_header_and_dead_letters(spark, tmp_path):
    p = tmp_path / "seeds.csv"
    p.write_bytes("﻿seed_id,url\ns1,http://x.example.ch/\ns2,\n".encode("utf-8"))
    df = load_seeds(spark, str(tmp_path))
    assert df.columns == ["seed_id", "url"]  # BOM stripped from header
    valid, dead = validate_seeds(df)
    assert [r["seed_id"] for r in valid.collect()] == ["s1"]
    dl = dead.collect()
    assert len(dl) == 1 and dl[0]["status"] in ("EMPTY_URL_IN_INPUT", "INVALID_INPUT_ROW_STRUCTURE")


def test_robots_df_matches_python_loop_and_stays_distributed(spark):
    """The robots dim (J3 broadcast side) is built from spark.range + column
    exprs — parity with SynthWeb.robots_disallow for every host, including a
    config whose host ids exceed the %03d pad width and a non-default seed,
    and NO driver-side row materialization (the plan reads from Range, not a
    LocalTableScan of a parallelized list)."""
    from bravewebcrawler_spark.plans.round import robots_df
    from bravewebcrawler_spark.sources.synthweb import SynthWeb

    for web in (SynthWeb(), SynthWeb(seed=7, n_hosts=1500)):
        got = {r["host"]: list(r["disallow_prefixes"]) for r in robots_df(spark, web).collect()}
        assert len(got) == web.n_hosts
        for i in range(web.n_hosts):
            h = web.host(i)
            assert got[h] == web.robots_disallow(h), (web.seed, h)
    plan = robots_df(spark, SynthWeb())._jdf.queryExecution().executedPlan().toString()
    assert "Range" in plan and "LocalTableScan" not in plan and "Scan ExistingRDD" not in plan
