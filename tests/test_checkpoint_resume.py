"""Resume-equivalence property (SURVEY.md §5.4, north rule T3): a crawl
killed after round k and resumed equals the uninterrupted crawl bit-for-bit."""

from __future__ import annotations

from bravewebcrawler_spark.plans import checkpoint as ckpt
from bravewebcrawler_spark.plans.crawl import crawl, read_outputs
from bravewebcrawler_spark.plans.policy import CrawlPolicy
from bravewebcrawler_spark.sources.synthweb import SynthWeb

POLICY = CrawlPolicy(capacity=4.0, rate=2.0, max_urls_per_round=50, max_rounds=3, max_depth=5)
WEB = SynthWeb(seed=99, n_hosts=15, pages_per_host=10, hot_hosts=2)


def _log(spark, state_dir):
    out = read_outputs(spark, state_dir)
    return sorted(
        (r["round"], r["seq"], r["url_canon"], r["status"], r["error"])
        for r in out["crawl_log"].collect()
    )


def test_kill_resume_equals_uninterrupted(spark, tmp_path_factory):
    seeds = spark.createDataFrame(WEB.seed_urls(8), "seed_id string, url string")
    full_dir = str(tmp_path_factory.mktemp("full"))
    crawl(spark, WEB, seeds, POLICY, full_dir)
    full = _log(spark, full_dir)

    kill_dir = str(tmp_path_factory.mktemp("killed"))
    crawl(spark, WEB, seeds, POLICY, kill_dir, stop_after_round=0)
    assert ckpt.latest_round(kill_dir) == 0  # committed exactly one round
    crawl(spark, WEB, seeds, POLICY, kill_dir, resume=True)
    assert _log(spark, kill_dir) == full


def test_frontier_size_arithmetic_matches_reconstruction(spark, tmp_path_factory):
    """Non-compaction rounds derive frontier_size arithmetically
    (prev - selected - touched + |delta|) instead of scanning the frontier;
    the number must equal the actual reconstructed frontier's cardinality."""
    seeds = spark.createDataFrame(WEB.seed_urls(8), "seed_id string, url string")
    d = str(tmp_path_factory.mktemp("fsize"))
    crawl(spark, WEB, seeds, POLICY, d)
    last = ckpt.latest_round(d)
    assert last is not None and last >= 1  # at least one delta round
    for r in range(last + 1):
        m = ckpt.load_metrics(d, r)
        base = ckpt.load_base_round(d, r)
        actual = ckpt.load_frontier(spark, d, base, r).count()
        assert m["frontier_size"] == actual, (r, m["frontier_size"], actual)


def test_manifest_is_the_commit_point(spark, tmp_path_factory):
    """A round directory without a manifest is invisible to resume."""
    import os

    seeds = spark.createDataFrame(WEB.seed_urls(8), "seed_id string, url string")
    d = str(tmp_path_factory.mktemp("manifesto"))
    crawl(spark, WEB, seeds, POLICY, d, stop_after_round=1)
    assert ckpt.latest_round(d) == 1
    # simulate a kill between write_tables and publish_manifest of round 2:
    # the directory may exist, but resume must restart from round 1's state
    os.makedirs(os.path.join(d, "round-000002", "frontier"), exist_ok=True)
    assert ckpt.latest_round(d) == 1
    crawl(spark, WEB, seeds, POLICY, d, resume=True)
    full_dir = str(tmp_path_factory.mktemp("full2"))
    crawl(spark, WEB, seeds, POLICY, full_dir)
    assert _log(spark, d) == _log(spark, full_dir)
