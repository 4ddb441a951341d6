"""Canonicalization: cross-impl equality, idempotence, portable hash parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from bravewebcrawler_spark.functions.canon import (
    canonicalize_url_col,
    canonicalize_url_py,
    host_of_col,
    host_of_py,
    is_blacklisted_py,
    url_hash_col,
    url_hash_py,
)

MESSY = [
    "http://Host001.Example.CH/page/3",
    "HTTP://HOST001.EXAMPLE.CH/page/3/",
    "http://host001.example.ch:80/page/3#frag",
    "https://host002.example.com:443/a//",
    "https://host002.example.com:8443/a",
    "host003.example.ch/page/7",  # schemeless
    "http://h.example/x?b=2&a=1&c=3",
    "http://h.example/x?a=1&b=2&c=3",
    "http://h.example/",
    "http://h.example",
    "  http://pad.example/p  ",
    # adversarial inputs for the one-pass '#'-delimited extraction: the
    # delimiter itself, fragments, multi-'#', control chars, degenerate URLs
    "",
    "   ",
    "#",
    "a#b",
    "http://h.ch/p#frag",
    "http://h.ch/p/?a=1#x#y",
    # fragment followed by a line terminator: Java '$' matches BEFORE a final
    # '\n' and '.' can't consume it, so '(?:#.*)?$' left the terminator
    # unreplaced and it leaked into the query split element (ADVICE r2).
    # '(?:#[\s\S]*)?$' consumes it identically in Java and Python.
    "http://h.ch/p#f\n",
    "http://h.ch/p?a=1#f\r\n",
    "http://h.ch/p?b=2&a=1#frag\nmore",
    "http://h.ch:80/q?b=2&a=1#f",
    "://weird",
    "a b://x",
    "\x01weird\x01",
    "http://h.ch/\x01?\x01=2&a=1",
    "host:999/p",
    "?onlyquery",
    "#onlyfrag",
    "http://h.ch//",
    "http://h.ch/p///",
    "s3+x.y://bucket/k",
    "1http://h/p",
    "ftp://x.y:21/z",
    "http://h.ch/p?",
]


def test_python_canon_idempotent_and_expected():
    assert canonicalize_url_py("http://Host001.Example.CH/page/3") == "http://host001.example.ch/page/3"
    assert canonicalize_url_py("HTTP://HOST001.EXAMPLE.CH/page/3/") == "http://host001.example.ch/page/3"
    assert canonicalize_url_py("http://host001.example.ch:80/page/3#frag") == "http://host001.example.ch/page/3"
    assert canonicalize_url_py("https://host002.example.com:8443/a") == "https://host002.example.com:8443/a"
    assert canonicalize_url_py("host003.example.ch/page/7") == "http://host003.example.ch/page/7"
    assert canonicalize_url_py("http://h.example/x?b=2&a=1") == "http://h.example/x?a=1&b=2"
    assert canonicalize_url_py("http://h.example") == "http://h.example/"
    for u in MESSY:
        c = canonicalize_url_py(u)
        assert canonicalize_url_py(c) == c, f"not idempotent: {u} -> {c}"


def test_spark_canon_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in MESSY], "url string")
    got = df.select(
        "url",
        canonicalize_url_col(F.col("url")).alias("canon"),
        host_of_col(F.col("url")).alias("host"),
    ).collect()
    for row in got:
        assert row["canon"] == canonicalize_url_py(row["url"]), row["url"]
        assert row["host"] == host_of_py(row["url"]), row["url"]


def test_url_hash_parity_spark_python_duckdb(spark):
    urls = [canonicalize_url_py(u) for u in MESSY]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = {r["u"]: r["h"] for r in df.select("u", url_hash_col(F.col("u")).alias("h")).collect()}
    for u in urls:
        expect = url_hash_py(u)
        assert got[u] == expect, u
        duck = duckdb.sql(
            f"select cast(('0x' || substr(md5('{u}'), 1, 15)) as bigint)"
        ).fetchone()[0]
        assert duck == expect, u


def test_blacklist_substring_semantics():
    assert is_blacklisted_py("ads.example")
    assert is_blacklisted_py("sub.ads.example")
    assert is_blacklisted_py("ads.example.ch")  # substring-of-host semantics
    assert not is_blacklisted_py("clean.example.ch")
