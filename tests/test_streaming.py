"""Structured Streaming parity: the streaming windowed aggregation produces
exactly the batch twin's result (which itself is DuckDB-oracled)."""

from __future__ import annotations

import os

from bravewebcrawler_spark.streaming.events import run_stream_to_memory, window_agg_batch


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    # the streaming file source consumes a DIRECTORY of files
    os.symlink(f"{sf_dir}/events.parquet", tmp_path / "part-0.parquet")
    path = str(tmp_path)
    batch = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in window_agg_batch(spark.read.parquet(path)).collect()
    }
    stream = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in run_stream_to_memory(spark, path, name="t_stream_parity").collect()
    }
    assert batch == stream
    assert len(batch) > 10
