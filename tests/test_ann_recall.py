"""Pinned ANN recall bounds (VERDICT r4 #6): recall@10 and lift-vs-random-
scan for lsh / multiprobe / ivf at the bench scale, asserted so a recall
regression fails CI. The published table is BENCH/RECALL.md
(tools/ann_recall.py renders it from the same computation used here).

Bounds are measured-minus-margin on the fixed sf0.1 corpus (2000 near-
uniform 64-d vectors, 300 queries — deterministic planes and codebook, so
the values are exactly reproducible; the margin only absorbs deliberate
algorithm changes). Absolute recall is intrinsically low on uniform
high-d data at small scan fractions — the lift bound is the part that
says the bucketing actually concentrates true neighbors.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ann_recall import compute_recall  # noqa: E402

_BENCH_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def recall(spark):
    return compute_recall(spark, _BENCH_SF_DIR, n_queries=300)


def test_recall_floors(recall):
    m = recall["methods"]
    # measured (r5): lsh 0.020, multiprobe 0.125, ivf 0.512 / 0.547
    assert m["lsh"]["recall_at_k"] >= 0.015
    assert m["multiprobe"]["recall_at_k"] >= 0.10
    assert m["ivf_untrained"]["recall_at_k"] >= 0.45
    assert m["ivf_learned"]["recall_at_k"] >= 0.48


def test_recall_ordering(recall):
    m = recall["methods"]
    assert m["multiprobe"]["recall_at_k"] > m["lsh"]["recall_at_k"]
    assert m["ivf_learned"]["recall_at_k"] >= m["ivf_untrained"]["recall_at_k"]


def test_lift_vs_random_scan(recall):
    """Every method must beat a random scan of the same candidate budget —
    measured lifts (r5): lsh 4.38, multiprobe 3.21, ivf 2.05 / 2.19."""
    m = recall["methods"]
    assert m["lsh"]["lift_vs_random_scan"] >= 3.0
    assert m["multiprobe"]["lift_vs_random_scan"] >= 2.5
    assert m["ivf_untrained"]["lift_vs_random_scan"] >= 1.7
    assert m["ivf_learned"]["lift_vs_random_scan"] >= 1.8


def test_scan_fractions_are_sublinear(recall):
    """The point of ANN: nobody may quietly scan the whole corpus."""
    for name, m in recall["methods"].items():
        assert m["scan_fraction"] < 0.5, (name, m)
