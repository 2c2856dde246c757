"""r11 verdict item #1a: the SemDeDup cluster model — budget-capped
Lloyd with corpus-scaled k and empty-cell carry-over — plus the
parallelism pin that retires the label-block weak mark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_cluster_k_scales_with_corpus():
    from lakehouse_v3_spark.pipelines.curation import (
        CLUSTER_TARGET_ROWS, cluster_k,
    )

    assert CLUSTER_TARGET_ROWS == 4096
    assert cluster_k(1) == 1
    assert cluster_k(500) == 1          # driver fixtures
    assert cluster_k(20_000) == 5       # sf1
    assert cluster_k(200_000) == 49     # sf10 — parallelism 49 > 10 labels
    assert cluster_k(200_000) > 10
    # at 100 TB-ish vector counts the block count keeps growing
    assert cluster_k(2_000_000_000) == 488_282


def test_lloyd_capped_converges_early_when_it_can(spark):
    from lakehouse_v3_spark.operators.ivf import lloyd_capped

    # two tight point clouds, seeds are the first 2 vectors
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0]),
            (2, [0.1, 0.0]), (3, [0.0, 0.1]),
            (4, [10.1, 10.0]), (5, [10.0, 10.1])]
    e = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    cents, n_iters = lloyd_capped(e, 2, iters=4)
    assert n_iters <= 4 and len(cents) == 2
    # centroids are the cloud means (rounded to 6 dp)
    assert cents[0] == pytest.approx([0.033333, 0.033333], abs=1e-6)
    assert cents[1] == pytest.approx([10.033333, 10.033333], abs=1e-6)


def test_lloyd_capped_empty_cell_carries_over(spark):
    """A provably-empty cell: seeds 0 and 1 share IDENTICAL vectors, so
    the (dist, cid) tie-break assigns EVERY point to cell 0 — cell 1 is
    empty from iteration 1. lloyd_converged raises here by contract;
    lloyd_capped must carry the stranded centroid over unchanged."""
    from lakehouse_v3_spark.operators.ivf import lloyd_capped

    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]),
            (2, [0.5, 0.0]), (3, [0.0, 0.5])]
    e = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    cents, n_iters = lloyd_capped(e, 2, iters=3)
    # iteration 1: every point ties to cid 0 → cell 1 EMPTY, carried
    # over as [0,0] (lloyd_converged raises right here). Iteration 2:
    # the carried centroid re-attracts the two origin points — a
    # carried cell is a live Voronoi site, not a tombstone — and the
    # solution settles at the honest 2-means optimum.
    assert cents[1] == [0.0, 0.0]
    assert cents[0] == pytest.approx([0.25, 0.25], abs=1e-6)
    assert n_iters == 3


def test_lloyd_capped_stops_at_cap(spark):
    from lakehouse_v3_spark.operators.ivf import lloyd_capped

    # impossible tolerance → always runs exactly `iters` iterations
    rows = [(i, [float(i), float(i % 3)]) for i in range(20)]
    e = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    cents, n_iters = lloyd_capped(e, 3, iters=2, tol_micro=-1)
    assert n_iters == 2 and len(cents) == 3
