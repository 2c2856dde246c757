"""Regression pins for round-7 work (r6 VERDICT "Next round" items):

1. Trained-PQ unroll depth covers every stocked fixture (the r5
   _N_UNROLL lesson applied to the NEW training chain — an unroll
   shorter than a fixture's convergence silently yields missing
   subspaces in pqcb → a false correctness failure).
2. The trained-PQ primary oracle is complete (8 subspaces × 64
   codewords) at sf0.1, the deepest-converging stocked fixture.
3. The rerank stage actually delivers: recall@5 ≥ 0.8 at sf0.001
   (the r6 verdict's acceptance bar for the PQ suite; the r6 untrained
   floor was 0.22).
"""

from __future__ import annotations

import pytest


def test_pq_unroll_covers_fixtures():
    from lakehouse_v3_spark.plans import pq_train_sql

    # measured per-subspace convergence maxima: 15 / 10 / 19 iterations
    # at sf0.001 / 0.01 / 0.1 — the unroll must exceed the max with
    # headroom so every subspace has a converged iteration in-chain
    assert pq_train_sql.PQ_UNROLL >= 24


def test_pq_primary_oracle_complete_at_sf01():
    """Runs the REAL primary training-chain oracle at sf0.1 (the
    deepest-converging stocked fixture, 19 iterations) and requires a
    COMPLETE codebook table: 8 subspaces × 64 codewords × 8 dims. A
    too-short unroll shows up here as missing subspaces (the per-s
    tsel join drops them silently)."""
    import duckdb

    from lakehouse_v3_spark.operators.pq import PQ_N_SUB, PQ_TRAIN_K
    from lakehouse_v3_spark.plans import load_all

    qd = load_all()["pq_trained_codebooks"]
    sf = "/root/testdata/sf0.1"
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
        )
        df = con.execute(qd.oracle).fetchdf()
    finally:
        con.close()
    assert len(df) == PQ_N_SUB * PQ_TRAIN_K * 8, (
        f"incomplete codebook table ({len(df)} rows) — "
        "a subspace fell off the unrolled chain"
    )
    assert sorted(df["s"].unique()) == list(range(PQ_N_SUB))


def test_residual_encoding_beats_raw(spark, sf_dir):
    """r6 verdict item #2 acceptance: residual IVF-PQ encoding must
    beat non-residual on the stable metric — mean squared
    reconstruction error over the whole corpus (recall@5 over 10
    queries is too noisy to separate the variants on isotropic
    fixtures). Measured: raw 0.323 → residual 0.302 at sf0.001."""
    from lakehouse_v3_spark.plans import load_all

    rows = load_all()["ivfpq_residual_quantization_audit"].fn(
        spark, sf_dir
    ).collect()
    mse = {r.variant: r.mse for r in rows}
    assert set(mse) == {"raw", "residual"}
    assert mse["residual"] < mse["raw"], (
        f"residual encoding stopped beating raw: {mse}"
    )


def test_pq_rerank_recall_floor(spark, sf_dir):
    """r6 verdict item #1 acceptance: knn_pq_adc_recall_audit's rerank
    recall@5 ≥ 0.8 on the fixture (measured 0.94 / 0.98 / 0.88 at
    sf0.001 / 0.01 / 0.1; the untrained r6 floor was 0.22)."""
    from pyspark.sql import functions as F

    from lakehouse_v3_spark.plans import load_all

    df = load_all()["knn_pq_adc_recall_audit"].fn(spark, sf_dir)
    mean_rr = df.agg(F.avg("recall_rerank")).collect()[0][0]
    assert mean_rr >= 0.8, f"rerank recall@5 fell to {mean_rr:.2f}"
