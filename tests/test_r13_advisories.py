"""Round-13 advisory fixes (ADVICE.md r12): zero-norm masking at any
threshold, the score-strip memory bound, FunnelStages dict-view
consistency, and the interval-scoped pending-fold ingest; plus the
r12 verdict items on the cluster-model trainer (K_MAX cap, explicit
centroid broadcast, id-space-agnostic Lloyd seeding)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F


def _zero_norm_frame(spark):
    return spark.createDataFrame(
        [
            (1, 0, [0.0, 0.0, 0.0, 0.0]),   # zero vector
            (2, 0, [1.0, 0.0, 0.0, 0.0]),
            (3, 0, [1.0, 1e-9, 0.0, 0.0]),  # near-dup of 2
            (4, 0, [-1.0, 0.0, 0.0, 0.0]),  # anti-parallel to 2
        ],
        "doc_id LONG, label INT, embedding ARRAY<FLOAT>",
    )


def test_zero_norm_never_pairs_even_at_nonpositive_threshold(spark):
    """r12 ADVICE #4: the zero-norm clamp made a zero vector's cosine
    exactly 0.0, which PAIRS with everything when threshold <= 0 —
    the SQL path's 0/0 is NULL and never pairs at any threshold. The
    mask must exclude zero-norm rows from the comparison itself."""
    from lakehouse_v3_spark.operators.similarity import near_dup_pairs

    df = _zero_norm_frame(spark)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in near_dup_pairs(
                df, "doc_id", block_col="label", threshold=-1.0
            ).collect()
        }
    # every non-zero pair survives at threshold -1; NOTHING involving
    # the zero vector (id 1) does
    assert pairs == {(2, 3), (2, 4), (3, 4)}


def test_probe_zero_norm_never_pairs_at_nonpositive_threshold(spark):
    from lakehouse_v3_spark.operators.similarity import near_dup_pairs_probe

    df = _zero_norm_frame(spark)
    batch = df.filter(F.col("doc_id").isin(1, 3))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in near_dup_pairs_probe(
                batch, df, "doc_id", block_col="label", threshold=-1.0
            ).collect()
        }
    assert pairs == {(2, 3), (3, 4)}
    assert not any(1 in p for p in pairs)


def test_strip_rows_bounds_score_matrix_cells():
    """r12 ADVICE #5: strip_rows × right_cols ≤ STRIP_CELLS, so the
    float64 score strip stays ~64 MB instead of the 1.07 GB a fixed
    2048-row strip allocates against a cap-sized right chunk."""
    from lakehouse_v3_spark.operators.similarity import (
        BLOCK_ROW_CAP,
        STRIP_CELLS,
        _strip_rows,
    )

    assert _strip_rows(BLOCK_ROW_CAP) * BLOCK_ROW_CAP <= STRIP_CELLS
    assert _strip_rows(BLOCK_ROW_CAP) == STRIP_CELLS // BLOCK_ROW_CAP
    # small right sides keep the legacy 2048-row strip (GEMM efficiency)
    assert _strip_rows(10) == 2048
    assert _strip_rows(0) == 2048    # degenerate: no division by zero
    # never returns 0 rows even for absurd widths
    assert _strip_rows(10 * STRIP_CELLS) == 1


def test_strip_bound_preserves_pair_results(spark):
    """Chunk the strips hard (STRIP_CELLS so small every strip is one
    row) and assert identical pairs/scores to the default config."""
    from lakehouse_v3_spark.operators import similarity as S

    rows = [
        (i, i % 2, [float((i * 7 + d * 3) % 11) for d in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, label INT, embedding ARRAY<FLOAT>"
    )
    want = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in S.near_dup_pairs(
            df, "doc_id", block_col="label", threshold=0.8
        ).collect()
    }
    assert want, "fixture must produce at least one pair"
    got = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in S.near_dup_pairs(
            df, "doc_id", block_col="label", threshold=0.8, strip_cells=1
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


# ---------------------------------------------------------------------------
# r12 verdict #3: id-space-agnostic Lloyd seeding
# ---------------------------------------------------------------------------


def _vec_rows(n, dim=4):
    return [[float((i * 13 + d * 5) % 17) for d in range(dim)] for i in range(n)]


def test_lloyd_capped_trains_on_offset_holey_id_space(spark):
    """The old seed rule (vec_id < k) refused any id space with holes
    or an offset. Rank-based seeding must train, and — because the
    id ORDER is the same — produce bit-identical centroids to the
    dense-id frame over the same vectors."""
    from lakehouse_v3_spark.operators.ivf import lloyd_capped

    vecs = _vec_rows(30)
    dense = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    # offset at 10**6 with irregular gaps; order-preserving
    sparse_ids = [10**6 + 3 * i + (17 if i > 10 else 0) for i in range(30)]
    sparse = spark.createDataFrame(
        list(zip(sparse_ids, vecs)), "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    c_dense, it_dense = lloyd_capped(dense, 3)
    c_sparse, it_sparse = lloyd_capped(sparse, 3)
    assert it_dense == it_sparse
    assert c_dense == c_sparse


def test_lloyd_seeding_raises_when_fewer_vectors_than_k(spark):
    from lakehouse_v3_spark.operators.ivf import lloyd_capped

    df = spark.createDataFrame(
        list(enumerate(_vec_rows(2))), "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    with pytest.raises(RuntimeError, match="needs"):
        lloyd_capped(df, 5)


# ---------------------------------------------------------------------------
# r12 verdict #1c: centroids ship by explicit broadcast, not closure
# ---------------------------------------------------------------------------


def test_assign_cells_ships_centroids_via_broadcast(spark, monkeypatch):
    """assign_cells must put the centroid matrix through
    SparkContext.broadcast (one serialization, torrent-fetched per
    executor) rather than capturing the raw k x dim list in the UDF
    closure (re-serialized into every stage's task binary)."""
    from pyspark import SparkContext

    cents = [[0.0, 0.0], [10.0, 10.0]]
    seen = []
    orig = SparkContext.broadcast

    def spy(self, value):
        seen.append(value)
        return orig(self, value)

    monkeypatch.setattr(SparkContext, "broadcast", spy)
    from lakehouse_v3_spark.operators.ivf import assign_cells

    df = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [9.8, 10.1])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = assign_cells(df, cents, out_col="cell").collect()
    assert cents in seen, "centroid payload never went through broadcast"
    assert {(r["vec_id"], r["cell"]) for r in rows} == {(0, 0), (1, 1)}


def test_probe_cells_expr_ships_centroids_via_broadcast(spark, monkeypatch):
    from pyspark import SparkContext

    cents = [[0.0, 0.0], [10.0, 10.0], [5.0, 5.0]]
    seen = []
    orig = SparkContext.broadcast

    def spy(self, value):
        seen.append(value)
        return orig(self, value)

    monkeypatch.setattr(SparkContext, "broadcast", spy)
    from lakehouse_v3_spark.operators.ivf import probe_cells_expr

    df = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    rows = df.select(
        probe_cells_expr(F.col("embedding"), cents, 2).alias("cells")
    ).collect()
    assert cents in seen
    assert list(rows[0]["cells"]) == [0, 2]


# ---------------------------------------------------------------------------
# r12 ADVICE #3: FunnelStages dict-view consistency for lazy entries
# ---------------------------------------------------------------------------


def test_funnel_stages_views_see_lazy_keys():
    from lakehouse_v3_spark.pipelines.curation import FunnelStages

    forced = []
    fs = FunnelStages(a=1, b=2)
    fs.put_lazy("packed", lambda: forced.append(1) or 99)

    # membership / keys / len / iteration: lazy key visible, NOT forced
    assert "packed" in fs
    assert set(fs.keys()) == {"a", "b", "packed"}
    assert len(fs) == 3
    assert set(iter(fs)) == {"a", "b", "packed"}
    assert not forced

    # get() resolves through the thunk (the r12 trap: returned None)
    assert fs.get("packed") == 99
    assert forced == [1]
    assert fs.get("missing", "d") == "d"

    fs2 = FunnelStages(a=1)
    fs2.put_lazy("packed", lambda: 7)
    # items()/values() include the lazy entry (forcing it)
    assert dict(fs2.items()) == {"a": 1, "packed": 7}
    assert sorted(fs2.values()) == [1, 7]
    # a forced thunk is spent: subsequent views are plain dict entries
    assert len(fs2) == 2 and set(fs2.keys()) == {"a", "packed"}
