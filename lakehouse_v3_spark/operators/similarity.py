"""Embedding similarity search: brute-force cosine top-k (baseline) and
coarse-partition (IVF-style) restricted search (scale path).

Vectors are ``array<float>`` columns. All arithmetic is element-wise
JVM higher-order functions — cast to double FIRST, then a left-fold sum
in index order, so the result is bit-identical to the DuckDB oracle's
list_reduce (no UDFs, no reliance on engine-internal dot products).

Scale notes (100 TB / billions of vectors):
  - brute force is a broadcast of the (small) query set against the
    corpus — one scan, no shuffle, top-k per query via window;
  - the IVF variant adds a coarse cell equality to the join condition,
    cutting the scanned corpus to matching cells only (cells from
    k-means offline or any hash/label partition; partition pruning
    applies when the corpus is written partitioned by cell);
  - at extreme scale swap the window top-k for per-partition heaps
    (mapInPandas) — semantics unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_product(a, b):
    """Σ a[i]·b[i] as double, summed in index order (left fold)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a):
    return F.sqrt(dot_product(a, a))


def cosine(a, b):
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    cell_col: str | None = None,
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Top-k corpus neighbours per query by cosine. ``cell_col`` adds a
    coarse-cell equality (IVF-style restriction). Returns
    (query_id, corpus_id, cosine_sim, rank).

    Without ``cell_col`` the plan is corpus ⨯ broadcast(queries) — every
    corpus row is scored against EVERY query. That is the intended
    baseline for a small query set, but a large query side would turn it
    into an unbounded cartesian product at 100 TB, so the query side is
    counted up front and must stay ≤ ``max_query_rows`` (raise it
    explicitly — or supply ``cell_col`` — to opt in to more)."""
    if cell_col is None:
        n_queries = queries.count()
        if n_queries > max_query_rows:
            raise ValueError(
                f"knn_bruteforce without cell_col scores every corpus row "
                f"against every query ({n_queries} queries > "
                f"max_query_rows={max_query_rows}); pass cell_col for a "
                "restricted join or raise max_query_rows explicitly"
            )
    q = queries.select(
        F.col(query_id).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
        *([F.col(cell_col).alias("_qcell")] if cell_col else []),
    )
    c = corpus.select(
        F.col(corpus_id).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        # norm once per vector BELOW the join (n evaluations, not n·k):
        # the expression is identical to the one cosine() would emit per
        # pair, so the quotient stays bit-identical to the oracle's
        l2_norm(F.col(vec_col)).alias("_cnorm"),
        *([F.col(cell_col).alias("_ccell")] if cell_col else []),
    )
    q = q.withColumn("_qnorm", l2_norm(F.col("_qvec")))
    if cell_col:
        joined = c.join(F.broadcast(q), F.col("_qcell") == F.col("_ccell"))
    else:
        joined = c.crossJoin(F.broadcast(q))
    scored = joined.select(
        F.col("_qid"),
        F.col("_cid"),
        (
            dot_product(F.col("_qvec"), F.col("_cvec"))
            / (F.col("_qnorm") * F.col("_cnorm"))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("_qid").orderBy(F.col("cosine_sim").desc(), F.col("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias("neighbor_id"),
            "cosine_sim",
            "rank",
        )
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.4,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b) above a threshold,
    blocked on ``block_col`` (label/LSH bucket) to bound the pair
    fan-out — the O(n²)→Σ block² reduction.

    Without ``block_col`` the plan is an unrestricted self-crossJoin —
    O(n²) pairs, a non-starter at 100 TB — so it is refused unless the
    caller opts in with ``allow_all_pairs=True`` (mirrors
    ``knn_bruteforce``'s ``max_query_rows`` guard)."""
    if block_col is None and not allow_all_pairs:
        raise ValueError(
            "near_dup_pairs without block_col is an unrestricted O(n^2) "
            "self-crossJoin; pass block_col (label/LSH bucket) to bound "
            "the pair fan-out, or allow_all_pairs=True to opt in "
            "explicitly for a small input"
        )
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        # norm once per vector (n), not once per pair (Σ block²); the
        # expression matches cosine()'s exactly so results stay
        # bit-identical to the per-pair formulation / the oracle
        l2_norm(F.col(vec_col)).alias("_na"),
        *([F.col(block_col).alias("_block")] if block_col else []),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        l2_norm(F.col(vec_col)).alias("_nb"),
        *([F.col(block_col).alias("_block")] if block_col else []),
    )
    joined = a.join(b, on=(["_block"] if block_col else []) or None, how="inner") if block_col else a.crossJoin(b)
    pairs = joined.filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            (
                dot_product(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb"))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
