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


def dot_product_unrolled(a, b, dim: int):
    """Same sum as :func:`dot_product` — double products, left-associated
    adds seeded with 0.0, so bit-identical to the fold (and DuckDB's
    list_reduce) — but emitted as a flat ``dim``-term arithmetic
    expression instead of zip_with+aggregate. Higher-order functions are
    interpreted per element and allocate an intermediate array per row
    (~230 µs per 64-dim pair measured); the flat expression stays in
    whole-stage codegen (~2 µs). Use on the pair-join hot path where the
    vector width is known at plan time; rows with fewer than ``dim``
    elements yield NULL (the fold yields NULL on null elements too)."""
    total = F.lit(0.0)
    for i in range(dim):
        total = total + a[i].cast("double") * b[i].cast("double")
    return total


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
    salt_parts: int | None = None,
    dim: int | None = None,
    strategy: str = "gemm",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b) above a threshold,
    blocked on ``block_col`` (label/LSH bucket) to bound the pair
    fan-out — the O(n²)→Σ block² reduction.

    Without ``block_col`` the plan scores ALL pairs — O(n²), a
    non-starter at 100 TB — so it is refused unless the caller opts in
    with ``allow_all_pairs=True`` (mirrors ``knn_bruteforce``'s
    ``max_query_rows`` guard).

    ``strategy="gemm"`` (default): per-block Arrow batches → a chunked
    ``V @ V.T`` in numpy. Blocked dense pairwise similarity IS a matrix
    multiply; expressing it row-at-a-time in SQL expressions costs
    ~50-200 µs per pair (measured: 64-dim pair join at 20M pairs never
    finished inside 10 min on 32 cores), while BLAS does the same block
    in ~0.4 s single-threaded. This is the documented Pandas-escape-
    hatch case: a kernel the built-in operators genuinely can't express
    efficiently. One task per block; the score matrix is built in
    ≤2048-row chunks so memory stays bounded for large blocks (block
    sizing itself is the LSH-bucket/band throttle). Cosines are float64
    with numpy's summation order — equal to the SQL fold within ulps
    (tolerance-checked vs the oracle, and threshold flips would need a
    cosine within 1e-12 of the threshold).

    ``strategy="sql"``: the all-JVM expression path (bit-identical,
    left-fold summation). The blocked self-join is SALTED: side A gets
    ``hash(id) % S``, side B is replicated across all S salts, and the
    join key is (block, salt) with an explicit fixed-width repartition.
    Without this the join's parallelism is capped at the number of
    distinct blocks — and worse, AQE coalesces the shuffle by BYTES, so
    this compute-bound join over a few MB of vectors collapses to a
    handful of tasks (observed at sf1: 10 label blocks → 4 tasks, one
    straggler). ``dim`` (vector width known at plan time) unrolls the
    pair dot-product into a flat codegen expression instead of
    interpreted zip_with/aggregate lambdas. Use when bit-exactness
    against another engine matters more than throughput."""
    if block_col is None and not allow_all_pairs:
        raise ValueError(
            "near_dup_pairs without block_col is an unrestricted O(n^2) "
            "self-crossJoin; pass block_col (label/LSH bucket) to bound "
            "the pair fan-out, or allow_all_pairs=True to opt in "
            "explicitly for a small input"
        )
    if strategy == "gemm":
        return _near_dup_pairs_gemm(df, id_col, vec_col, block_col, threshold)
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
    if block_col:
        sc = df.sparkSession.sparkContext
        n_salt = salt_parts or max(1, sc.defaultParallelism)
        a = a.withColumn("_salt", F.pmod(F.hash(F.col("id_a")), F.lit(n_salt)))
        b = b.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
        n_parts = max(sc.defaultParallelism, n_salt)
        a = a.repartition(n_parts, "_block", "_salt")
        b = b.repartition(n_parts, "_block", "_salt")
        joined = a.join(b, on=["_block", "_salt"], how="inner")
    else:
        joined = a.crossJoin(b)
    pairs = joined.filter(F.col("id_a") < F.col("id_b"))
    # pair-dot is the Σ block² hot path: with a known vector width, emit
    # the flat codegen form (bit-identical sum order, ~100× faster)
    if dim is not None:
        pair_dot = dot_product_unrolled(F.col("_va"), F.col("_vb"), dim)
    else:
        pair_dot = dot_product(F.col("_va"), F.col("_vb"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            (pair_dot / (F.col("_na") * F.col("_nb"))).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _near_dup_pairs_gemm(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str | None,
    threshold: float,
) -> DataFrame:
    """Per-block pairwise cosine via chunked numpy GEMM (see
    :func:`near_dup_pairs`). One Arrow batch per block crosses the
    Python boundary (ids + vectors only); the O(block²) score matrix
    never exceeds 2048×|block| rows at a time."""
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )
    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        (F.col(block_col) if block_col else F.lit(0)).alias("_block"),
    )
    thr = float(threshold)

    def block_pairs(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["_id"].to_numpy()
        V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        # zero-norm guard (r11 ADVICE): a zero vector would make the
        # quotient 0/0 = NaN — silently unpairable AND a RuntimeWarning
        # per chunk on executors. Clamping the norm to tiny gives the
        # zero vector cosine 0.0 < threshold: never pairs, exactly the
        # SQL path's behavior (0/0 is NULL there, which fails >= thr).
        norms = np.maximum(
            np.sqrt(np.einsum("ij,ij->i", V, V)), np.finfo(np.float64).tiny
        )
        n = len(ids)
        out_a, out_b, out_s = [], [], []
        chunk = 2048
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            scores = (V[s:e] @ V.T) / np.outer(norms[s:e], norms)
            # value comparison (not position) ⇒ id_a < id_b holds for
            # any input order and silently drops duplicate-id pairs,
            # matching the SQL path's join predicate exactly
            mask = (scores >= thr) & (ids[None, :] > ids[s:e, None])
            r, c = np.nonzero(mask)
            if r.size:
                out_a.append(ids[s + r])
                out_b.append(ids[c])
                out_s.append(scores[r, c])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine_sim": np.concatenate(out_s),
            }
        )

    return src.groupBy("_block").applyInPandas(block_pairs, schema=out_schema)


def near_dup_pairs_probe(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.4,
) -> DataFrame:
    """Batch-probe form of :func:`near_dup_pairs`'s blocked GEMM: every
    pair (id_a < id_b, cosine ≥ threshold) with AT LEAST ONE endpoint
    in ``batch``, scored against ``corpus`` (pass corpus ∪ batch to
    surface new↔new pairs). The incremental-ingest shape: per block the
    kernel computes the |batch∩block| × |block| RECTANGLE — chunked
    ``newV @ V.T`` — so compute is ∝ batch, never corpus², while the
    full-recompute form stays ``near_dup_pairs`` (pair existence is
    pairwise-local, so the union of batch probes over monotone ticks
    IS the full pair set).

    A pair between two batch members is found from both sides (and a
    retried append may duplicate batch rows in ``corpus``); callers
    take ``.dropDuplicates(["id_a","id_b"])`` — scores for the
    duplicate findings are the same BLAS dot either way."""
    from pyspark.sql import types as T

    id_type = batch.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def tagged(df, new):
        return df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            (F.col(block_col) if block_col else F.lit(0)).alias("_block"),
            F.lit(new).alias("_new"),
        )

    src = tagged(corpus, False).unionByName(tagged(batch, True))
    thr = float(threshold)

    def probe_pairs(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["_id"].to_numpy()
        V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        # zero-norm guard — see block_pairs in _near_dup_pairs_gemm
        norms = np.maximum(
            np.sqrt(np.einsum("ij,ij->i", V, V)), np.finfo(np.float64).tiny
        )
        new_idx = np.nonzero(pdf["_new"].to_numpy(dtype=bool))[0]
        out_a, out_b, out_s = [], [], []
        chunk = 2048
        for s in range(0, len(new_idx), chunk):
            sel = new_idx[s : s + chunk]
            scores = (V[sel] @ V.T) / np.outer(norms[sel], norms)
            mask = (scores >= thr) & (ids[None, :] != ids[sel, None])
            r, c = np.nonzero(mask)
            if r.size:
                xa, xb = ids[sel][r], ids[c]
                out_a.append(np.minimum(xa, xb))
                out_b.append(np.maximum(xa, xb))
                out_s.append(scores[r, c])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine_sim": np.concatenate(out_s),
            }
        )

    return src.groupBy("_block").applyInPandas(probe_pairs, schema=out_schema)
