"""Product-quantization ANN: subspace codebooks, corpus encoding, and
asymmetric-distance (ADC) scans — the classic memory-bounded
complement to the IVF index (operators/ivf.py), re-expressed
Spark-first (reference parity target: the vector-search surface of
/root/reference's ANN suite; design per Jégou et al., "Product
Quantization for Nearest Neighbor Search", public).

At 100 TB the point of PQ is that the SCAN never touches the raw
vectors: the corpus is stored as m small codes per vector (here 8
bytes), and a query ranks candidates from those codes plus a tiny
codebook — so the working set is codes + codebook, ~32× smaller than
float32 vectors. Encoding is embarrassingly parallel (one Arrow batch
at a time, no shuffle); the ADC scan is a broadcast of the queries
over a code-only projection of the corpus, followed by a per-query
top-k window — one shuffle of the k×|queries| survivors.

Determinism contract (shared with the DuckDB oracles in
plans/similarity_queries.py):
  - codebook[s][j] = subvector s of seed vector j (vec_id < k_codes),
    each component ROUND(double, 6) — half away from zero, the same
    seed recipe as operators/ivf.lloyd_converged;
  - subspace squared distance = left-to-right fold of (v[d]-c[d])² in
    index order seeded 0.0 (numpy evaluates the identical sequence,
    vectorized over rows — never pairwise/SIMD summation);
  - encode argmin tie-break on (dist, j) — np.argmin keeps the FIRST
    minimum, DuckDB row_number orders by (dist, j);
  - ADC(q, codes) = left fold over subspaces IN ORDER, seeded 0.0, of
    the per-subspace folds — NOT one flat 64-term fold (different
    rounding order), and both engines honor the same nesting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# module-level so stringified pandas_udf type hints resolve (see ivf.py)
import pandas as pd

PQ_N_SUB = 8  # subspaces
PQ_K_CODES = 16  # codewords per subspace


def _seq_sqdist_np(M, cent):
    """Exact left-fold Σ (M[:,d]-cent[d])² — sequential over dims,
    vectorized over rows; one accumulator per row, seeded 0.0 (the
    numpy twin of plans' list_reduce fold — see operators/ivf
    ._cell_dists_np for why np.dot/np.sum would silently diverge)."""
    import numpy as np

    acc = np.zeros(M.shape[0], dtype=np.float64)
    for d, c in enumerate(cent):
        diff = M[:, d] - c
        acc = acc + diff * diff
    return acc


def pq_codebooks(
    spark: SparkSession,
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_sub: int = PQ_N_SUB,
    k_codes: int = PQ_K_CODES,
) -> list[list[list[float]]]:
    """``codebooks[s][j]`` = the s-th subvector of seed vector j
    (id < k_codes), components rounded to 6 dp — a deterministic
    sampled codebook (production would refine it with
    operators/ivf.kmeans-style Lloyd steps per subspace; the scan
    below is agnostic to how the codebook was trained). Collects
    k_codes rows — O(k·dim) driver bytes, independent of corpus size."""
    rows = (
        embeddings.filter(F.col(id_col) < k_codes)
        .select(
            id_col,
            F.transform(vec_col, lambda x: F.round(x.cast("double"), 6)).alias(
                "c"
            ),
        )
        .collect()
    )
    by_id = {int(r[id_col]): [float(v) for v in r.c] for r in rows}
    if sorted(by_id) != list(range(k_codes)):
        raise RuntimeError(
            f"expected seed ids 0..{k_codes - 1}, got {sorted(by_id)}"
        )
    dim = len(by_id[0])
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible into {n_sub} subspaces")
    w = dim // n_sub
    return [
        [by_id[j][s * w : (s + 1) * w] for j in range(k_codes)]
        for s in range(n_sub)
    ]


def encode_codes(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append ``out_col`` = array<int> of per-subspace nearest-codeword
    ids. Arrow-batched numpy, constant plan shape (the codebook rides
    in the closure), no shuffle — the 100 TB encode is a pure map."""
    from pyspark.sql.functions import pandas_udf

    cbs = [[list(map(float, cw)) for cw in sub] for sub in codebooks]
    w = len(cbs[0][0])

    @pandas_udf("array<int>")
    def _encode(emb: pd.Series) -> pd.Series:
        import numpy as np

        if len(emb) == 0:
            return pd.Series([], dtype="object")
        M = np.vstack(emb.to_numpy()).astype(np.float64)
        codes = np.empty((M.shape[0], len(cbs)), dtype=np.int32)
        for s, sub in enumerate(cbs):
            Ms = M[:, s * w : (s + 1) * w]
            d = np.empty((M.shape[0], len(sub)), dtype=np.float64)
            for j, cw in enumerate(sub):
                d[:, j] = _seq_sqdist_np(Ms, cw)
            codes[:, s] = np.argmin(d, axis=1)  # first min → lowest j
        return pd.Series(list(codes))

    return df.withColumn(out_col, _encode(F.col(vec_col)))


def adc_distance(
    codebooks: list[list[list[float]]],
    query_col: str = "q_embedding",
    codes_col: str = "codes",
):
    """Column: exact ADC distance between a query vector column and a
    corpus codes column. Per Arrow batch: reconstruct the chosen
    codeword rows by fancy-indexing the closure codebook, then the
    nested exact fold (dims within a subspace, then subspaces in
    order). Row-parallel, no shuffle — the scan cost is
    |corpus|×|queries| fused multiply-adds over CODES, never over raw
    corpus vectors."""
    from pyspark.sql.functions import pandas_udf

    cbs = [[list(map(float, cw)) for cw in sub] for sub in codebooks]
    w = len(cbs[0][0])

    @pandas_udf("double")
    def _adc(q: pd.Series, codes: pd.Series) -> pd.Series:
        import numpy as np

        if len(q) == 0:
            return pd.Series([], dtype="float64")
        Q = np.vstack(q.to_numpy()).astype(np.float64)
        C = np.vstack(codes.to_numpy()).astype(np.int64)
        total = np.zeros(Q.shape[0], dtype=np.float64)
        for s, sub in enumerate(cbs):
            CW = np.asarray(sub, dtype=np.float64)[C[:, s]]  # n × w
            Qs = Q[:, s * w : (s + 1) * w]
            acc = np.zeros(Q.shape[0], dtype=np.float64)
            for d in range(w):
                diff = Qs[:, d] - CW[:, d]
                acc = acc + diff * diff
            total = total + acc  # fold over subspaces IN ORDER
        return pd.Series(total)

    return _adc(F.col(query_col), F.col(codes_col))
