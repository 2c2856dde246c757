"""Embedding similarity queries: brute-force cosine top-k, IVF-style
cell-restricted top-k, cosine near-dup pairs with blocking.

Vectors are array<float>; all arithmetic casts to double element-wise
and left-folds in index order on BOTH engines (operators/similarity.py
vs generated list_reduce SQL) so cosines are bit-identical.
"""

from __future__ import annotations

# module-level so stringified pandas_udf type hints resolve via module
# globals (the __future__ annotations import stringifies them — see
# operators/ivf.py for the same pattern)
import pandas as pd
from pyspark.sql import functions as F

from ..io_utils import load
from ..operators.similarity import cosine, knn_bruteforce, near_dup_pairs
from . import register


def _dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


def _cos(a: str, b: str) -> str:
    return f"{_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)}))"


# ---------------------------------------------------------------------------
# Brute-force cosine top-5 (the baseline every ANN variant is checked
# against)
# ---------------------------------------------------------------------------

_KNN_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 10),
scored AS (
  SELECT qid, cid, {_cos('qv', 'cv')} AS cosine_sim
  FROM c, q
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine_sim DESC, cid) AS rank
  FROM scored
)
SELECT qid AS vec_id, cid AS neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


@register("knn_bruteforce_cosine", oracle=_KNN_ORACLE)
def knn_bruteforce_cosine(spark, sf_dir):
    """Brute-force cosine top-5 per query vector (queries = vec_id<10
    broadcast against the corpus; one corpus scan, window top-k). The
    100 TB baseline: O(|Q|·|C|) flops but zero shuffle of the corpus."""
    e = load(spark, sf_dir, "embeddings")
    out = knn_bruteforce(
        e.filter(F.col("vec_id") < 10),
        e.filter(F.col("vec_id") >= 10),
        query_id="vec_id",
        corpus_id="vec_id",
        k=5,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# IVF-style cell-restricted top-5 (label as the coarse cell)
# ---------------------------------------------------------------------------

_IVF_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv, label FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, embedding AS cv, label FROM embeddings WHERE vec_id >= 10),
scored AS (
  SELECT qid, cid, {_cos('qv', 'cv')} AS cosine_sim
  FROM c JOIN q ON c.label = q.label
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine_sim DESC, cid) AS rank
  FROM scored
)
SELECT qid AS vec_id, cid AS neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


@register("knn_ivf_cells", oracle=_IVF_ORACLE)
def knn_ivf_cells(spark, sf_dir):
    """IVF-style ANN: search only the query's coarse cell (here the
    label column stands in for a k-means cell id computed offline).
    With the corpus written partitioned by cell, partition pruning makes
    this sublinear in corpus size — the scale path over brute force."""
    e = load(spark, sf_dir, "embeddings")
    out = knn_bruteforce(
        e.filter(F.col("vec_id") < 10),
        e.filter(F.col("vec_id") >= 10),
        query_id="vec_id",
        corpus_id="vec_id",
        k=5,
        cell_col="label",
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (label-blocked)
# ---------------------------------------------------------------------------

_NEARDUP_ORACLE = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_cos('a.embedding', 'b.embedding')} AS cosine_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cos('a.embedding', 'b.embedding')} >= 0.4
"""


# Big-SF gate formulation of the same oracle (r4 verdict item #3): the
# all-pairs list_reduce lambda costs ~5 µs/pair — ~500M same-label pairs
# at sf5 timed out at 300 s. Native array_cosine_similarity over
# FLOAT[64] arrays PREFILTERS at (τ − 1e-3) — float32 cosine error for
# 64 dims is ≤ ~1e-5, so the margin cannot drop a true pair — and the
# EXACT left-fold double formula still decides inclusion and produces
# the output value, so results are bit-identical to the primary oracle
# (pinned at sf0.01 by test_sf_oracle_equivalent_to_primary; measured
# identical 9 703 / 240 718 pairs at sf1 / sf5).
_NEARDUP_SF_ORACLE = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, label, CAST(embedding AS FLOAT[64]) AS arr, embedding
  FROM embeddings
),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS ea, b.embedding AS eb
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE array_cosine_similarity(a.arr, b.arr) >= 0.4 - 1e-3
)
SELECT id_a, id_b, {_cos('ea', 'eb')} AS cosine_sim
FROM cand
WHERE {_cos('ea', 'eb')} >= 0.4
"""


@register(
    "embedding_near_dup", oracle=_NEARDUP_ORACLE, sf_oracle=_NEARDUP_SF_ORACLE
)
def embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup: same-cell pairs above a cosine
    threshold (operators/similarity.py near_dup_pairs). Blocking turns
    O(n²) into Σ cell² — with LSH bucketing as the drop-in block for
    unlabeled corpora."""
    e = load(spark, sf_dir, "embeddings")
    # dim=64 (the fixture embedding width) switches the pair-dot to the
    # flat codegen expression — same left-fold sum, no interpreted HOF
    return near_dup_pairs(e, "vec_id", block_col="label", threshold=0.4, dim=64)


# ---------------------------------------------------------------------------
# Random-hyperplane (SimHash-for-vectors) LSH bucketing
# ---------------------------------------------------------------------------


def _hyperplanes(n_planes: int = 6, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes shared by both engines:
    plane[j][d] = (md5int(f"{j}:{d}") % 2001 - 1000) / 1000 ∈ [-1, 1].
    Generated once in Python and inlined as literals, so Spark and the
    oracle use bit-identical coefficients."""
    import hashlib

    out = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{j}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        out.append(row)
    return out


_PLANES = _hyperplanes()


def _bucket_sql(vec: str) -> str:
    terms = []
    for j, plane in enumerate(_PLANES):
        lit = "[" + ", ".join(f"{x:.3f}::DOUBLE" for x in plane) + "]"
        dot = (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(1, len({vec}) + 1), i -> {vec}[i]::DOUBLE * ({lit})[i])), "
            f"(acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


def _bucket_col(vec):
    out = F.lit(0)
    for j, plane in enumerate(_PLANES):
        lit = F.array(*[F.lit(float(f"{x:.3f}")) for x in plane])
        prods = F.zip_with(vec, lit, lambda a, b: a.cast("double") * b)
        dot = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        out = out + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


_HYPER_ORACLE = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM bucketed WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, embedding AS cv, bucket FROM bucketed WHERE vec_id >= 10),
scored AS (
  SELECT qid, cid, {_cos('qv', 'cv')} AS cosine_sim
  FROM c JOIN q USING (bucket)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine_sim DESC, cid) AS rank
  FROM scored
)
SELECT qid AS vec_id, cid AS neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
"""


@register("knn_lsh_hyperplane", oracle=_HYPER_ORACLE)
def knn_lsh_hyperplane(spark, sf_dir):
    """Random-hyperplane LSH ANN: each vector's 6-bit bucket is the sign
    pattern of 6 fixed pseudo-random hyperplane projections (cosine-LSH);
    search is restricted to the query's bucket. Unlike the IVF variant
    this needs NO offline clustering or label column — buckets are a
    pure function of the vector, so new corpus rows bucket themselves on
    ingest, and a corpus written partitioned by bucket gets partition
    pruning. Expected recall rises with band count (multi-probe /
    multiple tables at scale); the brute-force query is the recall
    baseline to audit against."""
    e = load(spark, sf_dir, "embeddings")
    bucketed = e.select("vec_id", "embedding", _bucket_col(F.col("embedding")).alias("bucket"))
    out = knn_bruteforce(
        bucketed.filter(F.col("vec_id") < 10),
        bucketed.filter(F.col("vec_id") >= 10),
        query_id="vec_id",
        corpus_id="vec_id",
        k=3,
        cell_col="bucket",
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# Multi-probe LSH recall audit (quantitative ANN quality measurement)
# ---------------------------------------------------------------------------

_RECALL_ORACLE = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM bucketed WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, embedding AS cv, bucket AS cbucket FROM bucketed WHERE vec_id >= 10),
bf AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY {_cos('qv', 'cv')} DESC, cid) AS rank
    FROM c, q
  ) WHERE rank <= 5
),
probes AS (
  SELECT qid, bucket AS pb FROM q
  UNION ALL
  SELECT qid, xor(bucket, m) FROM q, (SELECT unnest([1, 2, 4, 8, 16, 32]) AS m)
),
cand AS (
  SELECT DISTINCT p.qid, c.cid FROM probes p JOIN c ON c.cbucket = p.pb
),
cand_single AS (
  SELECT q.qid, c.cid FROM q JOIN c ON c.cbucket = q.bucket
),
nm AS (SELECT qid, COUNT(*) AS n FROM cand GROUP BY qid),
ns AS (SELECT qid, COUNT(*) AS n FROM cand_single GROUP BY qid),
hm AS (SELECT bf.qid, COUNT(cand.cid) AS h FROM bf
       LEFT JOIN cand ON bf.qid = cand.qid AND bf.cid = cand.cid GROUP BY bf.qid),
hs AS (SELECT bf.qid, COUNT(cs.cid) AS h FROM bf
       LEFT JOIN cand_single cs ON bf.qid = cs.qid AND bf.cid = cs.cid GROUP BY bf.qid)
SELECT q.qid AS vec_id,
       CAST(COALESCE(ns.n, 0) AS BIGINT) AS n_cand_single,
       CAST(COALESCE(nm.n, 0) AS BIGINT) AS n_cand_multi,
       CAST(COALESCE(hs.h, 0) AS DOUBLE) / 5.0 AS recall_single,
       CAST(COALESCE(hm.h, 0) AS DOUBLE) / 5.0 AS recall_multi
FROM q
LEFT JOIN nm ON nm.qid = q.qid
LEFT JOIN ns ON ns.qid = q.qid
LEFT JOIN hm ON hm.qid = q.qid
LEFT JOIN hs ON hs.qid = q.qid
"""


@register("knn_lsh_recall_audit", oracle=_RECALL_ORACLE)
def knn_lsh_recall_audit(spark, sf_dir):
    """Quantitative recall audit of the hyperplane-LSH ANN: per query,
    recall@5 against the brute-force top-5 for (a) single-probe (the
    query's own 6-bit bucket) and (b) multi-probe (the bucket plus all
    six Hamming-distance-1 buckets — the standard multi-probe trick:
    the nearest-neighbour buckets most likely to hold missed neighbours
    are exactly those where one hyperplane sign flips). Also reports the
    candidate-set sizes, making the recall/cost trade quantitative:
    multi-probe scans ~7 buckets' worth of candidates for strictly
    higher recall, still Σ bucket² work — never all-pairs.

    Scale shape: the corpus is scanned once and joined to a BROADCAST
    probe list (|Q|·7 rows); candidate scoring happens only on bucket
    matches. The brute-force side is the audited baseline and exists at
    sf-scale only for the audit; production reuses the stored top-k."""
    e = load(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id", "embedding", _bucket_col(F.col("embedding")).alias("bucket")
    )
    q = bucketed.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "bucket"
    )
    c = bucketed.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("bucket").alias("cbucket")
    )
    bf = knn_bruteforce(
        bucketed.filter(F.col("vec_id") < 10),
        bucketed.filter(F.col("vec_id") >= 10),
        query_id="vec_id",
        corpus_id="vec_id",
        k=5,
    ).select(F.col("vec_id").alias("qid"), F.col("neighbor_id").alias("cid"))

    probe_arr = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(6)]
    )
    probes = q.select("qid", F.explode(probe_arr).alias("pb"))
    cand = (
        c.join(F.broadcast(probes), F.col("cbucket") == F.col("pb"))
        .select("qid", "cid")
        .distinct()
    )
    cand_single = c.join(
        F.broadcast(q), F.col("cbucket") == F.col("bucket")
    ).select("qid", "cid")

    nm = cand.groupBy("qid").agg(F.count(F.lit(1)).alias("n_cand_multi"))
    ns = cand_single.groupBy("qid").agg(F.count(F.lit(1)).alias("n_cand_single"))
    hm = bf.join(cand, ["qid", "cid"], "left_semi").groupBy("qid").agg(
        F.count(F.lit(1)).alias("h_multi")
    )
    hs = bf.join(cand_single, ["qid", "cid"], "left_semi").groupBy("qid").agg(
        F.count(F.lit(1)).alias("h_single")
    )
    return (
        q.select("qid")
        .join(ns, "qid", "left")
        .join(nm, "qid", "left")
        .join(hs, "qid", "left")
        .join(hm, "qid", "left")
        .select(
            F.col("qid").alias("vec_id"),
            F.coalesce("n_cand_single", F.lit(0)).cast("long").alias("n_cand_single"),
            F.coalesce("n_cand_multi", F.lit(0)).cast("long").alias("n_cand_multi"),
            (F.coalesce("h_single", F.lit(0)).cast("double") / 5.0).alias("recall_single"),
            (F.coalesce("h_multi", F.lit(0)).cast("double") / 5.0).alias("recall_multi"),
        )
    )


# ---------------------------------------------------------------------------
# IVF recall audit: cell-restricted top-5 vs brute-force top-5
# ---------------------------------------------------------------------------

_IVF_RECALL_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv, label FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, embedding AS cv, label FROM embeddings WHERE vec_id >= 10),
bf AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.qid
                              ORDER BY {_cos('q.qv', 'c.cv')} DESC, c.cid) AS rank
    FROM c, q
  ) WHERE rank <= 5
),
ivf AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.qid
                              ORDER BY {_cos('q.qv', 'c.cv')} DESC, c.cid) AS rank
    FROM c JOIN q ON c.label = q.label
  ) WHERE rank <= 5
),
hits AS (
  SELECT bf.qid, COUNT(*) AS h
  FROM bf JOIN ivf ON bf.qid = ivf.qid AND bf.cid = ivf.cid
  GROUP BY bf.qid
),
nc AS (
  SELECT q.qid, COUNT(*) AS n FROM q JOIN c ON c.label = q.label GROUP BY q.qid
)
SELECT q.qid AS vec_id,
       CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_cand,
       CAST(COALESCE(h.h, 0) AS DOUBLE) / 5.0 AS recall_at_5
FROM q LEFT JOIN nc ON nc.qid = q.qid LEFT JOIN hits h ON h.qid = q.qid
"""


@register("knn_ivf_recall_audit", oracle=_IVF_RECALL_ORACLE)
def knn_ivf_recall_audit(spark, sf_dir):
    """Quantitative recall audit of the IVF path (mirror of
    knn_lsh_recall_audit for the cell-restricted variant): per query,
    recall@5 of the single-cell search against the brute-force top-5,
    plus the candidate-set size the cell restriction actually scanned.
    Together the two audits make the ANN recall/cost trade measurable
    for BOTH index families this engine ships (coarse-quantizer cells
    and hyperplane LSH). Scale shape: two broadcast-query scans over
    the corpus (global + cell-pruned) and a |Q·5|-row overlap join —
    the brute-force side exists at sf-scale only for the audit."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    c = e.filter(F.col("vec_id") >= 10)
    bf = knn_bruteforce(q, c, query_id="vec_id", corpus_id="vec_id", k=5).select(
        F.col("vec_id").alias("qid"), F.col("neighbor_id").alias("cid")
    )
    ivf = knn_bruteforce(
        q, c, query_id="vec_id", corpus_id="vec_id", k=5, cell_col="label"
    ).select(F.col("vec_id").alias("qid"), F.col("neighbor_id").alias("cid"))
    hits = bf.join(ivf, ["qid", "cid"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("h")
    )
    n_cand = (
        q.select(F.col("vec_id").alias("qid"), "label")
        .join(c.select(F.col("label").alias("clabel")), F.col("label") == F.col("clabel"))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        q.select(F.col("vec_id").alias("qid"))
        .join(n_cand, "qid", "left")
        .join(hits, "qid", "left")
        .select(
            F.col("qid").alias("vec_id"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_cand"),
            (F.coalesce("h", F.lit(0)).cast("double") / 5.0).alias("recall_at_5"),
        )
    )


# ---------------------------------------------------------------------------
# Product-quantization ADC top-k (operators/pq.py)
# ---------------------------------------------------------------------------


def _sq8(a: str, b: str) -> str:
    """Left-fold Σ (a[d]-b[d])² over an 8-dim subspace; both operands
    are already-DOUBLE lists. Same 0.0 seed + index order as the numpy
    kernels in operators/pq.py."""
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, 9), "
        f"d -> ({a}[d] - {b}[d]) * ({a}[d] - {b}[d]))), "
        f"(acc, x) -> acc + x)"
    )


_QSUB = (
    "list_transform(range(ss.s*8 + 1, ss.s*8 + 9), "
    "d -> CAST(q.embedding[d] AS DOUBLE))"
)

_PQ_CTES = f"""seeds AS (
  SELECT vec_id AS j,
         list_transform(range(1, len(embedding) + 1),
                        d -> ROUND(CAST(embedding[d] AS DOUBLE), 6)) AS c
  FROM embeddings WHERE vec_id < 16
),
ss AS (SELECT unnest(range(0, 8)) AS s),
cb AS (
  SELECT ss.s, seeds.j,
         list_transform(range(ss.s*8 + 1, ss.s*8 + 9), d -> c[d]) AS cw
  FROM ss, seeds
),
corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
subv AS (
  SELECT c.vec_id, ss.s,
         list_transform(range(ss.s*8 + 1, ss.s*8 + 9),
                        d -> CAST(c.embedding[d] AS DOUBLE)) AS sv
  FROM corpus c, ss
),
enc AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT v.vec_id, v.s, b.j,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.s
                              ORDER BY {_sq8('v.sv', 'b.cw')}, b.j) AS rn
    FROM subv v JOIN cb b ON b.s = v.s
  ) WHERE rn = 1
),
dists AS (
  SELECT q.vec_id AS query_id, e.vec_id AS corpus_id, e.s,
         {_sq8(_QSUB, 'b.cw')} AS ds
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) q,
       enc e
  JOIN cb b ON b.s = e.s AND b.j = e.code
  JOIN ss ON ss.s = e.s
),
adc AS (
  SELECT query_id, corpus_id,
         list_reduce(list_prepend(0.0::DOUBLE, list(ds ORDER BY s)),
                     (acc, x) -> acc + x) AS adc
  FROM dists GROUP BY query_id, corpus_id
),
pq5 AS (
  SELECT query_id, corpus_id, rank, adc FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adc, corpus_id) AS rank
    FROM adc
  ) WHERE rank <= 5
)"""

_PQ_ORACLE = f"""
WITH {_PQ_CTES}
SELECT query_id, corpus_id, CAST(rank AS BIGINT) AS rank,
       ROUND(adc, 6) AS adc_dist
FROM pq5
"""


@register("knn_pq_adc", oracle=_PQ_ORACLE)
def knn_pq_adc(spark, sf_dir):
    """Product-quantization ANN with an asymmetric-distance (ADC) scan:
    the corpus is ENCODED as 8 codeword ids (one per 8-dim subspace,
    16-codeword sampled codebook = the 6 dp-rounded subvectors of
    vec_id < 16), and queries rank candidates from codes + codebook
    alone — the raw corpus vectors are never touched after encoding.

    100 TB design: codes are ~32× smaller than float32 vectors, encode
    is a shuffle-free Arrow map, the tiny queries side broadcasts onto
    the code-only corpus projection, and the single shuffle is the
    per-query top-k window over |queries|×|corpus| scored rows (at
    production scale, per-partition top-k pre-reduction before that
    window — operators/similarity.knn_bruteforce shows the shape).
    Exact-fold contract with the oracle documented in operators/pq.py."""
    from pyspark.sql import Window

    from ..operators.pq import adc_distance, encode_codes, pq_codebooks

    e = load(spark, sf_dir, "embeddings")
    cbs = pq_codebooks(spark, e)
    corpus = encode_codes(
        e.filter(F.col("vec_id") >= 10).select("vec_id", "embedding"), cbs
    ).select(F.col("vec_id").alias("corpus_id"), "codes")
    queries = (
        e.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
    )
    scored = corpus.crossJoin(F.broadcast(queries)).withColumn(
        "adc", adc_distance(cbs)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "corpus_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("adc", 6).alias("adc_dist"),
        )
    )


def _sqflat(a: str, b: str) -> str:
    """Flat exact left-fold Σ (a[d]-b[d])² over the FULL vector — the
    ground-truth squared-L2 the PQ audit compares against (one 0.0-
    seeded fold over all 64 dims, distinct from ADC's nested fold)."""
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a}) + 1), "
        f"d -> ({a}[d]::DOUBLE - {b}[d]::DOUBLE) * "
        f"({a}[d]::DOUBLE - {b}[d]::DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


_PQ_AUDIT_ORACLE = f"""
WITH {_PQ_CTES},
bf5 AS (
  SELECT query_id, corpus_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_sqflat('q.embedding', 'c.embedding')},
                                       c.vec_id) AS rn
    FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) q,
         (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10) c
  ) WHERE rn <= 5
),
hits AS (
  SELECT b.query_id, COUNT(p.corpus_id) AS h
  FROM bf5 b
  LEFT JOIN pq5 p ON p.query_id = b.query_id AND p.corpus_id = b.corpus_id
  GROUP BY b.query_id
)
SELECT query_id, CAST(h AS BIGINT) AS n_hits,
       CAST(h AS DOUBLE) / 5.0 AS recall_adc
FROM hits
"""


@register("knn_pq_adc_recall_audit", oracle=_PQ_AUDIT_ORACLE)
def knn_pq_adc_recall_audit(spark, sf_dir):
    """Recall@5 of the PQ-ADC scan against exact squared-L2 brute
    force, per query — the quantitative cost-of-compression row for
    the PQ index (mirrors knn_ivf_nprobe_recall_audit / the LSH
    audit). The brute-force side exists only for the audit; the exact
    distance is ONE flat 0.0-seeded fold over all dims (per-row Arrow
    numpy, sequential over dims) so both engines rank the same truth.
    Measured: 0.22 mean recall@5 at sf0.001 with the untrained sampled
    codebook on these isotropic-random fixtures (64 dims → 8 bytes is a
    32× compression; random vectors are the worst case for PQ) — the
    honest floor a trained (per-subspace Lloyd) codebook and/or an
    ADC-then-exact-rerank stage is judged against."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    from ..operators.pq import adc_distance, encode_codes, pq_codebooks

    e = load(spark, sf_dir, "embeddings")
    cbs = pq_codebooks(spark, e)
    queries = (
        e.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
    )
    corpus_raw = e.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding"
    )

    # PQ side: ADC top-5 from codes only
    scored = (
        encode_codes(corpus_raw, cbs)
        .select("corpus_id", "codes")
        .crossJoin(F.broadcast(queries))
        .withColumn("adc", adc_distance(cbs))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("corpus_id").asc()
    )
    pq5 = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "corpus_id")
    )

    # truth side: exact flat-fold squared L2
    @pandas_udf("double")
    def _l2(q: pd.Series, c: pd.Series) -> pd.Series:
        import numpy as np

        if len(q) == 0:
            return pd.Series([], dtype="float64")
        Q = np.vstack(q.to_numpy()).astype(np.float64)
        C = np.vstack(c.to_numpy()).astype(np.float64)
        acc = np.zeros(Q.shape[0], dtype=np.float64)
        for d in range(Q.shape[1]):
            diff = Q[:, d] - C[:, d]
            acc = acc + diff * diff
        return pd.Series(acc)

    exact = corpus_raw.crossJoin(F.broadcast(queries)).withColumn(
        "l2", _l2(F.col("q_embedding"), F.col("embedding"))
    )
    wbf = Window.partitionBy("query_id").orderBy(
        F.col("l2").asc(), F.col("corpus_id").asc()
    )
    bf5 = (
        exact.withColumn("rn", F.row_number().over(wbf))
        .filter(F.col("rn") <= 5)
        .select("query_id", "corpus_id")
    )

    hit = pq5.withColumn("_hit", F.lit(1))
    return (
        bf5.join(hit, ["query_id", "corpus_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").alias("n_hits"))
        .select(
            "query_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_hits").cast("double") / 5.0).alias("recall_adc"),
        )
    )
