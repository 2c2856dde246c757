"""End-to-end LLM training-data curation pipeline (r9 verdict item #1).

The reference's differentiator is COMPOSED medallion pipelines — linear
Airflow DAGs of Spark jobs communicating through tables
(airflow/dags/uber_dag.py:29-98, 001_004_dataaudit.py:149-153). This
module transplants that composition to the engine's north-star domain:
the 30+ individually-verified LLM-curation operators become ONE
orchestrated, incremental, idempotent pipeline in the published
curation order:

    ingest (file-log incremental)
      >> quality filter          (C4/Gopher-style heuristics)
      >> exact dedup             (normalized-content hash, min-id keeper)
      >> near-dup dedup          (MinHash+LSH star candidates, exact
                                  jaccard verify, greedy keep-min drop)
      >> decontaminate           (8-gram overlap vs the eval set)
      >> deterministic split     (md5 hash buckets 80/10/10)
      >> leakage drop            (cross-split near-dup pairs: drop the
                                  TRAIN-side contaminator, keep val/test
                                  — closes split_leakage_audit's loop,
                                  r9 verdict item #2)
      >> gold summary            (per-(lang, split) docs + tokens, plus
                                  the stage-survivorship funnel)
      >> pack                    (fixed-budget token bins per
                                  (split, lang) — the shard assignment
                                  a sequence writer consumes)

Every stage is a pure ``DataFrame -> DataFrame`` function here, so the
same logic runs two ways:

- :func:`curation_dag` wires them into a :class:`~..orchestrate.Dag`
  over warehouse tables (``curation.*``) — incremental via
  :class:`~..incremental.FileLogCheckpoint` (a re-run with no new
  landing files Skips; downstream layers then skip too), idempotent
  (every layer below bronze is a deterministic overwrite of a derived
  table, the uber/news contract).
- ``plans/curation_pipeline.py`` composes them into single catalog
  queries with full DuckDB WITH-chain oracles (the driver contract).

Cross-engine determinism: every stage rule is md5/sha2-derived or
integer arithmetic — no RNG, no float thresholds on accumulated sums —
so the DuckDB oracle replays the IDENTICAL funnel.

Scale shape (the 100 TB argument, stage by stage):
- quality filter: one codegen'd projection, no shuffle;
- exact dedup: one shuffle on a 32-byte hash key;
- near-dup: shingle explode (map-side) → groupBy(doc) signatures →
  band-bucket STAR join (Σ(|bucket|−1), linear — not Σ bucket²) →
  jaccard verify on candidates only;
- decontaminate: eval 8-gram set is tiny → broadcast; corpus never
  shuffles;
- split/leakage: pure projections over ids + ONE aggregation over the
  (already-bounded) verified pair set;
- gold: one grouped aggregation on a ≤(langs × 3)-row key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, tokens
from ..ids import with_grouped_cumsum
from ..incremental import FileLogCheckpoint, list_files
from ..operators.dedup import (
    doc_shingle_sets,
    jaccard_verify,
    lsh_candidate_pairs,
    md5_int,
    minhash_signatures,
    word_shingles,
)
from ..orchestrate import Dag, Skip
from ..tables import TableManager

# Funnel thresholds — shared with the DuckDB oracle in
# plans/curation_pipeline.py (import them there; never re-type).
MIN_TOKENS = 10
MAX_TOKENS = 1000
MAX_STOPWORD_RATIO = 0.5
NEAR_DUP_JACCARD = 0.85   # near-dup drop threshold (stage N)
LEAK_JACCARD = 0.5        # looser cross-split leakage threshold (stage L)
PACK_BUDGET = 256         # tokens per packed training sequence (stage P)
EVAL_MOD = 29             # doc_id % EVAL_MOD == 0 → held-out eval set
NGRAM_EVAL = 8            # decontamination n-gram order


def quality_filter(docs: DataFrame) -> DataFrame:
    """Stage Q — C4/Gopher-style gate (text_quality_score's exact rule):
    keep docs with MIN_TOKENS ≤ n_tokens ≤ MAX_TOKENS and
    stopword_ratio < MAX_STOPWORD_RATIO. One projection + filter."""
    staged = docs.withColumn("_toks", tokens(F.col("text")))
    n = F.size(F.col("_toks"))
    n_stop = F.size(F.filter(F.col("_toks"), lambda x: x.isin(*STOPWORDS)))
    ratio = F.when(n == 0, F.lit(0.0)).otherwise(n_stop.cast("double") / n)
    return (
        staged.filter(
            (n >= MIN_TOKENS) & (n <= MAX_TOKENS) & (ratio < MAX_STOPWORD_RATIO)
        )
        .drop("_toks")
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Stage E — exact dedup by normalized-content sha256 (the
    dedup_exact_content rule): one keeper (min doc_id) per hash.
    Single shuffle on the hash key."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    keepers = (
        docs.select(F.sha2(norm, 256).alias("_ck"), "doc_id")
        .groupBy("_ck")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keepers, "doc_id", "left_semi")


def verified_pairs(docs: DataFrame, min_jaccard: float) -> DataFrame:
    """MinHash+LSH verified near-dup pairs among ``docs`` (doc_id, text):
    2-gram shingles → 8 minhashes → 2 bands of 4 → STAR candidates
    (bucket-min hub, Σ(|bucket|−1) linear) → exact jaccard ≥
    ``min_jaccard``. Returns (id_a, id_b, jaccard) with id_a < id_b —
    exactly dedup_minhash_lsh's machinery, factored so the near-dup
    and leakage stages share ONE pair computation."""
    sets = doc_shingle_sets(
        docs, "doc_id", word_shingles(tokens(F.col("text")), k=2)
    )
    sigs = minhash_signatures(sets, "doc_id")
    cands = lsh_candidate_pairs(sigs, "doc_id", star=True)
    return jaccard_verify(cands, sets, "doc_id").filter(
        F.col("jaccard") >= min_jaccard
    )


def near_dup_drop(
    docs: DataFrame, pairs: DataFrame, threshold: float = NEAR_DUP_JACCARD
) -> DataFrame:
    """Stage N — greedy keep-min near-dup drop: any doc appearing as the
    GREATER id of a verified pair with jaccard ≥ ``threshold`` is
    dropped. Pairwise-deterministic and SQL-replayable; the standard
    keep-first approximation of connected-components dedup (the exact
    CC variant is components_near_dup_clusters — at pipeline scale the
    greedy form avoids the iterative job entirely)."""
    drops = (
        pairs.filter(F.col("jaccard") >= threshold)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return docs.join(drops, "doc_id", "left_anti")


def decontaminate(docs: DataFrame, all_docs: DataFrame) -> DataFrame:
    """Stage D — benchmark decontamination (decontaminate_ngram_overlap's
    rule): docs with doc_id % EVAL_MOD == 0 stand in for the held-out
    eval set and are removed from the corpus outright; any surviving doc
    sharing ≥1 8-gram with the eval set's distinct 8-grams is dropped.
    The eval n-gram set comes from ``all_docs`` (the eval benchmark is
    external — earlier funnel stages don't shrink it); it is tiny and
    broadcast, so the corpus is never shuffled."""
    def ngrams_of(df):
        return df.select(
            "doc_id",
            F.explode(
                word_shingles(tokens(F.col("text")), NGRAM_EVAL)
            ).alias("ng"),
        )

    ev = (
        ngrams_of(all_docs.filter(F.col("doc_id") % EVAL_MOD == 0))
        .select("ng")
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    contaminated = (
        ngrams_of(corpus).join(F.broadcast(ev), "ng").select("doc_id").distinct()
    )
    return corpus.join(contaminated, "doc_id", "left_anti")


def assign_split(docs: DataFrame) -> DataFrame:
    """Stage S — deterministic 80/10/10 split as a pure function of the
    id (split_train_val_test's exact hash rule): membership is stable
    under re-runs and incremental arrivals, which RNG splitters can't
    guarantee."""
    bucket = md5_int(F.col("doc_id").cast("string"), mod=100)
    return docs.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )


def leakage_drop(
    docs_split: DataFrame, pairs: DataFrame, threshold: float = LEAK_JACCARD
) -> DataFrame:
    """Stage L — close split_leakage_audit's loop (r9 verdict item #2):
    for every verified pair with jaccard ≥ ``threshold`` whose two
    LIVE endpoints land in different splits, drop the TRAIN side and
    keep val/test (the published remediation: eval splits stay intact,
    the contaminating train doc goes). val↔test pairs are counted by
    the audit but dropped from neither side. ONE aggregation over the
    bounded pair set; the corpus pays a broadcast-able left_anti."""
    live = docs_split.select("doc_id", "split")
    p = (
        pairs.filter(F.col("jaccard") >= threshold)
        .join(
            live.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
            ),
            "id_a",
        )
        .join(
            live.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
            ),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
    )
    train_side = p.select(
        F.when(F.col("sa") == "train", F.col("id_a"))
        .when(F.col("sb") == "train", F.col("id_b"))
        .alias("doc_id")
    ).filter(F.col("doc_id").isNotNull()).distinct()
    return docs_split.join(train_side, "doc_id", "left_anti")


def gold_summary(final_docs: DataFrame) -> DataFrame:
    """Gold — per-(lang, split) survivorship: docs + total tokens. The
    table a datamix/packing stage consumes; ≤ |langs|×3 rows."""
    return (
        final_docs.withColumn("_n", F.size(tokens(F.col("text"))))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").cast("long").alias("n_tokens"),
        )
    )


def pack_corpus(
    final_docs: DataFrame, budget: int = PACK_BUDGET, materialize: bool = True
) -> DataFrame:
    """Stage P — the funnel's LAST step: pack the surviving corpus into
    fixed ``budget``-token training bins per (split, lang), in
    deterministic doc_id order (pack_sequences_greedy's exact cumsum
    rule: bin = tokens-before-this-doc DIV budget). Output is the
    per-document shard assignment a sequence writer consumes —
    (doc_id, split, lang, n_tok, bin) — reproducible across engines,
    re-runs and partitionings because it is a pure cumsum in a total
    per-group order, not an order-dependent first-fit heuristic. Bins
    never cross a split boundary so no packed sequence can mix train
    with val/test tokens.

    Scale shape (r10 verdict item #1): the running sum is
    :func:`~..ids.with_grouped_cumsum`'s two-phase range-partition
    cumsum — range-partition on (split, lang, doc_id), per-partition
    partial sums, broadcast offsets — NOT a
    ``Window.partitionBy(split, lang)`` cumsum, which would put ~all
    of train/en in ONE window task at 100 TB (split × lang is
    single-digit cardinality; SURVEY §4 anti-pattern #1). Identical
    bin arithmetic, identical output.

    ``materialize=False`` returns the lazy plan (plan-guard seam,
    with_grouped_cumsum's contract: caller unpersists
    ``._lh_pinned``)."""
    toks = final_docs.select(
        "doc_id", "split", "lang", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    packed = with_grouped_cumsum(
        toks,
        ["split", "lang"],
        ["doc_id"],
        "n_tok",
        out_col="_cum",
        materialize=materialize,
    )
    out = packed.withColumn(
        "bin", ((F.col("_cum") - F.col("n_tok")) / budget).cast("long")
    ).drop("_cum")
    if not materialize:
        out._lh_pinned = packed._lh_pinned
    return out


def run_funnel(
    docs: DataFrame, materialize_pairs: bool = False
) -> dict[str, DataFrame]:
    """Compose the full funnel lazily; returns every intermediate frame
    keyed by stage name (the catalog queries and the DAG tasks both
    build from this single definition, so they can never drift).

    ``materialize_pairs=True`` localCheckpoints the verified pair set —
    it feeds BOTH the near-dup drop and the leakage drop, and the
    minhash job is the funnel's expensive step; the one-query catalog
    composition uses this (the DAG persists the pairs as a table
    instead, which serves the same purpose durably)."""
    q = quality_filter(docs)
    e = exact_dedup(q)
    pairs = verified_pairs(e.select("doc_id", "text"), LEAK_JACCARD)
    if materialize_pairs:
        pairs = pairs.localCheckpoint()
    n = near_dup_drop(e, pairs)
    d = decontaminate(n, docs)
    s = assign_split(d)
    l = leakage_drop(s, pairs)
    return {
        "ingest": docs,
        "quality": q,
        "exact_dedup": e,
        "pairs": pairs,
        "near_dup": n,
        "decontaminate": d,
        "split": s,
        "leakage": l,
        "gold": gold_summary(l),
        "packed": pack_corpus(l),
    }


# ---------------------------------------------------------------------------
# The orchestrated DAG (warehouse tables, incremental, idempotent)
# ---------------------------------------------------------------------------

def curation_dag(
    spark,
    landing_dir: str,
    tm: TableManager,
    retries: int = 2,
    retry_delay: float = 0.0,
) -> Dag:
    """Build the curation medallion DAG. ``landing_dir`` holds landing
    parquet document files (doc_id, text, lang, ...); tables land as
    ``curation.bronze_docs`` → ``curation.silver_*`` →
    ``curation.gold_*``.

    Contract (the uber/news engineering, applied here):
    - **incremental**: ingest anti-joins the landing listing against a
      processed-file log and Skips when nothing is new — zero Spark
      jobs on the steady-state empty tick, and downstream tasks
      upstream-skip;
    - **idempotent**: bronze append is guarded by the file log; every
      later layer is a deterministic overwrite of a derived table, so
      re-running the DAG (or replaying a crashed run) converges to the
      same tables byte-for-byte;
    - tasks communicate ONLY through tables (each re-reads its
      upstream layer), like the reference's spark-submit jobs through
      Delta tables.
    """

    def ingest(ctx):
        log = FileLogCheckpoint(tm, "curation_docs")
        listing = list_files(spark, landing_dir, suffix=".parquet")
        new = log.new_files(listing).select("path")
        paths = [r.path for r in new.collect()]  # file NAMES, not data
        if not paths:
            raise Skip("no new landing files under " + landing_dir)
        raw = spark.read.parquet(*paths)
        tm.append(raw, "curation.bronze_docs")
        log.record(new)
        return {"new_files": len(paths)}

    def quality(ctx):
        tm.overwrite(
            quality_filter(tm.read("curation.bronze_docs")),
            "curation.silver_quality",
        )

    def exact(ctx):
        tm.overwrite(
            exact_dedup(tm.read("curation.silver_quality")),
            "curation.silver_exact",
        )

    def near_dup(ctx):
        e = tm.read("curation.silver_exact")
        pairs = verified_pairs(e.select("doc_id", "text"), LEAK_JACCARD)
        # the pair set is persisted as a TABLE so the leakage task
        # reuses it instead of recomputing the minhash job (and so the
        # audit trail of WHY a doc was dropped is queryable)
        tm.overwrite(pairs, "curation.near_dup_pairs")
        tm.overwrite(
            near_dup_drop(e, tm.read("curation.near_dup_pairs")),
            "curation.silver_neardup",
        )

    def decontam(ctx):
        tm.overwrite(
            decontaminate(
                tm.read("curation.silver_neardup"),
                tm.read("curation.bronze_docs"),
            ),
            "curation.silver_clean",
        )

    def split(ctx):
        tm.overwrite(
            assign_split(tm.read("curation.silver_clean")),
            "curation.gold_split",
        )

    def leakage(ctx):
        s = tm.read("curation.gold_split")
        pairs = tm.read("curation.near_dup_pairs")
        tm.overwrite(leakage_drop(s, pairs), "curation.gold_corpus")

    def pack(ctx):
        tm.overwrite(
            pack_corpus(tm.read("curation.gold_corpus")),
            "curation.gold_packed",
        )

    def summarize(ctx):
        final = tm.read("curation.gold_corpus")
        tm.overwrite(gold_summary(final), "curation.gold_summary")
        # stage-survivorship funnel — counts read back from the layer
        # tables (one count() per small table, not a recompute)
        rows = [
            ("ingest", tm.read("curation.bronze_docs").count()),
            ("quality", tm.read("curation.silver_quality").count()),
            ("exact_dedup", tm.read("curation.silver_exact").count()),
            ("near_dup", tm.read("curation.silver_neardup").count()),
            ("decontaminate", tm.read("curation.silver_clean").count()),
            ("leakage", final.count()),
        ]
        funnel = spark.createDataFrame(
            [(i, name, int(n)) for i, (name, n) in enumerate(rows)],
            "stage_idx INT, stage STRING, n_docs BIGINT",
        )
        tm.overwrite(funnel, "curation.gold_funnel")
        return {name: n for _, (name, n) in zip(rows, rows)}

    dag = Dag("curation", lock_dir=tm.warehouse_dir)
    dag.task("ingest", ingest, retries=retries, retry_delay=retry_delay)
    dag.task("quality_filter", quality, upstream=("ingest",),
             retries=retries, retry_delay=retry_delay)
    dag.task("exact_dedup", exact, upstream=("quality_filter",),
             retries=retries, retry_delay=retry_delay)
    dag.task("near_dup_dedup", near_dup, upstream=("exact_dedup",),
             retries=retries, retry_delay=retry_delay)
    dag.task("decontaminate", decontam, upstream=("near_dup_dedup",),
             retries=retries, retry_delay=retry_delay)
    dag.task("split_assign", split, upstream=("decontaminate",),
             retries=retries, retry_delay=retry_delay)
    dag.task("leakage_drop", leakage, upstream=("split_assign",),
             retries=retries, retry_delay=retry_delay)
    dag.task("pack", pack, upstream=("leakage_drop",),
             retries=retries, retry_delay=retry_delay)
    dag.task("gold_summary", summarize, upstream=("leakage_drop",),
             retries=retries, retry_delay=retry_delay)
    return dag
