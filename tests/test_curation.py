"""End-to-end LLM curation pipeline (r9 verdict items #1 and #2):
per-stage unit semantics, the orchestrated DAG's run → skip-rerun →
incremental contract, and DAG ≡ pure-composition equivalence (the
warehouse funnel must match run_funnel byte-for-byte)."""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from lakehouse_v3_spark.pipelines import curation as C
from lakehouse_v3_spark.tables import TableManager

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    """rows: (doc_id, text[, lang])"""
    return spark.createDataFrame(
        [(i, t, (r[2] if len(r) > 2 else "en")) for r in rows for i, t in [(r[0], r[1])]],
        "doc_id LONG, text STRING, lang STRING",
    )


def _md5_split(doc_id: int) -> str:
    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


# ---------------------------------------------------------------------------
# per-stage unit semantics
# ---------------------------------------------------------------------------

def test_quality_filter_gate(spark):
    ten = " ".join(f"tok{i}" for i in range(10))
    five = " ".join(f"tok{i}" for i in range(5))
    huge = " ".join(f"tok{i}" for i in range(1001))
    stopy = "the a of and to in " + "word " * 6  # 12 toks, 6 stop → ratio 0.5
    d = _docs(spark, [(1, ten), (2, five), (3, huge), (4, stopy)])
    kept = {r.doc_id for r in C.quality_filter(d).collect()}
    assert kept == {1}  # 2: too short, 3: too long, 4: ratio 0.5 not < 0.5


def test_exact_dedup_min_keeper(spark):
    d = _docs(
        spark,
        [
            (5, "Hello, World! This is fine."),
            (2, "hello world this is fine"),  # same normalized content
            (9, "a different document entirely"),
        ],
    )
    kept = {r.doc_id for r in C.exact_dedup(d).collect()}
    assert kept == {2, 9}


def test_near_dup_drop_greedy_keep_min(spark):
    d = _docs(spark, [(1, "x"), (2, "y"), (3, "z")])
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.6)], "id_a LONG, id_b LONG, jaccard DOUBLE"
    )
    kept = {r.doc_id for r in C.near_dup_drop(d, pairs).collect()}
    assert kept == {1, 3}  # 2 dropped (>=0.85 pair); 3 kept (0.6 < 0.85)


def test_leakage_drop_train_side_only(spark):
    docs_split = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "test"), (4, "train")],
        "doc_id LONG, split STRING",
    )
    pairs = spark.createDataFrame(
        [
            (1, 2, 0.6),   # train-val → drop train side (1)
            (2, 3, 0.7),   # val-test → audit-only, drop NEITHER
            (2, 4, 0.3),   # below LEAK threshold → ignored
        ],
        "id_a LONG, id_b LONG, jaccard DOUBLE",
    )
    kept = {r.doc_id for r in C.leakage_drop(docs_split, pairs).collect()}
    assert kept == {2, 3, 4}


def test_assign_split_matches_md5_convention(spark):
    d = _docs(spark, [(i, f"doc {i}") for i in range(120)])
    got = {r.doc_id: r.split for r in C.assign_split(d).collect()}
    assert got == {i: _md5_split(i) for i in range(120)}
    assert set(got.values()) == {"train", "val", "test"}


def test_decontaminate_eval_overlap(spark):
    shared = " ".join(f"ev{i}" for i in range(8))  # one 8-gram
    d_all = _docs(
        spark,
        [
            (29, shared + " tail tokens here"),        # eval doc (29 % 29 == 0)
            (1, "prefix words " + shared),             # shares the 8-gram → drop
            (2, " ".join(f"clean{i}" for i in range(12))),  # clean → keep
        ],
    )
    kept = {r.doc_id for r in C.decontaminate(d_all, d_all).collect()}
    assert kept == {2}  # 29 removed as eval, 1 dropped as contaminated


# ---------------------------------------------------------------------------
# the orchestrated DAG: run → skip-rerun → incremental, DAG ≡ run_funnel
# ---------------------------------------------------------------------------

def _land(spark, landing: str, name: str, df) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(landing, name))


def _funnel_table(tm) -> dict[str, int]:
    return {
        r.stage: r.n_docs for r in tm.read("curation.gold_funnel").collect()
    }


def _expected_counts(docs) -> dict[str, int]:
    f = C.run_funnel(docs, materialize_pairs=True)
    return {
        name: f[name].count()
        for name in (
            "ingest", "quality", "exact_dedup", "near_dup",
            "decontaminate", "leakage",
        )
    }


def test_curation_dag_end_to_end_skip_and_incremental(spark):
    landing = tempfile.mkdtemp(prefix="curation_land_")
    tm = TableManager(
        spark, tempfile.mkdtemp(prefix="curation_wh_"), backend="parquet"
    )
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    _land(spark, landing, "batch1", src.filter(F.col("doc_id") % 2 == 0))
    _land(spark, landing, "batch2", src.filter(F.col("doc_id") % 2 == 1))

    dag = C.curation_dag(spark, landing, tm, retries=0)
    rep = dag.run()
    assert rep.ok, rep.states()
    assert rep.states() == {
        "ingest": "success", "quality_filter": "success",
        "exact_dedup": "success", "near_dup_dedup": "success",
        "decontaminate": "success", "split_assign": "success",
        "leakage_drop": "success", "pack": "success",
        "gold_summary": "success",
    }
    assert rep.tasks["ingest"].result == {"new_files": 2}

    # DAG ≡ pure composition: the warehouse funnel equals run_funnel
    # over the same bronze rows, stage by stage
    funnel1 = _funnel_table(tm)
    assert funnel1 == _expected_counts(tm.read("curation.bronze_docs"))
    # and the gold summary equals the composed gold
    gold_tbl = {
        (r.lang, r.split): (r.n_docs, r.n_tokens)
        for r in tm.read("curation.gold_summary").collect()
    }
    gold_fn = {
        (r.lang, r.split): (r.n_docs, r.n_tokens)
        for r in C.run_funnel(
            tm.read("curation.bronze_docs"), materialize_pairs=True
        )["gold"].collect()
    }
    assert gold_tbl == gold_fn
    # every gold_corpus survivor carries a split, and no train survivor
    # near-dups a val/test survivor above the leak threshold (the drop
    # actually happened): re-deriving the drop set on the final corpus
    # must be empty
    final = tm.read("curation.gold_corpus")
    assert final.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    residual = C.leakage_drop(final, tm.read("curation.near_dup_pairs"))
    assert residual.count() == final.count()

    # pack stage: DAG table == pure composition, bins respect splits,
    # and per-(split, lang) packed token totals equal the gold summary
    packed_tbl = {
        r.doc_id: (r.split, r.lang, r.n_tok, r.bin)
        for r in tm.read("curation.gold_packed").collect()
    }
    packed_fn = {
        r.doc_id: (r.split, r.lang, r.n_tok, r.bin)
        for r in C.run_funnel(
            tm.read("curation.bronze_docs"), materialize_pairs=True
        )["packed"].collect()
    }
    assert packed_tbl == packed_fn
    import collections
    tot = collections.Counter()
    for split, lang, n_tok, _bin in packed_tbl.values():
        tot[(lang, split)] += n_tok
    assert dict(tot) == {k: v[1] for k, v in gold_tbl.items()}
    # within every (split, lang): bins are the contiguous cumsum
    # assignment (non-decreasing in doc_id order, starting at 0)
    bins = collections.defaultdict(list)
    for doc_id, (split, lang, n_tok, b) in sorted(packed_tbl.items()):
        bins[(split, lang)].append(b)
    for seq in bins.values():
        assert seq[0] == 0 and all(a <= b for a, b in zip(seq, seq[1:]))

    # idempotent re-run: ingest SKIPS on the file log, downstream
    # upstream-skips, tables untouched
    rep2 = C.curation_dag(spark, landing, tm, retries=0).run()
    assert rep2.ok
    assert rep2.states()["ingest"] == "skipped"
    assert set(rep2.states().values()) == {"skipped", "upstream_skipped"}
    assert _funnel_table(tm) == funnel1

    # incremental: one NEW landing file → only it is ingested, layers
    # recompute over the grown bronze
    extra = src.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    _land(spark, landing, "batch3", extra)
    rep3 = C.curation_dag(spark, landing, tm, retries=0).run()
    assert rep3.ok, rep3.states()
    assert rep3.tasks["ingest"].result == {"new_files": 1}
    funnel3 = _funnel_table(tm)
    assert funnel3["ingest"] == funnel1["ingest"] + extra.count()
    assert funnel3 == _expected_counts(tm.read("curation.bronze_docs"))
