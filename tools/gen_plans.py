"""Regenerate PLANS.md: formatted physical plans of the headline queries
with scale commentary. Run from the repo root: python tools/gen_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COMMENTARY = {
    "q1_pricing_summary": "Single scan → partial HashAggregate → 1 exchange on (returnflag, linestatus) → final aggregate. PushedFilters carries the shipdate bound; ReadSchema is pruned to the 7 used columns. At 100 TB: scan-bound, shuffle is |groups|×partitions.",
    "flagship_monthly_kpi": "lineitem collapses to ONE row per order (all group keys are order-level) before the orders join, so the former COUNT(DISTINCT)s are plain counts — NO Expand node (plan-guarded); one shuffle per side on orderkey, decimal partial sums keep the oracle hash identical.",
    "q6_forecast_revenue": "All four predicates in PushedFilters; projection pruned to 4 columns; map-side partial sum → 1-row exchange. The embarrassingly-parallel scan shape.",
    "q8_market_share": "Seven broadcast hash joins (every dimension), one shuffle join (lineitem ⋈ orders), one tiny groupBy. The fact table never moves except on orderkey.",
    "q18_large_volume_orders": "HAVING subquery aggregates lineitem once, then joins back on the SAME key — the Exchange is reused, and the key set (~23% of all orders) is deliberately NOT broadcast-hinted: a pinned broadcast of an SF-growing set is a driver OOM at scale; AQE may still demote to broadcast when the runtime size is genuinely small.",
    "dedup_minhash_lsh": "Shingle set is localCheckpoint'ed (3 consumer branches), signatures/bands/verify all reuse it; candidate join is on band_key buckets, never all-pairs.",
    "knn_bruteforce_cosine": "Corpus scans in place; the 10-query side broadcasts (BroadcastNestedLoopJoin); per-query top-k via window over partial ranks — corpus never shuffles.",
    "w1_dense_ids_scalable": "RangePartitioning + per-partition row_number + driver offsets: dense monotone ids with NO single-partition window (the reference's W1 anti-pattern, SURVEY §4.1). Shown here is the LAZY id plan (with_dense_id(materialize=False)); the default path executes exactly this plan and then eagerly localCheckpoints so its internal range-partition cache can be dropped before returning (r9 lifecycle fix), which collapses a later explain to Scan ExistingRDD.",
    "grouping_sets_explicit": "One scan → Expand (3 grouping sets) → two-phase aggregate: all subtotal granularities from a single pass.",
    "components_near_dup_clusters": "Iterative: edge set materialized once (localCheckpoint), then per-round join+min; lineage truncated per iteration so plan size is constant in rounds.",
    "mv_incremental_merge": "Two partial aggregations (base slice, delta slice) unioned and re-aggregated on the same key: the merge shuffles only per-key STATE rows (≤2 per key), never re-scanning base data — the incremental-refresh cost model is O(delta) + O(state).",
    "zorder_cluster_keys": "Morton key is pure integer bit arithmetic inside WholeStageCodegen (no UDF); one exchange on z_bucket. The write-side layout (repartitionByRange(z) + sortWithinPartitions) range-shuffles only the batch being written.",
    "multimodal_audio_frames": "Input pruned to (doc_id, text) before the ArrowEvalPython/mapInPandas node, so only 2 columns cross the JVM↔Python boundary; frame fan-out happens inside the Arrow batch, output streams back without a shuffle.",
    "timeseries_gapfill_rollup": "Hourly rollup shrinks events to |series|×|buckets| BEFORE the spine join; the generated spine is bucket-count-sized (independent of data volume) and the LOCF window partitions by series key — never a global-order window.",
    "dedup_fuzzy_levenshtein": "Two-pass equi join on (lang, 16-char block) keys — chars 1-16 and 17-32 — unioned and deduped; candidate pairs are Σ|bucket|² per pass, and bucket sizes track duplicate-cluster size, not corpus size (the 4-char single-pass key collapsed to ~300 buckets and went quadratic at sf1). Levenshtein runs post-join on bounded 40-char probes.",
    "cohort_retention_weekly": "distinct (user, week) grid collapses raw events first; cohort min and the retention count reuse user_id partitioning — raw events shuffle exactly once.",
    "profile_table_columns": "ONE aggregate computes every column's metrics (count/nulls/distincts/min/max); the per-column rows unpivot from the single state row — profiling cost does not scale with column count.",
    "stat_regression_per_type": "All six regression moments AND the builtin regr_slope audit in one partial/final HashAggregate pair over one scan — moments combine associatively across partitions, the canonical distributed-regression shape.",
    "array_hof_embedding_stats": "transform/filter/aggregate higher-order folds entirely inside WholeStageCodegen — no Python eval node anywhere; vec_id sampling predicate reaches the parquet scan.",
    "skew_salted_replicated_join": "Fact side salted 8 ways, dimension exploded 8×, equi-join on (key, salt): the deterministic skew-join alternative to AQE's runtime split; the aggregate collapses salt before the final group-by.",
    "pyds_synthetic_pushdown": "BatchScan over the Python data source: 8 range partitions generate Arrow batches worker-side; with spark.sql.python.filterPushdown.enabled the EqualTo predicate is claimed by the source (no Filter node re-applies it) so non-matching rows never cross the Python→JVM boundary.",
    "embedding_quantize_int8": "Cast array + per-vector min/max staged as real columns below the audit projection — as inline expressions the per-element lambda references made row cost O(d²); staged, the whole audit is one codegen'd map over the scan.",
    "dedup_line_level": "Documents explode into trimmed lines; ONE shuffle on the line key computes distinct-doc counts; the boilerplate score joins back on the same key. At 100 TB the shuffle key becomes xxhash64(line) and hot boilerplate lines are the AQE-split skew keys.",
    "setsim_prefix_filter_join": "Rarity-ordered prefix self-join (PPJoin): shingle document frequencies rank each doc's shingles, only the |x|−⌈τ·|x|⌉+1 rarest join; candidates length-filtered then verified EXACTLY against full sets. All equi joins on 60-bit hashed shingles — no cartesian pair enumeration anywhere (plan-guarded).",
    "quantiles_exact_distributed": "Exact global quantiles with NO global sort and NO single-reducer value map: O(log n) histogram-refinement scan jobs narrow each order statistic, a final sub-threshold collect reads the exact values; the query plan itself is scan + tiny groupBys only.",
    "arrow_batch_charstats": "Project prunes to (doc_id, text) BEFORE the ArrowEvalPython boundary; pyarrow compute kernels process RecordBatches directly — no pandas conversion, the lowest-overhead Python escape hatch.",
    "q21_waiting_suppliers": "Three passes over lineitem (multi-supplier keys, per-order max shipdate, blame join-back) all shuffle on the SAME l_orderkey key from ONE pruned 3-column scan — AQE reuses the exchange instead of re-scanning; supplier/orders joins stay equi, the final group-by is on s_name. No crossJoin, no global window.",
    "dup_ngram_doc_fraction": "Shingles become 8-byte md5-prefix keys BEFORE the distinct, so both shuffles (per-doc distinct, shingle df count) move longs not ~30-byte strings; the df table joins back on the same hash key (exchange reuse) and the per-doc rollup is a partial-aggregated groupBy. Cost tracks Σ shingles, linear in corpus size — the steepest sf1→sf5 slope in SCALE.md but measured linear warm.",
    "approx_count_distinct_hll_sketch_only": "The 100 TB cardinality plan: ONE partial/final aggregate pair over the scan where the only distinct computation is the fixed-size HLL sketch buffer — no exact countDistinct branch, no Expand (plan-guarded). The audited sibling query pays the exact key shuffle on purpose as a gate; this is the plan you run.",
    "dedup_minhash_incremental": "Incremental near-dup: only the NEW batch's bands (deterministic ~10% slice) probe the full band index via an equi join on band_key — candidate volume ∝ |batch| × avg bucket, never corpus². The band index is the persistable artifact (lsh_bands); at 100 TB it lives as a bucketed table and each arriving batch appends its own bands after probing. Verify join is candidate-bounded.",
    "bloom_runtime_filter_join": "InjectRuntimeFilter in action for the too-big-to-broadcast SMJ: bloom_filter_agg builds from the 2-brand part subset, might_contain(xxhash64(l_partkey)) pre-filters the lineitem scan BEFORE its shuffle — shuffle volume tracks join OUTPUT, not fact size. Thresholds relaxed only during this query's planning (plan pinned, confs restored).",
    "knn_pq_adc": "PQ-ADC scan: corpus reduced to 8 codeword ids per vector by a shuffle-free Arrow encode (ArrowEvalPython over a codes-only projection); the 10-query side broadcasts onto the codes (BroadcastNestedLoopJoin), ADC distances come from codes + closure codebook, and the only hash exchange is the per-query top-k window. Raw corpus vectors are never read after encoding — at 100 TB the scan working set is ~32× smaller than the embeddings.",
}


def main() -> None:
    from lakehouse_v3_spark.plans import load_all
    from lakehouse_v3_spark.session import get_spark

    spark = get_spark(app_name="plans", master="local[8]", shuffle_partitions=8)
    reg = load_all()
    out = [
        "# PLANS — physical plans of headline queries (sf0.001, local[8], AQE on)",
        "",
        "Regenerated by `python tools/gen_plans.py`. Each plan is the one the",
        "query is DESIGNED to produce; tests/test_explain_plans.py asserts the",
        "load-bearing properties so they cannot silently regress.",
        "",
    ]
    def _w1_lazy_plan(spark, sf_dir):
        # the id plan BEFORE the default path's eager localCheckpoint
        from lakehouse_v3_spark.ids import with_dense_id

        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        return with_dense_id(
            o, ["o_orderkey"], id_col="cd_id", materialize=False
        ).select("cd_id", "o_orderkey")

    overrides = {"w1_dense_ids_scalable": _w1_lazy_plan}

    for name, note in COMMENTARY.items():
        df = overrides.get(name, reg[name].fn)(spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        lines = buf.getvalue().splitlines()
        tree_end = next((i for i, l in enumerate(lines) if l.strip() == ""), len(lines))
        out += [f"## {name}", "", note, "", "```", "\n".join(lines[:tree_end]), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()
    print("PLANS.md regenerated")


if __name__ == "__main__":
    main()
