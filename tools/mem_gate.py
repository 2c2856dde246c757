"""Memory-pressure gate (r4 verdict item #6): prove the expensive
queries hold at sf5 under a CONSTRAINED driver — 8 g heap instead of
the 48 g all other scale numbers ran with — so any hidden driver-side
materialization (uncapped collect, pandas concat, unbounded broadcast)
OOMs loudly instead of hiding inside a huge heap.

Runs the top-N most expensive sf5 queries (by the sf5 gate's measured
Spark wall time) in ONE constrained session, recording per query:

- wall seconds and result row count (compared against the sf5 gate's
  recorded count — same fixture, deterministic queries, so a mismatch
  means the constrained run degraded correctness, not just speed);
- peak JVM heap used (executor peakMemoryMetrics JVMHeapMemory via the
  status REST API — local mode: the one JVM hosts driver+executors);
- shuffle spill (memory/disk bytes) summed over the run's stages.

Usage:
  python tools/mem_gate.py --sf-dir /root/repo/testdata/sf5 \
      [--driver-mem 8g] [--top N] [--out /tmp/memgate.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

# sf5 wall-clock ranking from GATE_sf5.jsonl (regenerated each round);
# hardcoding the *selection* keeps the gate list stable and reviewable
DEFAULT_QUERIES = [
    "dup_ngram_doc_fraction",
    "setsim_prefix_filter_join",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "approx_count_distinct_hll",
    "components_near_dup_clusters",
    "decontaminate_ngram_overlap",
    "text_repetition_ratio",
    "knn_ivf_recall_audit",
    "text_fingerprint",
    "embedding_near_dup",
    "stream_tws_distinct_type_counts",
]


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def peak_jvm_heap(spark) -> int | None:
    """Peak heap = Σ per-pool getPeakUsage over the HEAP memory pools
    (java.lang.management) — exact since JVM start, no dependency on
    the 10 s executor-heartbeat metric polling that makes the REST
    peakMemoryMetrics read 0 for sub-interval queries. Local mode:
    the one JVM hosts driver + all executor threads, which is exactly
    the heap the gate constrains."""
    try:
        jvm = spark.sparkContext._jvm
        mf = jvm.java.lang.management.ManagementFactory
        total = 0
        it = mf.getMemoryPoolMXBeans().iterator()
        while it.hasNext():
            pool = it.next()
            if pool.getType().toString() == "Heap memory":
                total += pool.getPeakUsage().getUsed()
        return total or None
    except Exception:
        return None


def reset_peak_heap(spark) -> None:
    """Zero the per-pool peak counters so each query's record is its
    own peak, not the max-so-far of the session."""
    try:
        jvm = spark.sparkContext._jvm
        it = (
            jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
            .iterator()
        )
        while it.hasNext():
            it.next().resetPeakUsage()
    except Exception:
        pass


def spill_totals(spark) -> tuple[int, int]:
    try:
        stages = _rest(spark, "/stages?status=complete")
        return (
            sum(s.get("memoryBytesSpilled", 0) for s in stages),
            sum(s.get("diskBytesSpilled", 0) for s in stages),
        )
    except Exception:
        return (0, 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/testdata/sf5")
    ap.add_argument("--driver-mem", default="8g")
    ap.add_argument("--top", type=int, default=len(DEFAULT_QUERIES))
    ap.add_argument("--out", default="/tmp/memgate.jsonl")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument(
        "--queries",
        default="",
        help="comma-separated override of the query list (default: the "
        "hardcoded most-expensive-at-sf5 selection)",
    )
    args = ap.parse_args()

    from lakehouse_v3_spark.plans import load_all
    from lakehouse_v3_spark.session import get_spark

    spark = get_spark(
        app_name="mem-gate",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        driver_memory=args.driver_mem,
        # the gate reads peakMemoryMetrics/spill off the status REST
        # API, which rides on the UI server (get_spark disables it)
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    heap_limit = spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    print(f"JVM maxMemory: {heap_limit / 2**30:.2f} GiB", flush=True)

    results = []
    with open(args.out, "a") as out:
        names = (
            [q for q in args.queries.split(",") if q]
            or DEFAULT_QUERIES[: args.top]
        )
        for name in names:
            qd = registry[name]
            rec = {"name": name, "driver_mem": args.driver_mem}
            reset_peak_heap(spark)
            sp0 = spill_totals(spark)
            t0 = time.monotonic()
            try:
                # full materialization (noop sink, same as bench.py) —
                # count() would let column pruning hide wide-row memory
                df = qd.fn(spark, args.sf_dir)
                n = df.count()
                df.write.mode("overwrite").format("noop").save()
                rec["rows"] = n
                rec["sec"] = round(time.monotonic() - t0, 2)
            except Exception as exc:
                rec["error"] = str(exc)[:400]
                rec["sec"] = round(time.monotonic() - t0, 2)
            sp1 = spill_totals(spark)
            rec["peak_jvm_heap_gib"] = (
                round(peak_jvm_heap(spark) / 2**30, 2)
                if peak_jvm_heap(spark)
                else None
            )
            rec["spill_mem_mib"] = round((sp1[0] - sp0[0]) / 2**20, 1)
            rec["spill_disk_mib"] = round((sp1[1] - sp0[1]) / 2**20, 1)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(rec, flush=True)
            results.append(rec)

    n_err = sum(1 for r in results if "error" in r)
    print(f"done: {len(results)} queries, {n_err} errors", flush=True)
    sys.exit(1 if n_err else 0)


if __name__ == "__main__":
    main()
