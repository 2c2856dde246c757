"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def materialize(df) -> int:
    """Force full execution without collecting rows to the driver."""
    try:
        df.write.mode("overwrite").format("noop").save()
        return -1
    except Exception:
        return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from lakehouse_v3_spark.plans import load_all
    from lakehouse_v3_spark.session import get_spark

    # SPARK_GRAFT_MASTER overrides (e.g. spark://127.0.0.1:7077 for the
    # multi-process standalone-cluster evidence runs); default stays
    # local[cpus] for the driver's per-round bench.
    spark = get_spark(
        app_name="lakehouse_v3_spark-bench",
        master=os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"),
        shuffle_partitions=int(cpus),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    )
    registry = load_all()
    # SPARK_GRAFT_ONLY=a,b,c limits the run to named queries (used by
    # the sf10 steep-tail scale runs, where the full catalog would take
    # hours); the driver's per-round bench never sets it.
    only = {
        s for s in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if s
    }
    if only:
        registry = {k: v for k, v in registry.items() if k in only}

    import gc

    timings: dict[str, float] = {}
    for name in sorted(registry):
        qd = registry[name]
        try:
            # warmup run amortizes codegen/janino compile + file-listing
            # (one-time costs that at cluster scale are noise but at
            # sf0.1 dominate and vary ±10×); report the steady-state run
            materialize(qd.fn(spark, sf_dir))
            t0 = time.monotonic()
            materialize(qd.fn(spark, sf_dir))
            timings[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)
        # drop this query's catalog-cached blocks; localCheckpoint RDD
        # blocks (dedup_minhash_lsh, connected_components) are NOT in the
        # catalog cache — python gc.collect() queues the py4j detach for
        # their JVM handles, and the explicit JVM System.gc() makes the
        # ContextCleaner actually process them NOW instead of whenever
        # heap pressure forces it (left to chance, later queries absorb
        # this query's block-eviction churn: observed 2s → 11s swings on
        # dedup_simhash between otherwise idle runs)
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # "queries" first and the headline metric/value LAST: downstream tooling
    # that keeps only the tail of the line still sees the summary fields;
    # compact separators fit more per-query timings in any truncated view.
    print(
        json.dumps(
            {
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
                "unit": "sec",
                "metric": "total_declared_query_wall_clock",
                "value": total,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
