"""Per-stage wall-clock decomposition of the curation catalog trio
(guide §1: isolate each expensive query with the noop sink before
changing it). Times each funnel stage's noop materialization separately
AND the construction-time cost (Lloyd training / localCheckpoints run
when run_funnel is CALLED).

Usage: python tools/probe_curation.py [embed|text|counts]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def noop(df) -> float:
    t0 = time.monotonic()
    df.write.mode("overwrite").format("noop").save()
    return time.monotonic() - t0


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "embed"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from lakehouse_v3_spark.io_utils import load
    from lakehouse_v3_spark.pipelines.curation import run_funnel
    from lakehouse_v3_spark.session import get_spark

    spark = get_spark(
        app_name="probe-curation",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    sc = spark.sparkContext

    # warmup: run the whole thing once so codegen/file-listing is paid
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    emb = load(spark, sf_dir, "embeddings") if mode == "embed" else None
    f = run_funnel(docs, materialize_pairs=True, embeddings=emb)
    noop(f["gold"])

    # measured pass
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    t0 = time.monotonic()
    sc.setJobDescription("construct run_funnel (training + checkpoints)")
    f = run_funnel(docs, materialize_pairs=True, embeddings=emb)
    t_construct = time.monotonic() - t0
    print(f"construct(run_funnel incl. pairs ckpt + lloyd): {t_construct:.2f}s")

    if mode == "counts":
        for name in ("ingest", "quality", "exact_dedup", "near_dup",
                     "decontaminate", "leakage"):
            sc.setJobDescription(f"count {name}")
            t0 = time.monotonic()
            n = f[name].count()
            print(f"count {name}: {time.monotonic() - t0:.2f}s  ({n} rows)")
    else:
        stages = ["near_dup", "decontaminate", "leakage", "gold"]
        if mode == "embed":
            stages = ["semantic"] + stages
        for name in stages:
            sc.setJobDescription(f"noop {name}")
            t = noop(f[name])
            print(f"noop {name}: {t:.2f}s")

    spark.stop()


if __name__ == "__main__":
    main()
