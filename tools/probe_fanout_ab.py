"""A/B probe: time a query variant with and without the scan fan-out,
interleaved A,B,B,A within ONE Spark session, so host drift hits both
arms equally. Not part of the bench contract — a measurement tool.

Usage: python tools/probe_fanout_ab.py <query> [reps]
Supported: bpe_train | winnow | bpe_encode
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    which = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from lakehouse_v3_spark.session import get_spark

    spark = get_spark(
        app_name="fanout-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        driver_memory="48g",
    )

    import lakehouse_v3_spark.partitioning as P
    from lakehouse_v3_spark.plans import load_all

    registry = load_all()
    name = {
        "bpe_train": "bpe_train_merges",
        "winnow": "winnow_fingerprint_overlap",
        "bpe_encode": "bpe_encode_corpus",
        "span": "dedup_span_removal",
        "dupfrac": "dup_ngram_doc_fraction",
    }.get(which, which)
    fn = registry[name].fn

    real_fan_out = P.fan_out_scan

    # the plan modules bind fan_out_scan at import (from..import as) —
    # patch the consuming module's binding, not the defining module's
    import importlib

    mod = importlib.import_module(fn.__module__)
    binding = next(
        n for n, v in vars(mod).items()
        if getattr(v, "__name__", "") == "fan_out_scan"
    )

    def run(arm: str) -> float:
        setattr(
            mod,
            binding,
            real_fan_out if arm == "fan" else (lambda df, *k: df),
        )
        spark.sparkContext.setJobDescription(f"{name}[{arm}]")
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        import gc

        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        return round(dt, 3)

    # warm both arms once (codegen, listing)
    run("fan"), run("off")
    res = {"fan": [], "off": []}
    for _ in range(reps):
        res["fan"].append(run("fan"))
        res["off"].append(run("off"))
        res["off"].append(run("off"))
        res["fan"].append(run("fan"))
    setattr(mod, binding, real_fan_out)
    print({k: (min(v), sorted(v)) for k, v in res.items()})
    spark.stop()


if __name__ == "__main__":
    main()
