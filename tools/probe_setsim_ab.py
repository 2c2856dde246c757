"""A/B probe for _setsim_join variants, interleaved within ONE Spark
session so host drift hits all arms equally. Not part of the bench
contract — a measurement tool.

Arms:
  ckpt — fan_out_scan + localCheckpoint(sets)   (r14 candidate)
  fan  — fan_out_scan, no checkpoint            (r13 shape)
  off  — no fan-out, no checkpoint              (r12 shape)

Usage: SPARK_GRAFT_CPUS=32 python tools/probe_setsim_ab.py [query] [reps]
query defaults to setsim_prefix_filter_join; also accepts
setsim_prefix_filter_join_block.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "setsim_prefix_filter_join"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from lakehouse_v3_spark.session import get_spark

    spark = get_spark(
        app_name="setsim-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    )

    import lakehouse_v3_spark.plans.dedup_queries as DQ
    from lakehouse_v3_spark.plans import load_all

    registry = load_all()
    fn = registry[name].fn
    real_fan_out = DQ.fan_out_scan
    real_join = DQ._setsim_join

    def run(arm: str) -> float:
        DQ.fan_out_scan = (
            real_fan_out if arm in ("ckpt", "fan") else (lambda df, *k: df)
        )
        DQ._setsim_join = lambda d, **kw: real_join(
            d, checkpoint=(arm == "ckpt"), fan=(arm in ("ckpt", "fan"))
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

    arms = ["ckpt", "fan", "off"]
    for a in arms:  # warm: codegen, listing
        run(a)
    res = {a: [] for a in arms}
    for _ in range(reps):
        for a in arms:
            res[a].append(run(a))
        for a in reversed(arms):
            res[a].append(run(a))
    DQ.fan_out_scan = real_fan_out
    DQ._setsim_join = real_join
    print({"cpus": cpus, **{k: (min(v), sorted(v)) for k, v in res.items()}})
    spark.stop()


if __name__ == "__main__":
    main()
