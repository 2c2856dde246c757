"""Measure skew mitigation on a zipf-skewed fixture (gen_sf.py --skew zipf).

Times three plans of the same lineitem ⋈ part join + brand rollup on a
fixture with two ~20% hot part keys: key 0 is PLANTED by
gen_sf._skewed_partkeys (hot_frac=0.2 of all rows), and key 1 emerges
from the zipf(1.3) tail head (0.8 × P(z=1) ≈ 0.8/ζ(1.3) ≈ 0.20 —
measured 0.2034 / 0.2001 at sf1). hot_shares below reports the top-2
keys to cover both:

  plain_no_aqe   — shuffle sort-merge join, AQE skew-join split OFF:
                   the straggler baseline (one reducer gets ~20% of the
                   fact table).
  plain_aqe      — same plan, AQE skew-join split ON (the runtime fix).
  salted         — explicit 8-way salting + replicated dimension
                   (operators/skew.py salted_join_hot_keys): the
                   deterministic fix for engines/configs without AQE.

Broadcast is disabled throughout (autoBroadcastJoinThreshold=-1): at
100 TB the dimension side of a skewed join generally does NOT fit in
memory — broadcasting would sidestep the skew instead of handling it.

Each variant runs once warm (codegen/file listing) and once timed
(noop write). Result row counts are cross-checked, and both registered
skew queries are oracle-verified against DuckDB on the SAME skewed
fixture. Prints one JSON line; paste the table into SCALE.md.

Usage: python tools/skew_bench.py --sf-dir /root/repo/testdata/sf1_skew
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakehouse_v3_spark.io_utils import load
    from lakehouse_v3_spark.operators.skew import salted_join_hot_keys
    from lakehouse_v3_spark.oracle_harness import check_query
    from lakehouse_v3_spark.session import get_spark

    spark = get_spark(
        app_name="skew-bench",
        master=os.environ.get("SPARK_GRAFT_MASTER", f"local[{args.cpus}]"),
        shuffle_partitions=int(args.cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def fact():
        return load(spark, args.sf_dir, "lineitem").select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )

    def dim():
        return load(spark, args.sf_dir, "part").select("p_partkey", "p_brand")

    def rollup(joined):
        return joined.groupBy("p_brand").agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("rev").cast("decimal(30,6)")).cast("double").alias("revenue"),
        )

    def plain():
        return rollup(fact().join(dim(), on="p_partkey"))

    def salted():
        return rollup(salted_join_hot_keys(fact(), dim(), "p_partkey", n_salts=8))

    def timed(build, skew_aqe: bool) -> tuple[float, int]:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_aqe).lower())
        try:
            build().write.mode("overwrite").format("noop").save()  # warm
            t0 = time.monotonic()
            build().write.mode("overwrite").format("noop").save()
            wall = time.monotonic() - t0
            n = build().count()
            return round(wall, 2), n
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    results = {}
    results["plain_no_aqe"], n1 = timed(plain, skew_aqe=False)
    results["plain_aqe"], n2 = timed(plain, skew_aqe=True)
    results["salted"], n3 = timed(salted, skew_aqe=False)
    assert n1 == n2 == n3, (n1, n2, n3)

    # key-share diagnostics for the record
    top = (
        fact()
        .groupBy("p_partkey")
        .count()
        .orderBy(F.desc("count"))
        .limit(2)
        .collect()
    )
    total = fact().count()
    hot_shares = [round(r["count"] / total, 4) for r in top]

    # oracle parity of the REGISTERED skew queries on the skewed fixture
    parity = {}
    for qname in ("skew_salted_hot_key_agg", "skew_salted_replicated_join"):
        errs = check_query(qname, spark, args.sf_dir)
        parity[qname] = "match" if not errs else f"MISMATCH: {errs[:2]}"

    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "hot_key_shares": hot_shares,
                "n_result_groups": n1,
                "wall_sec": results,
                "oracle_parity": parity,
            }
        )
    )


if __name__ == "__main__":
    main()
