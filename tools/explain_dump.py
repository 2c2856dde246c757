"""Dump .explain("formatted") for named catalog queries to files.

Usage: python tools/explain_dump.py <outdir> <suffix> q1 q2 ...
Writes <outdir>/<query>_<suffix>.txt for each query.

Queries whose builder EXECUTES work at construction (streaming drains,
iterative trainers) still produce a plan for the RETURNED frame; the
construction-time jobs are what their bench time measures, so for those
the dump is annotated.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from lakehouse_v3_spark.plans import load_all
    from lakehouse_v3_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="explain-dump",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    registry = load_all()
    for name in names:
        qd = registry[name]
        try:
            df = qd.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
