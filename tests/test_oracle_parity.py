"""Mirror of the driver's t2 gate: every registered query vs its DuckDB
oracle at sf0.001 (fast; the driver uses sf0.01)."""

from __future__ import annotations

import pytest

from lakehouse_v3_spark.oracle_harness import check_query
from lakehouse_v3_spark.plans import load_all

NAMES = sorted(load_all().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, sf_dir):
    errors = check_query(name, spark, sf_dir)
    assert not errors, f"{name}: " + "; ".join(errors)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())


SF_ORACLE_NAMES = sorted(
    n for n, qd in load_all().items() if qd.sf_oracle is not None
)


@pytest.mark.parametrize("name", SF_ORACLE_NAMES)
def test_sf_oracle_equivalent_to_primary(name):
    """Every tractable-big-SF oracle reformulation (QueryDef.sf_oracle)
    must produce IDENTICAL results to the primary (most-independent)
    oracle where both run — compared at sf0.01 with the same
    order-insensitive value comparison the gates use. This is what lets
    the sf1/sf5 gates swap in the fast formulation without weakening
    the correctness claim."""
    import duckdb

    from lakehouse_v3_spark.io_utils import TABLES
    from lakehouse_v3_spark.oracle_harness import compare_frames, run_oracle

    qd = load_all()[name]
    sf = "/root/testdata/sf0.01"
    primary = run_oracle(qd.oracle, sf)
    if callable(qd.sf_oracle):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        fast = qd.sf_oracle(con, sf)
        con.close()
    else:
        fast = run_oracle(qd.sf_oracle, sf)
    errs = compare_frames(fast, primary, rtol=qd.rtol)
    assert not errs, f"{name}: " + "; ".join(errs)
