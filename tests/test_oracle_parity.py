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
