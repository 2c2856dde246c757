from __future__ import annotations

import os
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


@pytest.fixture(scope="session")
def spark():
    from lakehouse_v3_spark.session import get_spark

    import tempfile

    spark = get_spark(
        app_name="lakehouse_v3_spark-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"),
        shuffle_partitions=8,
        driver_memory=os.environ.get("SPARK_GRAFT_TEST_DRIVER_MEM", "8g"),
        extra_conf={
            # keep saveAsTable/bucketing tests out of the repo dir
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
