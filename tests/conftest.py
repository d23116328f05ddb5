from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jobinsight_data_pipeline_v2_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # micro-data tests: 1 shuffle partition kills per-stage overhead
    s = get_spark("tests", master="local[4]", shuffle_partitions=1)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def df_plan(spark, df) -> str:
    """Formatted physical plan of an arbitrary DataFrame — the shared
    explain helper for plan-assertion tests (review r12: three inline
    copies of the ExplainMode dance)."""
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(fmt)
