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
    """Back-compat alias — the shared helper lives in tests/_plan_utils
    (ADVICE r12: a `from conftest import` breaks under
    importmode=importlib)."""
    from _plan_utils import df_plan as _df_plan

    return _df_plan(spark, df)
