"""Shared plan-capture helper for plan-assertion tests.

Lives in its own plain module (ADVICE r12): importing ``conftest`` as a
module works only under pytest's default rootdir import mode and breaks
under ``importmode=importlib`` or if tests ever gain a package
``__init__``; a named sibling module is import-mode-proof.
"""

from __future__ import annotations


def df_plan(spark, df) -> str:
    """Formatted physical plan of an arbitrary DataFrame — the shared
    explain helper for plan-assertion tests (review r12: three inline
    copies of the ExplainMode dance)."""
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(fmt)
