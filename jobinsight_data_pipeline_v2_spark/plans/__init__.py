"""Query plans: the engine's declared query surface.

``REGISTRY`` maps query name → (spark_fn, oracle_sql | None); the
driver contract (__spark_entry__.py) is generated from it. Each module
covers one slice of SURVEY.md §2's operator inventory re-expressed over
the driver's testdata star schema, plus the net-new training-data
operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql or None)
REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, tuple[SparkQuery, str | None]]:
    """Import every plan module so its @register calls run."""
    from . import core, curation, events, sampling, text, vectors  # noqa: F401

    return REGISTRY
