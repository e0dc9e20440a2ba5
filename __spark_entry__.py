"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC replay at sf0.001;
``queries()`` / ``oracle_sql()`` — one entry per implemented operator,
cross-checked against DuckDB at sf0.01 (see
data_migration_validation_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_migration_validation_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive a CDC change stream from sf0.001 documents, replay
    it through the apply engine (epoch-keyed commits, LWW merge, Arrow
    text extraction), return the final materialized state."""
    # the plain replay, not the registry's twin-checked slot (which also
    # runs the audited and group-commit replays, cross-asserted — the
    # driver's queries() gate covers those; the smoke check only needs
    # the flagship once)
    from data_migration_validation_spark.queries import cdc_final_state

    return cdc_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
