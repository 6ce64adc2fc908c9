"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over ``samplebatchprocessing_spark.queries.registry``:
- ``entry(spark)`` runs the flagship TPC-H-Q1-style pricing summary
  at sf0.001,
- ``queries()`` exposes every implemented SURVEY §2B operator as a
  (spark, sf_dir) -> DataFrame callable,
- ``oracle_sql()`` exposes the DuckDB twin for each oracle-checked
  query (property/parity ops are omitted -> rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from samplebatchprocessing_spark.queries import registry as _registry  # noqa: E402

_REG = None


def _reg():
    global _REG
    if _REG is None:
        _REG = _registry()
    return _REG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from samplebatchprocessing_spark.queries.relational import a1_pricing_summary
    from samplebatchprocessing_spark.session import apply_engine_conf
    apply_engine_conf(spark)
    return a1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in _reg().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checked query."""
    return {name: sql for name, (_fn, sql) in _reg().items() if sql is not None}
