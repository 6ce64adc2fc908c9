"""Declared query registry, keyed by SURVEY.md §2B operator ids.

Each entry: name -> (spark_fn, oracle_sql_or_None) where
``spark_fn(spark, sf_dir) -> DataFrame`` and the SQL twin is ANSI SQL
runnable by DuckDB over the pre-registered fixture views.  Entries
with ``None`` oracle are property/parity-checked ops (sketches,
streaming internals) that get the driver's rows-only check.

Determinism contract (SURVEY §2B canonicalization): every output
column is int/str/bool/date/exact-double/array-thereof; all summing
aggregates use exact decimal arithmetic (see ``exprs``); every
LIMIT/window ordering carries a total-order tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]
Entry = tuple[SparkFn, str | None]


def registry() -> dict[str, Entry]:
    from . import (analytics, llm, relational, scalar_funcs, sources,
                   sqlapi, streaming, udf)

    out: dict[str, Entry] = {}
    for mod in (relational, scalar_funcs, llm, udf, sources, streaming,
                sqlapi, analytics):
        for name, entry in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = entry
    return out
