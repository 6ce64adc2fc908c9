"""t2 gate, run locally: every registry query with an oracle twin
must match DuckDB exactly (rows, columns, values) on the fixtures.

Default scale: sf0.001 (fast). Set SBP_SF_ORACLE=/root/testdata/sf0.01
to replicate the driver's exact gate scale.
"""

from __future__ import annotations

import pytest

from samplebatchprocessing_spark.oracle import compare
from samplebatchprocessing_spark.queries import registry

REG = registry()
ORACLE_QUERIES = sorted(n for n, (_, sql) in REG.items() if sql is not None)
NO_ORACLE = sorted(n for n, (_, sql) in REG.items() if sql is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_oracle, name):
    fn, sql = REG[name]
    report = compare(fn(spark, sf_oracle), sql, sf_oracle)
    assert report["ok"], f"{name}: {report}"


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(spark, sf_oracle, name):
    fn, _ = REG[name]
    df = fn(spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.columns) > 0
