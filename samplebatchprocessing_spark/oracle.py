"""Local DuckDB-oracle parity harness — replicates the driver's
correctness gate (__spark_entry__ docstring): run the Spark query and
the oracle SQL side by side, compare row count, column names, and an
order-insensitive multiset of canonicalized values.

Exact equality is the target: queries are engineered (exprs.py) so
matching here implies matching under ANY deterministic downstream
canonicalization/hash.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter
from decimal import Decimal

import duckdb

from .catalog import TABLES, table_path

_NAN = object()


def duck_conn(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return conn


def canon(v):
    """Normalize a cell value for cross-engine comparison.

    Floats canonicalize through the driver's ``%.6f`` formatting so an
    int-vs-double output-type divergence (e.g. Spark FLOOR -> LONG vs
    DuckDB FLOOR -> DOUBLE) FAILS here the same way it fails at the
    driver — Python's ``946 == 946.0`` must not mask it (VERDICT r1
    root cause for f3/f7)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return _NAN
        return f"{v + 0.0:.6f}"  # -0.0 -> 0.0; "946.000000" != int 946
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def rows_to_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    """Return a diff report; report['ok'] is the gate."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    # Queries over raw file paths (L9/P8/P10/mm* read_blob) hardcode
    # the driver's sf0.01 dir in their SQL (the driver's oracle_sql()
    # interface is a static string and it always runs at sf0.01);
    # retarget ANY sf literal for local runs at other scale factors.
    import re
    oracle_sql = re.sub(r"/root/testdata/sf[0-9.]+",
                        sf_dir.rstrip("/"), oracle_sql)

    conn = duck_conn(sf_dir)
    try:
        cur = conn.execute(oracle_sql)
        d_cols = [d[0] for d in cur.description]
        d_rows = cur.fetchall()
    finally:
        conn.close()

    report: dict = {
        "ok": False,
        "spark_rows": len(s_rows), "oracle_rows": len(d_rows),
        "spark_cols": sorted(s_cols), "oracle_cols": sorted(d_cols),
    }
    if sorted(s_cols) != sorted(d_cols):
        report["error"] = "column mismatch"
        return report
    if len(s_rows) != len(d_rows):
        report["error"] = "row count mismatch"
    sm = rows_to_multiset(s_cols, s_rows)
    dm = rows_to_multiset(d_cols, d_rows)
    if sm == dm:
        report["ok"] = "error" not in report
        return report
    only_s = list((sm - dm).items())[:5]
    only_d = list((dm - sm).items())[:5]
    report["error"] = report.get("error", "value mismatch")
    report["only_in_spark"] = [str(x) for x in only_s]
    report["only_in_oracle"] = [str(x) for x in only_d]
    return report
