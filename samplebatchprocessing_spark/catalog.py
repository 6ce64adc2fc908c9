"""Fixture catalog: load the driver-generated parquet tables.

Mirrors the reference's "input dataset = S3 prefix of files"
(SendJobs.py:16-28) as "table = parquet path"; at cluster scale the
same code reads ``s3a://bucket/prefix`` — Spark's DataSource V2 +
the S3A committer replace the reference's boto put/get per file
(GetJobs.py:48-60).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """P1: parquet scan. Columnar, predicate-pushdown, split by row
    group — one task per ~128MB at scale via
    spark.sql.files.maxPartitionBytes.

    ``events.ts`` is TIMESTAMP(NANOS) in the fixture parquet, which
    Spark rejects ([PARQUET_TYPE_ILLEGAL]); we read nanos as long and
    rebuild a µs timestamp (the fixture is µs-aligned, and DuckDB's
    TIMESTAMP_NS -> TIMESTAMP cast truncates identically).
    """
    # Pin UTC on whatever session we were handed — timestamp->date
    # extraction and literals are session-tz-dependent in Spark but
    # naive-UTC in DuckDB (the oracle).  Runtime-settable, idempotent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # and make worker-side closures importable (external drivers)
    from .session import ship_package
    ship_package(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (SQL entry point)."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
