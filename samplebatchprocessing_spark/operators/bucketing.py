"""Bucketed-table layout for co-located fact-fact joins.

At 100 TB the expensive joins are fact x fact (orders x lineitem):
both sides shuffle on the key every query.  Writing both tables
bucketed BY that key with the same bucket count makes the join
shuffle-free forever after — Spark reads matching buckets
pair-wise (SortMergeJoin with no Exchange).  This module is the
engine's bucketing surface plus a verification helper; the plan
property (no Exchange under the join) is asserted in
tests/test_plans.py.

The reference has no analog (its unit of locality is the whole file,
SURVEY §1A); this is the Spark-native upgrade path called out in
SCALE.md.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 8) -> None:
    """Persist ``df`` as a bucketed+sorted managed table keyed for
    co-located joins.  Overwrites any previous layout, including a
    stale on-disk location left by a session that dropped the table
    from the metastore only."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    wh = urlparse(spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse")).path
    shutil.rmtree(f"{wh}/{table_name}", ignore_errors=True)
    (df.write.bucketBy(n_buckets, key).sortBy(key)
     .mode("overwrite").saveAsTable(table_name))


def cogrouped_join(spark: SparkSession, left_table: str,
                   right_table: str, left_key: str,
                   right_key: str) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys —
    plans as a zero-shuffle sort-merge join."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
