"""Data-layout operators: the 100 TB concerns the reference never
had to face (its objects were opaque blobs) but any Spark-native
successor does — file skipping via sort order, and small-file
compaction.

- **Sorted write + min/max skipping**: parquet stores per-row-group
  min/max statistics; writing a table sorted (repartitionByRange +
  sortWithinPartitions) on its hottest filter key makes a selective
  predicate skip whole row groups / files at scan time.  At 100 TB
  this is the difference between touching every file and touching
  the ~1/RANGE_FRACTION that can match.
- **Compaction**: streaming/per-file pipelines (P8/P10) produce many
  small objects; scans then pay one task + one open per file.
  Compaction bin-packs them to a target file size with one
  repartition — the standard maintenance pass between ingest and
  query.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sorted_write(df: DataFrame, path: str, sort_col: str,
                 n_files: int | None = None) -> None:
    """Write ``df`` range-partitioned and sorted by ``sort_col`` so
    every output file covers a narrow, non-overlapping key range —
    the layout that makes parquet min/max statistics actually prune.
    (A plain ``.sort().write`` can collapse to fewer tasks; the
    explicit repartitionByRange keeps file count and ranges stable.)"""
    out = df.repartitionByRange(n_files or 8, F.col(sort_col)) \
            .sortWithinPartitions(sort_col)
    out.write.mode("overwrite").parquet(path)


def compact_prefix(spark: SparkSession, src_dir: str, dst_dir: str,
                   target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Small-file compaction: rewrite a parquet prefix into
    ceil(total_bytes / target_bytes) files.  Returns a 1-row report
    (files_before, files_after, rows) for auditing; the data itself
    is byte-equivalent (same rows, new layout).  The file count comes
    from the filesystem listing, not a second data scan."""
    sizes = [os.path.getsize(os.path.join(src_dir, f))
             for f in os.listdir(src_dir)
             if f.endswith(".parquet")]
    files_before = len(sizes)
    n_out = max(1, math.ceil(sum(sizes) / target_bytes))
    df = spark.read.parquet(src_dir)
    df.repartition(n_out).write.mode("overwrite").parquet(dst_dir)
    files_after = sum(1 for f in os.listdir(dst_dir)
                      if f.endswith(".parquet"))
    rows = spark.read.parquet(dst_dir).count()
    from ..exprs import local_df
    return local_df(
        spark,
        [(files_before, files_after, rows)],
        "files_before int, files_after int, rows long")
