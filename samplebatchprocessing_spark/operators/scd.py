"""CDC / SCD merge emulation (no Delta/Iceberg in this image — the
MERGE INTO pattern is rebuilt from stock relational ops, per the
public 'emulate MERGE with anti-join + union' recipe).

upsert(current, updates, key): updates win on key collision —
  current ANTI JOIN updates (survivors) UNION ALL updates.

scd2_apply(dim, changes, key, tracked): slowly-changing-dimension
  type 2 — close the current row (valid_to = change date) and append
  the new version.  Pure joins/unions/windows; one shuffle per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: rows of ``updates`` replace same-key rows of
    ``current``; unmatched current rows survive."""
    survivors = current.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates)


def scd2_apply(dim: DataFrame, changes: DataFrame, *, key: str,
               eff_col: str = "eff_date") -> DataFrame:
    """SCD2: ``dim`` rows carry (valid_from, valid_to, is_current);
    each change closes the live row at its eff_date and appends a new
    open row."""
    live = dim.filter(F.col("is_current"))
    closed_now = (
        live.join(changes.select(key, eff_col), key, "inner")
        .withColumn("valid_to", F.col(eff_col))
        .withColumn("is_current", F.lit(False))
        .drop(eff_col))
    untouched_live = live.join(changes.select(key), key, "left_anti")
    history = dim.filter(~F.col("is_current"))
    new_rows = (changes
                .withColumn("valid_from", F.col(eff_col))
                .withColumn("valid_to", F.lit(None).cast("date"))
                .withColumn("is_current", F.lit(True))
                .drop(eff_col))
    return (history.unionByName(closed_now)
            .unionByName(untouched_live)
            .unionByName(new_rows))
