"""Batch sessionization (the batch twin of S4's session windows).

Classic gap-based algorithm: a session breaks when the gap since the
previous event (per key) is >= ``gap``; session id = running count of
breaks.  One shuffle (partition by key), one sort — the same cost
profile as any window function, valid at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(df: DataFrame, *, key: str = "user_id", ts: str = "ts",
               gap_minutes: int = 5,
               order_tiebreak: str = "event_id") -> DataFrame:
    """Append a ``session_id`` column (1-based per key)."""
    w = W.partitionBy(key).orderBy(ts, order_tiebreak)
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(ts).over(w)
    new_session = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts)) - F.unix_micros(prev) >= gap_us),
        1).otherwise(0)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("session_id",
                         F.sum(new_session).over(run).cast("long"))


def session_stats(df: DataFrame, *, key: str = "user_id", ts: str = "ts",
                  gap_minutes: int = 5,
                  value: str = "value") -> DataFrame:
    """Per-session aggregates: start (epoch µs), events, exact value
    sum — byte-compatible with the S4 streaming output contract."""
    from ..exprs import dsum
    s = sessionize(df, key=key, ts=ts, gap_minutes=gap_minutes)
    return (s.groupBy(key, "session_id")
            .agg(F.unix_micros(F.min(ts)).alias("session_start_us"),
                 F.count(F.lit(1)).alias("n_events"),
                 dsum(value, "value_sum")))
