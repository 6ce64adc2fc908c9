"""Skew-mitigation: salted join (SURVEY §4C).

AQE's skew-join handles most cases at runtime; explicit salting is
the recipe for the pathological ones (one key with 10^9 rows).  The
hot side gets a random-free deterministic salt (hash of a unique
column mod N); the small side is replicated N ways.  Result is
row-identical to the plain join — property-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                *, salt_mod: int = 8, unique_col: str | None = None,
                how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side's hot
    keys spread over ``salt_mod`` shuffle partitions.

    ``unique_col``: any big-side column making the salt deterministic
    (defaults to the key itself via xxhash — still spreads since the
    salt hashes the whole row id, not just the key)."""
    salt_src = F.col(unique_col) if unique_col else F.spark_partition_id()
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_mod)))
    replicas = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(salt_mod)
            .select(F.col("id").cast("bigint").alias("__salt"))))
    out = big_salted.join(replicas, [key, "__salt"], how)
    return out.drop("__salt")
