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

    ``unique_col``: any big-side column to derive the salt from;
    defaults to a uniform deterministic spread (xxhash64 of the key
    plus a per-row uniform draw seeded by all columns is overkill —
    monotonically_increasing_id is partition-layout-dependent, so the
    default hashes the full row via xxhash64(*columns), which is
    deterministic for a given row regardless of partitioning).

    Only ``inner`` and ``left`` are supported: for right/full outer
    the replicated small side would emit ``salt_mod`` duplicate rows
    per unmatched key."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only, got {how!r}: "
            "right/full outer would duplicate unmatched small-side "
            "rows salt_mod times")
    salt_src = (F.xxhash64(F.col(unique_col)) if unique_col
                else F.xxhash64(*[F.col(c) for c in big.columns]))
    big_salted = big.withColumn(
        "__salt", F.pmod(salt_src, F.lit(salt_mod)))
    replicas = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(salt_mod)
            .select(F.col("id").cast("bigint").alias("__salt"))))
    out = big_salted.join(replicas, [key, "__salt"], how)
    return out.drop("__salt")
