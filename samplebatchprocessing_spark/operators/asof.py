"""As-of join (nearest-prior-event match), SURVEY §2B J8.

Spark has no native ASOF JOIN.  The naive rewrite — equi-join on the
key plus ``r.ts <= l.ts`` then keep the max — materializes every
(left, right) pair per key before pruning, which explodes on hot keys
(a user with 1M events x 1M lookups).  This implementation uses the
single-shuffle union + carry-forward trick instead (the distributed
analogue of pandas ``merge_asof``):

1. tag left and right rows, union them into one relation,
2. hash-partition by key and sort by (ts, side) within partitions,
3. carry the last non-null right-side payload forward with
   ``last(..., ignorenulls=True)`` over an unbounded-preceding frame,
4. keep only left rows.

Cost at scale: ONE shuffle of |L|+|R| rows and a per-partition sort —
no intermediate blow-up, skew bounded by the busiest key's row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_KEY, _TS, _SIDE = "__asof_key", "__asof_ts", "__asof_side"


def asof_join(left: DataFrame, right: DataFrame, *,
              left_ts: str, right_ts: str,
              left_by: str, right_by: str,
              right_cols: list[str],
              strict: bool = False,
              direction: str = "backward",
              tiebreak: str | None = None) -> DataFrame:
    """For each left row, attach ``right_cols`` from the matched
    right row within the same key group; nulls when no such row
    (left-outer semantics, like DuckDB ``ASOF LEFT JOIN``).

    direction="backward" (default): greatest ``right_ts`` <=
    ``left_ts`` (strictly < when ``strict``).  direction="forward":
    smallest ``right_ts`` >= ``left_ts`` (strictly > when
    ``strict``) — the same single-shuffle carry, just run over the
    DESCENDING time order, so cost is identical.

    ``tiebreak``: name of a column in ``right_cols`` that totals the
    order among several right rows sharing the SAME match timestamp
    — the row with the smallest ``tiebreak`` value wins.  Without
    it, equal-ts right rows make the carried payload engine/
    partition-order dependent (the (ts, event_id) total-order
    discipline used elsewhere in the repo)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction: {direction}")
    # At equal ts a non-strict match admits the right row -> sort it
    # before the left row; strict excludes it -> sort it after.
    left_rank, right_rank = (1, 0) if not strict else (0, 1)

    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    lt = (left
          .withColumn(_KEY, F.col(left_by))
          .withColumn(_TS, F.col(left_ts))
          .withColumn(_SIDE, F.lit(left_rank)))
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(rtypes[c]))

    rt = right.select(
        F.col(right_by).alias(_KEY),
        F.col(right_ts).alias(_TS),
        F.lit(right_rank).alias(_SIDE),
        *right_cols,
    )
    for c in left.columns:
        rt = rt.withColumn(c, F.lit(None).cast(ltypes[c]))

    unioned = lt.select(lt.columns).unionByName(rt.select(lt.columns))

    ts_order = (F.col(_TS).asc() if direction == "backward"
                else F.col(_TS).desc())
    order = [ts_order, F.col(_SIDE).asc()]
    if tiebreak is not None:
        if tiebreak not in right_cols:
            raise ValueError(f"tiebreak {tiebreak} not in right_cols")
        # carry-last wins, so DESC makes the smallest value the match
        order.append(F.col(tiebreak).desc())
    w = (W.partitionBy(_KEY)
         .orderBy(*order)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    carried = unioned
    for c in right_cols:
        carried = carried.withColumn(
            c, F.last(c, ignorenulls=True).over(w))

    return (carried
            .filter(F.col(_SIDE) == left_rank)
            .drop(_KEY, _TS, _SIDE))


def multi_asof_join(left: DataFrame, rights: list, *,
                    left_ts: str, left_by: str) -> DataFrame:
    """J15: as-of join against SEVERAL right tables in ONE shuffle —
    the feature-store point-in-time read: every left row picks up
    the latest prior value from each of N feature tables, and the
    whole thing still costs a single hash partition + sort of
    |L| + sum|R_i| rows (N separate as-of joins would shuffle the
    left side N times).

    ``rights`` is a list of dicts:
    ``{"df": DataFrame, "ts": col, "by": col, "cols": [payload...]}``
    — payload column names must be globally distinct.  Semantics per
    table are the non-strict backward as-of (ties admit the right
    row), identical to :func:`asof_join`.

    Implementation: every side lands in one tagged union; one window
    per PAYLOAD COLUMN carries the last non-null value forward over
    the same (key, ts, side) order — Spark evaluates all the
    `last(ignorenulls)` calls in ONE window operator because frame
    and ordering are shared, so cost does not grow with N beyond the
    extra columns themselves."""
    ltypes = dict(left.dtypes)
    all_payload: list[str] = []
    rtypes: dict[str, str] = {}
    for r in rights:
        for c in r["cols"]:
            if c in all_payload:
                raise ValueError(f"duplicate payload column {c}")
            if c in left.columns or c in (_KEY, _TS, _SIDE):
                # lt.withColumn(c, lit(None)) below would silently
                # overwrite the left column with NULL
                raise ValueError(
                    f"payload column {c} collides with a left/"
                    f"internal column")
            all_payload.append(c)
            rtypes[c] = dict(r["df"].dtypes)[c]

    lt = (left
          .withColumn(_KEY, F.col(left_by))
          .withColumn(_TS, F.col(left_ts))
          .withColumn(_SIDE, F.lit(1)))
    for c in all_payload:
        lt = lt.withColumn(c, F.lit(None).cast(rtypes[c]))

    unioned = lt.select(lt.columns)
    for r in rights:
        rt = r["df"].select(
            F.col(r["by"]).alias(_KEY),
            F.col(r["ts"]).alias(_TS),
            F.lit(0).alias(_SIDE),
            *r["cols"])
        for c in left.columns:
            rt = rt.withColumn(c, F.lit(None).cast(ltypes[c]))
        for c in all_payload:
            if c not in r["cols"]:
                rt = rt.withColumn(c, F.lit(None).cast(rtypes[c]))
        unioned = unioned.unionByName(rt.select(lt.columns))

    w = (W.partitionBy(_KEY)
         .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    carried = unioned
    for c in all_payload:
        carried = carried.withColumn(
            c, F.last(c, ignorenulls=True).over(w))

    return (carried
            .filter(F.col(_SIDE) == 1)
            .drop(_KEY, _TS, _SIDE))
