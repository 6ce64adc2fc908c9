"""Event-flow analytics operators: ordered funnels, cohort
retention, and sweep-line peak concurrency.

These are the classic product-analytics queries a batch engine runs
over an append-only event log (reference parity: the reference's job
model is "process a prefix of files" — `GetJobs.py:40-56` — with no
event semantics at all, so these are Spark-first designs, not ports).

Scale notes (100 TB event log):
- Every shuffle here is keyed by ``user_id`` (funnel, retention) or
  by calendar day (concurrency).  The funnel's three stage
  aggregations hash-partition on the same key, so Spark reuses the
  exchange across stages (one physical shuffle per stage input, no
  re-key).  No driver-side collect anywhere.
- Peak concurrency deliberately avoids the textbook global
  ``ORDER BY t`` running sum — a single-partition window is the #1
  sweep-line scale-killer.  Intervals are clipped to calendar days
  and the running sum is windowed *per day*, which parallelizes
  across the date range while staying exact for intra-day intervals
  (cross-midnight tails are clipped; documented in the query
  contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_stages(events: DataFrame, steps: list[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Ordered-sequence funnel: how many users performed step[0],
    then step[1] *strictly after* their first step[0], then step[2]
    strictly after that, ...  One row per stage:
    (stage_idx, stage, n_users), monotonically non-increasing.

    Implementation: stage k's frontier is ``min(ts) where type =
    steps[k] and ts > first reach of stage k-1``, a chain of
    groupBy(user) + co-partitioned joins; frontiers are unioned with
    a stage tag and aggregated in ONE job (no driver-side count per
    stage).  All joins key on ``user_col``; frontiers shrink
    monotonically down the funnel so AQE can flip later joins to
    broadcast when the surviving cohort is small.  Each frontier is
    persisted — it feeds both its stage-count branch and the next
    stage's join, and without the pin the union re-derives stage
    k's lineage k times.
    """
    base = events.select(user_col, type_col, ts_col).filter(
        F.col(type_col).isin(steps))
    frontier = (base.filter(F.col(type_col) == steps[0])
                .groupBy(user_col).agg(F.min(ts_col).alias("t"))
                .persist())
    tagged = frontier.select(
        F.lit(0).alias("stage_idx"), F.lit(steps[0]).alias("stage"),
        F.col(user_col))
    for i, step in enumerate(steps[1:], start=1):
        frontier = (base.filter(F.col(type_col) == step)
                    .join(frontier.select(user_col, "t"), user_col)
                    .filter(F.col(ts_col) > F.col("t"))
                    .groupBy(user_col).agg(F.min(ts_col).alias("t"))
                    .persist())
        tagged = tagged.unionByName(frontier.select(
            F.lit(i).alias("stage_idx"), F.lit(step).alias("stage"),
            F.col(user_col)))
    return (tagged.groupBy("stage_idx", "stage")
            .agg(F.count(F.lit(1)).alias("n_users")))


def conversion_lags(events: DataFrame, steps: list[str],
                    user_col: str = "user_id",
                    type_col: str = "event_type",
                    ts_col: str = "ts") -> DataFrame:
    """Per converted user, the lag from first step[0] to completing
    the whole ordered funnel: (user, lag_ms BIGINT).  Same frontier
    chain as ``funnel_stages`` but carries the stage-0 timestamp
    through, so the timing query shares the funnel's shuffle
    shape (all joins keyed on ``user_col``).
    """
    base = events.select(user_col, type_col, ts_col).filter(
        F.col(type_col).isin(steps))
    frontier = (base.filter(F.col(type_col) == steps[0])
                .groupBy(user_col).agg(F.min(ts_col).alias("t"))
                .withColumn("t0", F.col("t")))
    for step in steps[1:]:
        frontier = (base.filter(F.col(type_col) == step)
                    .join(frontier.select(user_col, "t", "t0"), user_col)
                    .filter(F.col(ts_col) > F.col("t"))
                    .groupBy(user_col, "t0")
                    .agg(F.min(ts_col).alias("t")))
    return frontier.select(
        F.col(user_col),
        (F.unix_millis(F.col("t")) - F.unix_millis(F.col("t0")))
        .alias("lag_ms"))


def cohort_retention(events: DataFrame,
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention matrix.

    cohort_week = ISO week (date_trunc) of the user's first event;
    a (cohort_week, weeks_since) cell counts distinct users from that
    cohort active in that later week.  Two user-keyed shuffles (first
    event per user; distinct activity weeks) + one small final agg —
    the canonical two-phase plan, no self-join on the raw log.
    """
    week = F.date_trunc("week", F.col(ts_col))
    first = (events.groupBy(user_col)
             .agg(F.min(week).alias("cohort_week")))
    active = (events.select(F.col(user_col), week.alias("act_week"))
              .distinct())
    return (active.join(first, user_col)
            .groupBy(F.to_date("cohort_week").alias("cohort_week"),
                     (F.datediff(F.to_date("act_week"),
                                 F.to_date("cohort_week")) / 7)
                     .cast("int").alias("weeks_since"))
            .agg(F.count_distinct(F.col(user_col)).alias("n_active")))


def peak_concurrency(events: DataFrame,
                     dur_col: Column,
                     ts_col: str = "ts") -> DataFrame:
    """Per-day peak concurrency of intervals [ts, ts + dur), sweep-line.

    Each event opens an interval at ``ts`` lasting ``dur_col``
    (a Column of seconds, may be fractional).  Emits (day, peak):
    the maximum number of simultaneously-open intervals that day.
    Intervals are clipped to their opening day's boundary (exact for
    intra-day intervals; a cross-midnight tail does not carry into
    the next day — declared contract, keeps the window per-day).

    Exactness: all arithmetic in integer milliseconds; the running
    sum uses the default RANGE frame so all delta rows at the same
    (t, delta) instant are peers — the sum at any row is
    order-independent, hence deterministic.  Ends sort before starts
    at the same instant (delta ASC), giving half-open [s, e)
    semantics.
    """
    start_ms = (F.unix_millis(F.col(ts_col))).alias("t")
    day = F.to_date(F.col(ts_col)).alias("day")
    day_end_ms = F.unix_millis(
        F.date_add(F.to_date(F.col(ts_col)), 1).cast("timestamp"))
    # floor, not cast: DuckDB's double->int CAST rounds half-even
    # while Spark's truncates — FLOOR on both sides is the only
    # rounding that agrees (durations are declared non-negative).
    end_ms = F.least(
        F.unix_millis(F.col(ts_col))
        + F.floor(dur_col * 1000).cast("bigint"),
        day_end_ms).alias("t")
    starts = events.select(day, start_ms, F.lit(1).alias("delta"))
    ends = events.select(day, end_ms, F.lit(-1).alias("delta"))
    deltas = starts.unionByName(ends)
    running = deltas.withColumn(
        "conc",
        F.sum("delta").over(
            Window.partitionBy("day").orderBy("t", "delta")))
    return (running.groupBy("day")
            .agg(F.max("conc").alias("peak"))
            .select(F.col("day"), F.col("peak").cast("bigint")))


def ewma_fixedpoint(events: DataFrame, *, key_col: str = "user_id",
                    order_cols: tuple[str, str] = ("ts", "event_id"),
                    value_col: str = "value") -> DataFrame:
    """Per-key exponentially weighted moving average (alpha = 1/2) as
    an EXACT integer recurrence — the ordered per-key linear
    recurrence Spark's built-in windows cannot express (each state
    depends on the previous OUTPUT, not a fixed frame), so this is
    the canonical ``applyInPandas`` use: shuffle once on the key,
    sort each group locally, run the scan in one Arrow batch.

    Fixed-point encoding keeps every engine bit-identical: inputs
    quantize to ``X = floor(value * 100) * 2^10`` and the state is
    ``s_i = floor((s_{i-1} + X_i) / 2)`` starting from 0 — integer
    halving IS alpha = 1/2 with a deterministic rounding rule, no
    float accumulation anywhere.  Returns one row per event:
    (key, event_id, n (1-based rank), ewma_fp).

    Scale (100 TB): one hash shuffle on the key; per-group work is a
    local sort + O(n) scan inside an Arrow batch; no global window,
    no driver data.  Skewed keys are the caveat — a single giant key
    serializes its own scan (inherent to the recurrence), so keys
    should be sessions/users, not constants."""
    import pandas as pd

    o1, o2 = order_cols
    src = events.select(key_col, o1, o2,
                        (F.floor(F.col(value_col) * 100)
                         .cast("long") * (1 << 10)).alias("x"))

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([o1, o2], kind="mergesort")
        s, out = 0, []
        for x in pdf["x"]:
            s = (s + int(x)) // 2
            out.append(s)
        return pd.DataFrame({
            key_col: pdf[key_col],
            "event_id": pdf[o2],
            "n": range(1, len(out) + 1),
            "ewma_fp": out,
        })

    return (src.repartition(key_col).groupBy(key_col).applyInPandas(
        scan,
        schema=f"{key_col} long, event_id long, n long, ewma_fp long"))


def ewma_fixedpoint_sql(*, key_col: str = "user_id",
                        order_cols: tuple[str, str] = ("ts", "event_id"),
                        value_col: str = "value",
                        table: str = "events") -> str:
    """DuckDB twin of :func:`ewma_fixedpoint`: the identical integer
    recurrence driven by a recursive CTE over the per-key rank
    order."""
    o1, o2 = order_cols
    return f"""
WITH RECURSIVE
e AS (SELECT {key_col} AS k, {o2} AS event_id,
             CAST(FLOOR({value_col} * 100) AS BIGINT) * {1 << 10} AS x,
             ROW_NUMBER() OVER (PARTITION BY {key_col}
                                ORDER BY {o1}, {o2}) AS rn
      FROM {table}),
rec(k, event_id, rn, s) AS (
  SELECT k, event_id, rn, x // 2 FROM e WHERE rn = 1
  UNION ALL
  SELECT e.k, e.event_id, e.rn, (rec.s + e.x) // 2
  FROM e JOIN rec ON e.k = rec.k AND e.rn = rec.rn + 1)
SELECT k AS {key_col}, event_id, rn AS n, s AS ewma_fp FROM rec
"""


def interval_overlap_pairs(events: DataFrame, dur_col: Column,
                           ts_col: str = "ts",
                           id_col: str = "event_id") -> DataFrame:
    """Interval OVERLAP JOIN — per day, the number of event-interval
    pairs [s, e) that genuinely overlap — with hour-bucket BLOCKING so
    the self-join is an equi-join on (day, hour) instead of the
    quadratic theta-join Spark would otherwise plan.  Each interval
    replicates only to the hour buckets it touches (durations are
    minutes-scale, so the factor is ~1.x); a pair found in several
    shared buckets is counted once via DISTINCT on the pair key.
    Day-clipped, integer-millisecond arithmetic throughout (the X27
    conventions), half-open [s, e) overlap semantics.

    Scale (100 TB of events): the blocking key (day, hour) bounds
    every join partition to one hour of one day; skewed hours salt
    like any hot equi-key.  No CartesianProduct exists in the plan
    (gated)."""
    day = F.to_date(F.col(ts_col)).alias("day")
    s_ms = F.unix_millis(F.col(ts_col)).alias("s")
    day_end = F.unix_millis(
        F.date_add(F.to_date(F.col(ts_col)), 1).cast("timestamp"))
    e_ms = F.greatest(
        F.least(F.unix_millis(F.col(ts_col))
                + F.floor(dur_col * 1000).cast("bigint"), day_end),
        F.unix_millis(F.col(ts_col)) + 1).alias("e")
    base = events.select(F.col(id_col).alias("id"), day, s_ms, e_ms)
    hb = F.explode(F.sequence(
        F.floor(F.col("s") / 3600000).cast("bigint"),
        F.floor((F.col("e") - 1) / 3600000).cast("bigint"))).alias("hb")
    blocked = base.select("id", "day", "s", "e", hb)
    a = blocked.select(F.col("id").alias("id_a"), "day", "hb",
                       F.col("s").alias("sa"), F.col("e").alias("ea"))
    b = blocked.select(F.col("id").alias("id_b"), "day", "hb",
                       F.col("s").alias("sb"), F.col("e").alias("eb"))
    pairs = (a.join(b, ["day", "hb"])
             .filter((F.col("id_a") < F.col("id_b"))
                     & (F.col("sa") < F.col("eb"))
                     & (F.col("sb") < F.col("ea")))
             .select("day", "id_a", "id_b").distinct())
    return (pairs.groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_overlapping_pairs")))


def interval_overlap_pairs_sql(dur_expr: str = 'GREATEST("value", 0.0)',
                               table: str = "events") -> str:
    """DuckDB twin: the direct per-day range self-join (no blocking
    needed at oracle scale), identical clip/overlap arithmetic."""
    return f"""
WITH iv AS (
  SELECT event_id AS id, CAST(ts AS DATE) AS day,
         epoch_ms(ts) AS s,
         GREATEST(LEAST(epoch_ms(ts)
                    + CAST(FLOOR({dur_expr} * 1000) AS BIGINT),
                  epoch_ms(CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP))),
                  epoch_ms(ts) + 1) AS e
  FROM {table})
SELECT a.day, COUNT(*) AS n_overlapping_pairs
FROM iv a JOIN iv b
  ON a.day = b.day AND a.id < b.id
 AND a.s < b.e AND b.s < a.e
GROUP BY a.day
"""


def debounce_trailing(events: DataFrame, *, gap_ms: int = 60_000,
                      key_cols: tuple[str, str] = ("user_id",
                                                   "event_type"),
                      order_cols: tuple[str, str] = ("ts", "event_id")
                      ) -> DataFrame:
    """TRAILING-edge debounce — keep an event iff it is >= ``gap_ms``
    after the last KEPT event of its key (first always kept).  Unlike
    W8's burst collapse (gap from the previous EVENT — pure window
    algebra), the trailing form's state depends on the previous
    OUTPUT, the same recurrence class as :func:`ewma_fixedpoint`:
    one hash shuffle on the key, a local sort, an O(n) scan per
    group in one Arrow batch.  Integer-millisecond arithmetic, so
    the DuckDB recursive-CTE twin replays the kept set bit-for-bit.

    Returns kept rows only: (user_id, event_type, event_id,
    kept_rank)."""
    import pandas as pd

    k1, k2 = key_cols
    o1, o2 = order_cols
    src = events.select(k1, k2, o1, o2,
                        F.unix_millis(F.col(o1)).alias("t"))

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([o1, o2], kind="mergesort")
        last, cnt = None, 0
        keep_flags, ranks = [], []
        for t in pdf["t"]:
            keep = last is None or int(t) - last >= gap_ms
            if keep:
                last = int(t)
                cnt += 1
            keep_flags.append(keep)
            ranks.append(cnt)
        out = pdf.assign(_keep=keep_flags, kept_rank=ranks)
        out = out[out["_keep"]]
        return out[[k1, k2, o2, "kept_rank"]]

    return (src.repartition(k1, k2).groupBy(k1, k2).applyInPandas(
        scan, schema=f"{k1} long, {k2} string, {o2} long,"
                     f" kept_rank long"))


def debounce_trailing_sql(*, gap_ms: int = 60_000,
                          table: str = "events") -> str:
    """DuckDB twin of :func:`debounce_trailing` — the identical
    last-kept recurrence via a recursive CTE over per-key rank
    order."""
    return f"""
WITH RECURSIVE
e AS (SELECT user_id AS k, event_type AS ty, event_id,
             epoch_ms(ts) AS t,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM {table}),
rec(k, ty, event_id, rn, t, last_t, kept, cnt) AS (
  SELECT k, ty, event_id, rn, t, t, TRUE, 1 FROM e WHERE rn = 1
  UNION ALL
  SELECT e.k, e.ty, e.event_id, e.rn, e.t,
         CASE WHEN e.t - rec.last_t >= {gap_ms}
              THEN e.t ELSE rec.last_t END,
         e.t - rec.last_t >= {gap_ms},
         rec.cnt + CASE WHEN e.t - rec.last_t >= {gap_ms}
                        THEN 1 ELSE 0 END
  FROM e JOIN rec ON e.k = rec.k AND e.ty = rec.ty
                 AND e.rn = rec.rn + 1)
SELECT k AS user_id, ty AS event_type, event_id,
       CAST(cnt AS BIGINT) AS kept_rank
FROM rec WHERE kept
"""
