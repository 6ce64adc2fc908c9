"""Core relational surface: projection/filter (Q*), joins (J*),
aggregation (A*), windows (W*), sort/limit/top-k (T*), set ops (U*).

Replaces the reference's single "arbitrary command per file" operator
(GetJobs.py:51-53) with a declarative relational algebra executed by
Catalyst/Tungsten.  Every query here is a stock DataFrame plan — no
RDDs, no Python in the hot path — so predicate pushdown, column
pruning, broadcast selection and AQE apply untouched at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import DEC, davg, dsum, r6, sql_davg, sql_dsum
from ..operators.asof import asof_join


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# A* — aggregation
# --------------------------------------------------------------------------

def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary (A1+A12, Q3, T1).

    scan -> pushed-down filter -> 2-phase hash agg (partial map-side
    combine -> exchange on 6-value group key -> final) -> tiny sort.
    At 100 TB the only shuffle moves 6 groups x partial states.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


A1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def a2_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: no-group aggregate — single global row, map-side partials."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_quantity", "total_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg("l_discount", "avg_disc"),
    )


A2_SQL = f"""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       {sql_dsum('l_quantity')} AS total_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       {sql_davg('l_discount')} AS avg_disc
FROM lineitem
"""


def a3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: COUNT(DISTINCT), incl. a multi-column distinct via a
    portable concat rewrite (DuckDB lacks multi-arg COUNT DISTINCT)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(
            F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("n_order_lines"),
    )


A3_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)) AS n_order_lines
FROM lineitem GROUP BY l_returnflag
"""


def a4_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: sample stddev/variance, rounded to 6 dp (catastrophic
    cancellation avoided: quantities are well-conditioned)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.stddev_samp("l_quantity"), "sd_qty"),
        r6(F.var_samp("l_quantity"), "var_qty"),
        r6(F.stddev_samp("l_discount"), "sd_disc"),
    )


A4_SQL = """
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
       ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
       ROUND(STDDEV_SAMP(l_discount), 6) AS sd_disc
FROM lineitem GROUP BY l_returnflag
"""


def a5_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: post-aggregation filter (HAVING)."""
    ord_ = _t(spark, sf_dir, "orders")
    return (
        ord_.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 12)
    )


A5_SQL = f"""
SELECT o_custkey, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS spend
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
"""


def a6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: ROLLUP with grouping() indicator."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"),
             F.count(F.lit(1)).alias("n"),
             F.grouping("l_returnflag").cast("int").alias("g_rf"),
             F.grouping("l_linestatus").cast("int").alias("g_ls"))
    )


A6_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def a6_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: CUBE over two low-cardinality keys."""
    ord_ = _t(spark, sf_dir, "orders")
    return (
        ord_.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "spend"))
    )


A6_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {sql_dsum('o_totalprice')} AS spend
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def a7_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: min_by/max_by (argmin/argmax). c_acctbal is unique per
    nation in the fixtures (checked), so the arg is deterministic."""
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.max_by("c_custkey", "c_acctbal").alias("richest_cust"),
        F.min_by("c_custkey", "c_acctbal").alias("poorest_cust"),
        F.max("c_acctbal").alias("max_bal"),
    )


A7_SQL = """
SELECT c_nationkey,
       ARG_MAX(c_custkey, c_acctbal) AS richest_cust,
       ARG_MIN(c_custkey, c_acctbal) AS poorest_cust,
       MAX(c_acctbal) AS max_bal
FROM customer GROUP BY c_nationkey
"""


def a8_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: collect_list canonicalized by sort_array (only the sorted
    form is declared — bag order is nondeterministic by design).
    Arrays are serialized to JSON strings per the §2B canonicalization
    protocol (the driver's comparator sorts/hashes scalar cells)."""
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    return (
        nat.join(F.broadcast(reg),
                 nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(F.to_json(F.sort_array(F.collect_list("n_name")))
              .alias("nations"),
             F.to_json(F.sort_array(F.collect_set(
                 F.col("n_nationkey").cast("long"))))
              .alias("nation_keys"))
    )


A8_SQL = """
SELECT r_name,
       CAST(TO_JSON(LIST_SORT(LIST(n_name))) AS VARCHAR) AS nations,
       CAST(TO_JSON(LIST_SORT(LIST(DISTINCT CAST(n_nationkey AS BIGINT)))) AS VARCHAR) AS nation_keys
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def a9_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: exact linear-interpolation percentiles, rounded 6 dp."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.percentile("l_quantity", 0.5), "p50_qty"),
        r6(F.percentile("l_extendedprice", 0.25), "p25_price"),
        r6(F.percentile("l_extendedprice", 0.75), "p75_price"),
        r6(F.percentile("l_extendedprice", 0.95), "p95_price"),
    )


A9_SQL = """
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS p50_qty,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6) AS p25_price,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 6) AS p75_price,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 6) AS p95_price
FROM lineitem GROUP BY l_returnflag
"""


def a13_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: Pearson correlation + sample covariance, engineered
    exact: the five moment sums (Σx, Σy, Σxy, Σx², Σy²) are
    order-independent decimal sums; the final arithmetic runs the
    SAME double operation tree on both engines -> bit-identical,
    unlike built-in corr()/covar_samp() whose accumulation order is
    engine-dependent."""
    li = _t(spark, sf_dir, "lineitem")
    # Widths sized to the data (qty < 10^3, price < 10^7) so Spark's
    # product types stay under its 38-digit cap — exact, no rounding.
    # The SQL twin uses DECIMAL(19,6) instead: DuckDB needs a >18
    # width to switch to INT128 multiplication.  Both routes are
    # exact, so the five sums agree bit-for-bit as doubles.
    x = F.col("l_quantity").cast("decimal(9,6)")
    y = F.col("l_extendedprice").cast("decimal(13,6)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = ((n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)))
    cov = (sxy - sx * sy / n) / (n - 1)
    return agg.select(
        "l_returnflag",
        r6(corr, "corr_qty_price"),
        r6(cov, "covar_qty_price"))


A13_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
                  * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
                  * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))
                  * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag,
       ROUND((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
         AS corr_qty_price,
       ROUND((sxy - sx * sy / n) / (n - 1), 6) AS covar_qty_price
FROM m
"""


def a10_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11: HLL distinct + approximate percentile.  Sketch values
    are engine-specific, so the declared output is the *property* the
    sketch guarantees (HLL relative error <= 5%, percentile_approx
    rank error << 0.05), checked as booleans the oracle states as
    TRUE, plus the exact distinct count which IS cross-engine.  The
    sketches still run for real on the Spark side — if accuracy
    drifts out of bounds the booleans flip and the driver goes red.
    Raw sketch outputs are additionally bound-tested in
    tests/test_operators.py."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_p50"),
        F.percentile("l_extendedprice", 0.45).alias("p45"),
        F.percentile("l_extendedprice", 0.55).alias("p55"),
    )
    rel_err = (F.abs(F.col("approx_parts") - F.col("exact_parts"))
               / F.col("exact_parts"))
    return agg.select(
        "l_returnflag",
        F.col("exact_parts"),
        (rel_err <= 0.05).alias("hll_within_5pct"),
        F.col("approx_p50").between(F.col("p45"), F.col("p55"))
         .alias("p50_within_rank_bound"),
    )


A10_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS hll_within_5pct,
       TRUE AS p50_within_rank_bound
FROM lineitem GROUP BY l_returnflag
"""


def a11_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 (dedicated row since round 4 — previously rode a10):
    ``percentile_approx`` at q ∈ {0.25, 0.5, 0.9} per group.  The
    sketch values are engine-specific (KLL/GK-style), so the declared
    output is the rank-error property: each approximate quantile must
    land between the EXACT q-0.02 and q+0.02 percentiles (Spark's
    default accuracy=10000 bounds rank error at 1e-4, far inside the
    declared 0.02), plus the exact row count which IS cross-engine.
    The sketch really runs — accuracy drift flips a boolean and the
    driver goes red.

    Scale: partial sketches merge associatively map-side, one shuffle
    of O(groups x sketch_size) — the same 2-phase plan as A1."""
    li = _t(spark, sf_dir, "lineitem")
    qs = (25, 50, 90)
    agg = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.percentile_approx("l_extendedprice", q / 100.0)
          .alias(f"ap{q}") for q in qs],
        *[F.percentile("l_extendedprice", (q - 2) / 100.0)
          .alias(f"lo{q}") for q in qs],
        *[F.percentile("l_extendedprice", (q + 2) / 100.0)
          .alias(f"hi{q}") for q in qs],
    )
    return agg.select(
        "l_linestatus", "n_rows",
        *[F.col(f"ap{q}").between(F.col(f"lo{q}"), F.col(f"hi{q}"))
          .alias(f"p{q}_within_rank_bound") for q in qs])


A11_SQL = """
SELECT l_linestatus, COUNT(*) AS n_rows,
       TRUE AS p25_within_rank_bound,
       TRUE AS p50_within_rank_bound,
       TRUE AS p90_within_rank_bound
FROM lineitem GROUP BY l_linestatus
"""


def a12_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: the partial/final (2-phase) aggregation contract, made
    driver-visible.  Spark plans every groupBy as partial map-side
    HashAggregate -> Exchange on the group key -> final HashAggregate
    (plan-gated in tests/test_plans.py); the algebraic fact that makes
    the split legal is that partial states merge associatively.  This
    row states that contract as data: re-aggregating the per-group
    partials must reproduce the direct global aggregate exactly.
    Exact decimal sums (dsum discipline) make both routes
    order-independent, so the equality booleans are deterministic —
    if the partial/final merge ever diverged, a boolean flips and the
    driver goes red.  Both sides are single-exchange 2-phase plans;
    at 100 TB the shuffle moves O(groups) partial states only.
    """
    li = _t(spark, sf_dir, "lineitem")
    partial = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(DEC)).alias("s_qty"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    refinal = partial.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").alias("g_rows"),
        F.sum("s_qty").cast("double").alias("g_sum_qty"),
        F.min("mn").alias("g_min"),
        F.max("mx").alias("g_max"),
    )
    direct = li.agg(
        F.count(F.lit(1)).alias("d_rows"),
        dsum("l_quantity", "d_sum_qty"),
        F.min("l_extendedprice").alias("d_min"),
        F.max("l_extendedprice").alias("d_max"),
    )
    return refinal.crossJoin(direct).select(
        "n_groups",
        F.col("d_rows").alias("n_rows"),
        F.col("d_sum_qty").alias("sum_qty"),
        (F.col("g_rows") == F.col("d_rows")).alias("count_merges"),
        (F.col("g_sum_qty") == F.col("d_sum_qty")).alias("sum_merges"),
        (F.col("g_min") == F.col("d_min")).alias("min_merges"),
        (F.col("g_max") == F.col("d_max")).alias("max_merges"),
    )


A12_SQL = f"""
SELECT (SELECT COUNT(*) FROM (SELECT DISTINCT l_returnflag, l_linestatus
                              FROM lineitem)) AS n_groups,
       COUNT(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty,
       TRUE AS count_merges,
       TRUE AS sum_merges,
       TRUE AS min_merges,
       TRUE AS max_merges
FROM lineitem
"""


# --------------------------------------------------------------------------
# Q* — projection / filter
# --------------------------------------------------------------------------

def q1_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: projection, aliasing, computed columns. Pure row-local
    expressions — whole-stage-codegen'd, zero shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (F.col("l_quantity") * 2.0).alias("double_qty"),
        F.concat_ws("-", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


Q1_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       l_quantity * 2.0 AS double_qty,
       l_returnflag || '-' || l_linestatus AS flag_status
FROM lineitem
"""


def q2_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: casts. NOTE the portable subset: double->int differs
    across engines (Spark truncates, DuckDB rounds), so integerizing
    uses explicit FLOOR; timestamp->date and int<->string are safe."""
    ord_ = _t(spark, sf_dir, "orders")
    return ord_.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_custkey").cast("double").alias("cust_dbl"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.substring(F.col("o_orderpriority"), 1, 1).cast("int").alias("prio_num"),
    )


Q2_SQL = """
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(o_custkey AS DOUBLE) AS cust_dbl,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS prio_num
FROM orders
"""


def q3_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: compound predicates — comparisons, AND/OR/NOT, IN,
    BETWEEN, LIKE, IS NULL, CASE WHEN. All pushed to the parquet
    scan by Catalyst (verified in tests via explain())."""
    ord_ = _t(spark, sf_dir, "orders")
    return (
        ord_.filter(
            F.col("o_totalprice").between(50000, 400000)
            & F.col("o_orderstatus").isin("O", "F")
            & (F.col("o_orderpriority").like("1-%")
               | F.col("o_orderpriority").like("2-%"))
            & F.col("o_orderdate").isNotNull()
            & ~(F.col("o_orderkey") % 10 == 3)
        )
        .select(
            "o_orderkey", "o_orderstatus", "o_totalprice",
            F.when(F.col("o_totalprice") > 300000, "big")
            .when(F.col("o_totalprice") > 150000, "mid")
            .otherwise("small").alias("bucket"),
        )
    )


Q3_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'small' END AS bucket
FROM orders
WHERE o_totalprice BETWEEN 50000 AND 400000
  AND o_orderstatus IN ('O', 'F')
  AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
  AND o_orderdate IS NOT NULL
  AND NOT (o_orderkey % 10 = 3)
"""


def q4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: DISTINCT projection (hash-partitioned dedup at scale)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select("c_mktsegment", "c_nationkey").distinct()


Q4_SQL = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


# --------------------------------------------------------------------------
# J* — joins
# --------------------------------------------------------------------------

def j1_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join, fact-to-dim; Catalyst/AQE picks the
    physical strategy (broadcast at these sizes)."""
    ord_ = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        ord_.join(cust, ord_.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum("o_totalprice", "revenue"))
    )


J1_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def j2_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer join preserving customers with zero orders;
    aggregated into an order-count histogram."""
    cust = _t(spark, sf_dir, "customer")
    ord_ = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(ord_, cust.c_custkey == ord_.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers"))


J2_SQL = """
SELECT n_orders, COUNT(*) AS n_customers FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY n_orders
"""


def j2_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: full outer join (nation keyspace vs supplier keyspace)."""
    nat = _t(spark, sf_dir, "nation")
    sup = _t(spark, sf_dir, "supplier")
    return (
        nat.join(sup, nat.n_nationkey == sup.s_nationkey, "full")
        .select(
            F.coalesce("n_nationkey", "s_nationkey").alias("nationkey"),
            F.col("n_name").alias("nation_name"),
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
        )
    )


J2_FULL_SQL = """
SELECT COALESCE(n_nationkey, s_nationkey) AS nationkey,
       n_name AS nation_name, s_suppkey AS suppkey, s_name AS supplier_name
FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey
"""


def j3_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-semi (EXISTS) and left-anti (NOT EXISTS) counts per
    segment, unioned with a discriminator column."""
    cust = _t(spark, sf_dir, "customer")
    ord_ = _t(spark, sf_dir, "orders")
    keys = ord_.select(F.col("o_custkey").alias("c_custkey"))
    semi = (cust.join(keys, "c_custkey", "left_semi")
            .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
            .withColumn("kind", F.lit("has_orders")))
    anti = (cust.join(keys, "c_custkey", "left_anti")
            .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
            .withColumn("kind", F.lit("no_orders")))
    return semi.unionByName(anti)


J3_SQL = """
SELECT c_mktsegment, COUNT(*) AS n, 'has_orders' AS kind
FROM customer SEMI JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
UNION ALL
SELECT c_mktsegment, COUNT(*) AS n, 'no_orders' AS kind
FROM customer ANTI JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def j4_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: cross join of two tiny dimension projections."""
    reg = _t(spark, sf_dir, "region")
    st = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return reg.select("r_name").crossJoin(st)


J4_SQL = """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
"""


def j5_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: explicit broadcast hints on the dim chain — the plan the
    100 TB version must use (dims stay under the broadcast
    threshold; fact never shuffles for the join)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_items"),
             dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
    )


J5_SQL = f"""
SELECT n_name, COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def j6_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: equi + theta residual — parts matched to lineitems priced
    above 1.5x retail. The equi key keeps it a hash join with a
    post-join residual filter (never a nested-loop at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(part, (li.l_partkey == part.p_partkey)
                & (li.l_extendedprice > part.p_retailprice * 1.5))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_premium"))
    )


J6_SQL = """
SELECT p_brand, COUNT(*) AS n_premium
FROM lineitem JOIN part
  ON l_partkey = p_partkey AND l_extendedprice > p_retailprice * 1.5
GROUP BY p_brand
"""


def j7_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: interval/range join — lineitems shipped within 90 days of
    their order date. Equi key (orderkey) + range residual: hash
    join, no IEJoin needed."""
    ord_ = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        ord_.join(li, (ord_.o_orderkey == li.l_orderkey)
                  & (li.l_shipdate >= ord_.o_orderdate)
                  & (li.l_shipdate < F.col("o_orderdate")
                     + F.expr("INTERVAL 90 DAYS")))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_fast_ship"),
             dsum("l_quantity", "qty"))
    )


J7_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_fast_ship, {sql_dsum('l_quantity')} AS qty
FROM orders JOIN lineitem
  ON o_orderkey = l_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
"""


def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: as-of join — for each purchase event, the nearest prior
    click of the same user. Implemented with the single-shuffle
    union+carry-forward operator (operators/asof.py), not a pair
    blow-up; DuckDB twin is a native ASOF JOIN."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"))
    joined = asof_join(
        purchases, clicks,
        left_ts="ts", right_ts="c_ts",
        left_by="user_id", right_by="c_user_id",
        right_cols=["click_id"], strict=False)
    return joined.select(
        "event_id", "user_id", "value",
        F.col("click_id").alias("prior_click_id"))


J8_SQL = """
SELECT p.event_id, p.user_id, p.value, c.event_id AS prior_click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


def j8b_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8b (r5): FORWARD as-of join — for each click, the nearest
    FOLLOWING purchase of the same user (the time-to-next-conversion
    building block).  Same single-shuffle union+carry operator as J8,
    run over the descending time order (``direction='forward'``);
    DuckDB twin is a native ASOF with the inequality flipped."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"))
    joined = asof_join(
        clicks, purchases,
        left_ts="ts", right_ts="p_ts",
        left_by="user_id", right_by="p_user_id",
        right_cols=["purchase_id"], strict=False,
        direction="forward")
    return joined.select(
        "event_id", "user_id",
        F.col("purchase_id").alias("next_purchase_id"))


J8B_SQL = """
SELECT c.event_id, c.user_id, p.event_id AS next_purchase_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts >= c.ts
"""


def j8c_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8c (r5): as-of join with a TOLERANCE — the pandas
    ``merge_asof(tolerance=...)`` semantics: the nearest prior click
    counts only if it happened within 1 hour of the purchase; older
    matches become NULL (stale attribution is no attribution).  The
    carry-forward operator additionally carries the matched right
    timestamp, and the tolerance is a row-local millisecond check
    applied AFTER the single-shuffle match — cost identical to J8.
    DuckDB twin: native ASOF with the same post-filter."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts"),
        F.col("ts").alias("m_ts"), F.col("event_id").alias("click_id"))
    joined = asof_join(
        purchases, clicks,
        left_ts="ts", right_ts="c_ts",
        left_by="user_id", right_by="c_user_id",
        right_cols=["click_id", "m_ts"], strict=False)
    within = (F.unix_millis(F.col("ts")) - F.unix_millis(F.col("m_ts"))
              <= 3_600_000)
    return joined.select(
        "event_id", "user_id",
        F.when(within, F.col("click_id")).alias("click_id_1h"))


J8C_SQL = """
SELECT p.event_id, p.user_id,
       CASE WHEN epoch_ms(p.ts) - epoch_ms(c.ts) <= 3600000
            THEN c.event_id END AS click_id_1h
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


def j14_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14 (r6): NEAREST as-of join (either direction) — for each
    purchase, the user's closest click in TIME, before or after;
    ties prefer the prior click (the pandas ``merge_asof
    direction='nearest'`` semantics, which neither Spark nor the J8
    carry-forward alone expresses).  Composed from the scale-safe
    primitive: one backward and one forward single-shuffle as-of
    pass (each |L|+|R| rows, no pair blow-up), then a row-local
    argmin over the two candidates.  Declared output: the matched
    click and the SIGNED microsecond offset (negative = prior).

    Scale: exactly two J8-cost passes — still no per-key pair
    materialization, unlike the naive |purchases| x |clicks| join
    the oracle twin runs (fine for DuckDB at oracle scale, fatal at
    100 TB)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"))
    bk = asof_join(purchases, clicks,
                   left_ts="ts", right_ts="c_ts",
                   left_by="user_id", right_by="c_user_id",
                   right_cols=["click_id", "c_ts"],
                   direction="backward", tiebreak="click_id").select(
        "event_id", "user_id", "ts",
        F.col("click_id").alias("bk_id"), F.col("c_ts").alias("bk_ts"))
    fw = asof_join(purchases, clicks,
                   left_ts="ts", right_ts="c_ts",
                   left_by="user_id", right_by="c_user_id",
                   right_cols=["click_id", "c_ts"],
                   direction="forward", tiebreak="click_id").select(
        F.col("event_id").alias("f_event_id"),
        F.col("click_id").alias("fw_id"), F.col("c_ts").alias("fw_ts"))
    j = bk.join(fw, bk.event_id == fw.f_event_id).drop("f_event_id")
    dt_bk = F.unix_micros("bk_ts") - F.unix_micros("ts")
    dt_fw = F.unix_micros("fw_ts") - F.unix_micros("ts")
    take_bk = (F.col("bk_id").isNotNull()
               & (F.col("fw_id").isNull() | (-dt_bk <= dt_fw)))
    return j.select(
        "event_id", "user_id",
        F.when(take_bk, F.col("bk_id")).otherwise(F.col("fw_id"))
        .alias("nearest_click_id"),
        F.when(take_bk, dt_bk).otherwise(dt_fw).alias("dt_us"),
        F.when(F.col("bk_id").isNull() & F.col("fw_id").isNull(),
               F.lit(None).cast("string"))
        .when(take_bk, F.lit("b")).otherwise(F.lit("f")).alias("side"))


J14_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, event_id AS click_id FROM events
      WHERE event_type = 'click'),
j AS (SELECT p.event_id, p.user_id, c.click_id,
             EPOCH_US(c.ts) - EPOCH_US(p.ts) AS dt
      FROM p JOIN c ON p.user_id = c.user_id),
n AS (SELECT * FROM j
      QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id
                                 ORDER BY ABS(dt), dt, click_id) = 1)
SELECT p.event_id, p.user_id, n.click_id AS nearest_click_id,
       n.dt AS dt_us,
       CASE WHEN n.dt IS NULL THEN NULL
            WHEN n.dt <= 0 THEN 'b' ELSE 'f' END AS side
FROM p LEFT JOIN n ON p.event_id = n.event_id
"""


def a16_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 (r6): the conditional-aggregate family — ``count_if``,
    ``bool_and`` / ``bool_or`` (ANSI EVERY/ANY), and FILTER-style
    conditional sums, the idioms that replace CASE-WHEN pyramids in
    rule audits.  Per order status: urgent-order count, whether ALL
    orders clear a price floor, whether ANY is five-figure, and the
    exact-decimal sum of just the urgent slice."""
    ord_ = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return (ord_.groupBy("o_orderstatus")
            .agg(F.count_if(urgent).alias("n_urgent"),
                 F.bool_and(F.col("o_totalprice") > 900.0)
                 .alias("all_above_floor"),
                 F.bool_or(F.col("o_totalprice") >= 10000.0)
                 .alias("any_five_figure"),
                 F.sum(F.when(urgent, F.col("o_totalprice"))
                       .cast(DEC)).cast("double")
                 .alias("urgent_price_sum")))


A16_SQL = """
SELECT o_orderstatus,
       COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
       BOOL_AND(o_totalprice > 900.0) AS all_above_floor,
       BOOL_OR(o_totalprice >= 10000.0) AS any_five_figure,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
            FILTER (o_orderpriority = '1-URGENT') AS DOUBLE)
         AS urgent_price_sum
FROM orders GROUP BY o_orderstatus
"""


def x110_revenue_concentration(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X110 (r6): REVENUE CONCENTRATION — what share of total revenue
    the top-10 / top-100 customers carry (the whale-dependence
    metric next to X78's Gini): exact decimal revenue sums, top-k
    selected under a (revenue desc, custkey) total order, shares as
    exact x1e6 integer division over cent-scaled integers (no float
    division in the hash-gated columns).

    Scale: one customer-keyed aggregate, a TakeOrderedAndProject
    top-k over the customer frame (``orderBy().limit(100)`` — never
    a global-window rank; the r6 verdict's single-partition fix),
    then a rank window over exactly the 100 surviving rows
    (partitioned by a literal so the bounded exchange is hash, not
    SinglePartition), one broadcast-sized final arithmetic row."""
    ord_ = _t(spark, sf_dir, "orders")
    per = (ord_.groupBy("o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev")))
    cents = (per.select("o_custkey",
                        (F.col("rev") * 100).cast("decimal(38,0)")
                        .alias("rc")))
    from pyspark.sql import Window as W
    from ..exprs import bounded_part
    top100 = (cents.orderBy(F.col("rc").desc(), "o_custkey")
              .limit(100))
    wr = (W.partitionBy(bounded_part("o_custkey"))
          .orderBy(F.col("rc").desc(), "o_custkey"))
    ranked = top100.withColumn("rk", F.row_number().over(wr))
    tot = cents.agg(F.sum("rc").alias("total_cents"),
                    F.count(F.lit(1)).alias("n_customers"))
    top = (ranked.agg(
               F.sum(F.when(F.col("rk") <= 10, F.col("rc")))
               .alias("top10"),
               F.sum("rc").alias("top100"))
           .crossJoin(F.broadcast(tot))
           .select(F.col("n_customers"),
                   F.col("total_cents").alias("t"),
                   "top10", "top100"))
    return top.select(
        "n_customers",
        F.col("t").cast("long").alias("total_cents"),
        F.col("top10").cast("long").alias("top10_cents"),
        F.col("top100").cast("long").alias("top100_cents"),
        F.expr("CAST(top10 * 1000000 DIV t AS LONG)")
        .alias("top10_share_x1e6"),
        F.expr("CAST(top100 * 1000000 DIV t AS LONG)")
        .alias("top100_share_x1e6"))


X110_SQL = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) * 100
              AS DECIMAL(38,0)) AS rc
  FROM orders GROUP BY o_custkey),
rk AS (SELECT rc, ROW_NUMBER() OVER (ORDER BY rc DESC, o_custkey)
                AS rk FROM per),
t AS (SELECT CAST(SUM(rc) AS HUGEINT) AS t,
             COUNT(*) AS n_customers FROM per)
SELECT n_customers,
       CAST(t AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN rk <= 10 THEN rc END) AS BIGINT)
         AS top10_cents,
       CAST(SUM(CASE WHEN rk <= 100 THEN rc END) AS BIGINT)
         AS top100_cents,
       CAST(SUM(CASE WHEN rk <= 10 THEN CAST(rc AS HUGEINT) END)
            * 1000000 // t AS BIGINT) AS top10_share_x1e6,
       CAST(SUM(CASE WHEN rk <= 100 THEN CAST(rc AS HUGEINT) END)
            * 1000000 // t AS BIGINT) AS top100_share_x1e6
FROM rk, t
GROUP BY n_customers, t
"""


def x111_fulfillment_lag(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """X111 (r6): ORDER-FULFILLMENT LAG — days from order date to
    each line's ship date, rolled up per order priority: the
    supply-chain SLA table (does URGENT actually ship faster?).
    Exact integers only: line counts, total lag days, the x1000
    integer mean, the discrete p90 (the x37/x86 quantile
    discipline), and the max.

    Scale: one orderkey-keyed join (orders side is the smaller
    relation — broadcast at fixture scale, shuffle-hash beyond), one
    priority rollup."""
    ord_ = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.to_date("o_orderdate").alias("od"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd"))
    j = li.join(ord_, li.l_orderkey == ord_.o_orderkey).select(
        "o_orderpriority", F.datediff("sd", "od").alias("lag"))
    return (j.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum("lag").cast("long").alias("lag_days_total"),
                 F.expr("1000 * CAST(sum(lag) AS BIGINT)"
                        " div count(1)").alias("mean_lag_x1000"),
                 F.expr("CAST(percentile_disc(0.9) WITHIN GROUP"
                        " (ORDER BY lag) AS LONG)").alias("p90_lag"),
                 F.max("lag").cast("long").alias("max_lag")))


X111_SQL = """
WITH j AS (
  SELECT o_orderpriority,
         DATE_DIFF('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS lag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority, COUNT(*) AS n_lines,
       CAST(SUM(lag) AS BIGINT) AS lag_days_total,
       CAST(1000 * SUM(lag) // COUNT(*) AS BIGINT) AS mean_lag_x1000,
       CAST(QUANTILE_DISC(lag, 0.9) AS BIGINT) AS p90_lag,
       CAST(MAX(lag) AS BIGINT) AS max_lag
FROM j GROUP BY o_orderpriority
"""


def u4_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 (r6): ``unionByName(allowMissingColumns=True)`` — the
    schema-evolution union: two projections with DIFFERENT column
    sets (old records lack o_orderpriority, new records lack
    o_totalprice) align by NAME with NULL fill, the DataFrame form
    of DuckDB's ``UNION ALL BY NAME``.  Positional UNION (U1) would
    silently mis-align these; the by-name form is what multi-vintage
    ingestion actually needs.  The rollup proves both the fill and
    the alignment: per status, counts of rows carrying each
    vintage's column."""
    ord_ = _t(spark, sf_dir, "orders")
    old_v = (ord_.filter(F.col("o_orderkey") % 2 == 0)
             .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    new_v = (ord_.filter(F.col("o_orderkey") % 2 == 1)
             .select("o_orderkey", "o_orderstatus", "o_orderpriority"))
    u = old_v.unionByName(new_v, allowMissingColumns=True)
    return (u.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("o_totalprice").alias("n_with_price"),
                 F.count("o_orderpriority").alias("n_with_priority"),
                 dsum("o_totalprice", "price_sum")))


U4_SQL = """
WITH u AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         NULL AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL BY NAME
  SELECT o_orderkey, o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1)
SELECT o_orderstatus, COUNT(*) AS n,
       COUNT(o_totalprice) AS n_with_price,
       COUNT(o_orderpriority) AS n_with_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
         AS price_sum
FROM u GROUP BY o_orderstatus
"""


def t6_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 (r6): OFFSET pagination — page 3 of the customer list
    (LIMIT 20 OFFSET 40) under a total order, the API-backend query
    shape.  Spark's ``offset()`` landed in 3.4; the total order on
    (c_acctbal DESC, c_custkey) makes every page deterministic —
    without the key tie-break, page boundaries shift run to run (the
    classic pagination bug, declared here as the contract).

    Scale note: OFFSET is O(offset) work on any engine — real APIs
    keyset-paginate (WHERE key > last_seen ORDER BY key LIMIT n);
    declared at the page-3 shape the oracle can replay."""
    cust = _t(spark, sf_dir, "customer")
    return (cust.orderBy(F.col("c_acctbal").desc(), "c_custkey")
            .select("c_custkey", "c_name", "c_acctbal")
            .offset(40).limit(20))


T6_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey
LIMIT 20 OFFSET 40
"""


def j15_multi_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J15 (r6): MULTI-TABLE as-of join — each purchase picks up the
    user's latest prior click AND latest prior view in ONE
    single-shuffle pass (``operators.asof.multi_asof_join``): the
    feature-store point-in-time read, where running N separate as-of
    joins would shuffle the fact side N times.  All payload carries
    share one window operator (same key, order, frame).  The oracle
    runs two native DuckDB ASOF joins — the semantics J15 must equal
    while paying one shuffle instead of two."""
    from ..operators.asof import multi_asof_join
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("prior_click_id"))
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("prior_view_id"))
    out = multi_asof_join(
        purchases,
        [{"df": clicks, "ts": "c_ts", "by": "c_user",
          "cols": ["prior_click_id"]},
         {"df": views, "ts": "v_ts", "by": "v_user",
          "cols": ["prior_view_id"]}],
        left_ts="ts", left_by="user_id")
    return out.select("event_id", "user_id", "value",
                      "prior_click_id", "prior_view_id")


J15_SQL = """
SELECT p.event_id, p.user_id, p.value,
       c.event_id AS prior_click_id, v.event_id AS prior_view_id
FROM (
  SELECT p0.event_id, p0.user_id, p0.value, p0.ts,
         c0.event_id AS click_eid
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p0
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c0
    ON p0.user_id = c0.user_id AND c0.ts <= p0.ts
) p
LEFT JOIN events c ON c.event_id = p.click_eid
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def j16_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J16 (r9): CORRELATED LATERAL JOIN via the Spark 4 DataFrame
    API (``DataFrame.lateralJoin`` + ``Column.outer()`` — public,
    SPARK-46794 family): per customer, the 2 most recent orders
    (o_orderdate desc, o_orderkey total-order tie-break).  The
    per-key-top-k-by-subquery shape T4 expresses with a window,
    expressed the lateral way — Catalyst decorrelates the outer
    reference into a ranked join rather than re-running the inner
    query per row, which is what makes the construct usable at
    100 TB (plan shows a window/join decorrelation, never an
    N-times-rescanned inner).

    Oracle: DuckDB's native LATERAL with the identical inner
    ORDER BY/LIMIT — a decorrelation bug (wrong per-key cut, lost
    correlation filter) hash-mismatches row-for-row."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders")
    top2 = (orders
            .where(F.col("o_custkey") == F.col("c_custkey").outer())
            .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
            .limit(2)
            .select("o_orderkey", "o_totalprice"))
    return cust.lateralJoin(top2).select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")


J16_SQL = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_orderdate DESC, o.o_orderkey LIMIT 2) t
"""


def j9_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: TPC-H Q5-style 6-way star join, with the region predicate
    pushed to the FRONT of the join tree: region is filtered first,
    folded into nation then supplier (all broadcast), and the
    restricted supplier dim broadcast-joins lineitem BEFORE the
    fact-fact shuffle — so the 2-of-5-regions filter drops ~60% of
    lineitem rows before either shuffle (orders⋈lineitem, final agg)
    instead of after all six joins.  At 100 TB that is the difference
    between shuffling 40 TB and 100 TB; Catalyst won't reorder
    user-declared joins this way on its own."""
    cust = _t(spark, sf_dir, "customer")
    ord_ = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    nr = (nat.join(F.broadcast(reg.filter(
              F.col("r_name").isin("ASIA", "EUROPE"))),
              nat.n_regionkey == reg.r_regionkey)
          .select("n_nationkey", "n_name", "r_name"))
    sup_f = (sup.join(F.broadcast(nr), sup.s_nationkey == nr.n_nationkey)
             .select("s_suppkey", "s_nationkey", "n_name", "r_name"))
    return (
        li.join(F.broadcast(sup_f), li.l_suppkey == sup_f.s_suppkey)
        .join(ord_, li.l_orderkey == ord_.o_orderkey)
        .join(cust, ord_.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


J9_SQL = f"""
SELECT r_name, n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# W* — window functions
# --------------------------------------------------------------------------

def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ranking family. Two windows: rank/dense/percent_rank/
    cume_dist over a ties-bearing key (deterministic under ties);
    row_number/ntile over a total order (tie-broken by PK)."""
    cust = _t(spark, sf_dir, "customer")
    bucket = F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket")
    w_ties = W.partitionBy("c_mktsegment").orderBy(F.col("bal_bucket").desc())
    w_total = W.partitionBy("c_mktsegment").orderBy(
        F.col("bal_bucket").desc(), F.col("c_custkey"))
    return (
        cust.select("c_custkey", "c_mktsegment", bucket)
        .withColumn("rnk", F.rank().over(w_ties))
        .withColumn("drnk", F.dense_rank().over(w_ties))
        .withColumn("prnk", F.round(F.percent_rank().over(w_ties), 6))
        .withColumn("cdist", F.round(F.cume_dist().over(w_ties), 6))
        .withColumn("rn", F.row_number().over(w_total))
        .withColumn("tile", F.ntile(4).over(w_total))
    )


W1_SQL = """
SELECT c_custkey, c_mktsegment, CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
       RANK() OVER wt AS rnk,
       DENSE_RANK() OVER wt AS drnk,
       ROUND(PERCENT_RANK() OVER wt, 6) AS prnk,
       ROUND(CUME_DIST() OVER wt, 6) AS cdist,
       ROW_NUMBER() OVER wo AS rn,
       NTILE(4) OVER wo AS tile
FROM customer
WINDOW wt AS (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal / 1000) DESC),
       wo AS (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal / 1000) DESC, c_custkey)
"""


def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead with defaults over a per-user event timeline."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", "event_type", "value",
        F.lag("value", 1, -1.0).over(w).alias("prev_value"),
        F.lead("event_type", 1, "none").over(w).alias("next_type"),
        F.lag("event_id", 2).over(w).alias("prev2_id"),
    )


W2_SQL = """
SELECT event_id, user_id, event_type, value,
       LAG(value, 1, -1.0) OVER w AS prev_value,
       LEAD(event_type, 1, 'none') OVER w AS next_type,
       LAG(event_id, 2) OVER w AS prev2_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def w3_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: ROWS frames — running total (exact decimal) + sliding
    3-row min/max/count per user timeline."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    slide = w.rowsBetween(-2, 0)
    return ev.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast(DEC)).over(run).cast("double")
         .alias("running_value"),
        F.min("value").over(slide).alias("min3"),
        F.max("value").over(slide).alias("max3"),
        F.count(F.lit(1)).over(slide).alias("cnt3"),
    )


W3_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value,
       MIN(value) OVER w3 AS min3,
       MAX(value) OVER w3 AS max3,
       COUNT(*) OVER w3 AS cnt3
FROM events
WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def w4_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: RANGE frame with a numeric offset — orders within 10k
    price below each order, per customer."""
    ord_ = _t(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey").orderBy("o_totalprice")
         .rangeBetween(-10000, 0))
    return ord_.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_10k"),
        F.min("o_totalprice").over(w).alias("min_within_10k"),
    )


W4_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
       COUNT(*) OVER w AS n_within_10k,
       MIN(o_totalprice) OVER w AS min_within_10k
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
"""


def w5_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: first/last over a frame with IGNORE NULLS (nulls injected
    via NULLIF on the 'error' event type)."""
    ev = _t(spark, sf_dir, "events")
    ok_type = F.nullif(F.col("event_type"), F.lit("error"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        ev.select("event_id", "user_id", "ts",
                  ok_type.alias("ok_type"))
        .select(
            "event_id", "user_id",
            F.first("ok_type", ignorenulls=True).over(w).alias("first_ok"),
            F.last("ok_type", ignorenulls=True).over(w).alias("last_ok"),
        )
    )


W5_SQL = """
SELECT event_id, user_id,
       FIRST_VALUE(NULLIF(event_type, 'error') IGNORE NULLS) OVER w AS first_ok,
       LAST_VALUE(NULLIF(event_type, 'error') IGNORE NULLS) OVER w AS last_ok
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def w11_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11 (r11): GROUPS window frame — the third ANSI frame mode
    (SQL:2011 window frame units, alongside ROWS and RANGE), which
    NEITHER engine parses natively — Spark rejects the syntax
    outright (pinned by
    tests/test_plans.py::test_w11_spark_lacks_groups_frames) and
    DuckDB raises "not implemented yet" — so both sides are
    compositions, by different strategies (see ``W11_SQL``).  The
    frame holds every row whose ORDER-BY value lies within +-1 PEER
    GROUP of the current row's: unlike ROWS it is insensitive to row
    order among ties, unlike RANGE the offset counts neighbouring
    DISTINCT order values, not a value delta — the "previous trading
    day / next trading day" frame no value arithmetic can express
    over irregular dates.

    Spark-first composition (``operators.windows.groups_frame_agg``,
    pure DataFrame ops, no UDF): peer groups ARE the distinct
    (partition, order) pairs, so
    1. collapse to one row per peer group carrying the partial
       aggregates (COUNT, exact-decimal SUM) — one shuffle, sized by
       the number of peer groups, not rows;
    2. a GROUPS frame over rows is EXACTLY a ROWS frame over this
       collapsed relation (each row = one peer group);
    3. join the framed group rows back onto the base rows on the
       peer key — broadcast, since the group relation is bounded by
       |priorities| x |dates|.

    Scale (100 TB): the window sort never sees the corpus — it runs
    over the group-count-sized relation; the corpus-side cost is one
    broadcast-join projection.  This beats even a hypothetical native
    GROUPS window, which would shuffle and sort every corpus row into
    per-partition order."""
    from ..operators.windows import groups_frame_agg
    ord_ = _t(spark, sf_dir, "orders")
    framed = groups_frame_agg(
        ord_, ["o_orderpriority"], "o_orderdate",
        {"frame_rows": (F.count(F.lit(1)), "sum"),
         "frame_sum": (F.sum(F.col("o_totalprice").cast(DEC)), "sum")})
    return framed.select(
        "o_orderkey", "o_orderpriority", "o_orderdate", "frame_rows",
        F.col("frame_sum").cast("double").alias("frame_sum"))


# DuckDB's parser also rejects GROUPS frames ("not implemented yet"),
# so the twin is a THIRD formulation of the same semantics: dense-rank
# the peer groups, then a rank-distance self-join (|gi_a - gi_b| <= 1)
# re-aggregates each group's +-1 neighbourhood — structurally unlike
# the Spark side's collapsed-relation ROWS window, so the two engines
# cannot share a mistake.
W11_SQL = """
WITH g AS (
  SELECT o_orderpriority, o_orderdate,
         COUNT(*) AS gn,
         SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS gs,
         DENSE_RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_orderdate) AS gi
  FROM orders GROUP BY 1, 2),
f AS (
  SELECT a.o_orderpriority, a.o_orderdate,
         CAST(SUM(b.gn) AS BIGINT) AS frame_rows,
         CAST(SUM(b.gs) AS DOUBLE) AS frame_sum
  FROM g a JOIN g b
    ON a.o_orderpriority = b.o_orderpriority
   AND b.gi BETWEEN a.gi - 1 AND a.gi + 1
  GROUP BY 1, 2)
SELECT o.o_orderkey, o.o_orderpriority, o.o_orderdate,
       f.frame_rows, f.frame_sum
FROM orders o JOIN f USING (o_orderpriority, o_orderdate)
"""


# --------------------------------------------------------------------------
# T* — sort / limit / top-k
# --------------------------------------------------------------------------

def t1_multi_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: multi-key sort with explicit null placement (nulls
    injected via NULLIF to exercise the null ordering)."""
    sup = _t(spark, sf_dir, "supplier")
    return (
        sup.select(
            "s_suppkey", "s_name",
            F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("mod5"),
            "s_acctbal")
        .orderBy(F.col("mod5").desc_nulls_last(),
                 F.col("s_acctbal").asc(),
                 F.col("s_suppkey"))
    )


T1_SQL = """
SELECT s_suppkey, s_name, NULLIF(s_nationkey % 5, 0) AS mod5, s_acctbal
FROM supplier
ORDER BY mod5 DESC NULLS LAST, s_acctbal ASC, s_suppkey
"""


def t3_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: global top-k — Spark plans TakeOrderedAndProject (per-
    partition heap + driver merge, no full sort). Tie-break on PK."""
    ord_ = _t(spark, sf_dir, "orders")
    return (
        ord_.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


T3_SQL = """
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


def t4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: top-3 customers by balance per market segment
    (row_number + filter; single shuffle on the partition key)."""
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "rn", "c_custkey", "c_name", "c_acctbal")
    )


T4_SQL = """
SELECT c_mktsegment, rn, c_custkey, c_name, c_acctbal FROM (
  SELECT *, ROW_NUMBER() OVER
    (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# U* — set operations
# --------------------------------------------------------------------------

def _u_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ord_ = _t(spark, sf_dir, "orders")
    a = ord_.filter(F.col("o_orderstatus") == "O").select(
        "o_custkey", "o_orderpriority")
    b = ord_.filter(F.col("o_totalprice") > 250000).select(
        "o_custkey", "o_orderpriority")
    return a, b


U_A = "SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'"
U_B = "SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 250000"


def u1_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: UNION ALL vs UNION DISTINCT, summarized by priority."""
    a, b = _u_sides(spark, sf_dir)
    all_n = (a.unionByName(b).groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"))
             .withColumn("kind", F.lit("all")))
    dis_n = (a.unionByName(b).distinct().groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"))
             .withColumn("kind", F.lit("distinct")))
    return all_n.unionByName(dis_n)


U1_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n, 'all' AS kind
FROM (({U_A}) UNION ALL ({U_B})) GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, COUNT(*) AS n, 'distinct' AS kind
FROM (({U_A}) UNION ({U_B})) GROUP BY o_orderpriority
"""


def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: INTERSECT and INTERSECT ALL row counts."""
    a, b = _u_sides(spark, sf_dir)
    return (a.intersect(b).agg(F.count(F.lit(1)).alias("n_distinct"))
            .crossJoin(a.intersectAll(b).agg(F.count(F.lit(1)).alias("n_all"))))


U2_SQL = f"""
SELECT (SELECT COUNT(*) FROM (({U_A}) INTERSECT ({U_B}))) AS n_distinct,
       (SELECT COUNT(*) FROM (({U_A}) INTERSECT ALL ({U_B}))) AS n_all
"""


def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: EXCEPT / EXCEPT ALL row counts."""
    a, b = _u_sides(spark, sf_dir)
    return (a.subtract(b).agg(F.count(F.lit(1)).alias("n_distinct"))
            .crossJoin(a.exceptAll(b).agg(F.count(F.lit(1)).alias("n_all"))))


U3_SQL = f"""
SELECT (SELECT COUNT(*) FROM (({U_A}) EXCEPT ({U_B}))) AS n_distinct,
       (SELECT COUNT(*) FROM (({U_A}) EXCEPT ALL ({U_B}))) AS n_all
"""


def j10_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: entity-resolution fuzzy self-join — customer-name pairs
    within edit distance 1, candidate-generated by a PREFIX BLOCK
    (first 16 chars equal) so the join is a hash equi-join on the
    block key plus a per-pair levenshtein filter, never an O(n^2)
    scan product.  The blocking key is part of the declared
    semantics: a true match differing inside the prefix is out of
    scope (standard blocking trade-off; widen with a second pass on
    another key — e.g. suffix — to tighten recall).

    Scale (100 TB): candidates ∝ sum of block sizes squared; the
    16-char prefix bounds blocks to the name-format's trailing-digit
    cardinality (100 here), and levenshtein runs JVM-side inside
    whole-stage codegen on candidates only."""
    cust = (_t(spark, sf_dir, "customer")
            .select("c_custkey", "c_name",
                    F.substring("c_name", 1, 16).alias("blk")))
    a = cust.select(F.col("blk"), F.col("c_custkey").alias("key_a"),
                    F.col("c_name").alias("name_a"))
    b = cust.select(F.col("blk"), F.col("c_custkey").alias("key_b"),
                    F.col("c_name").alias("name_b"))
    return (a.join(b, "blk")
            .filter(F.col("key_a") < F.col("key_b"))
            .withColumn("dist", F.levenshtein("name_a", "name_b"))
            .filter(F.col("dist") <= 1)
            .select("key_a", "key_b", "dist"))


J10_SQL = """
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       LEVENSHTEIN(a.c_name, b.c_name) AS dist
FROM customer a JOIN customer b
  ON SUBSTRING(a.c_name, 1, 16) = SUBSTRING(b.c_name, 1, 16)
 AND a.c_custkey < b.c_custkey
WHERE LEVENSHTEIN(a.c_name, b.c_name) <= 1
"""


def w6_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: time-series gap-fill — per user, an hourly grid spanning
    their [first, last] event hour, hourly event count + exact-decimal
    value sum, and the classic forward-fill (carry the last observed
    hourly sum across empty hours).  Hours are integer epoch-hour
    buckets (engine-exact; no interval/timezone arithmetic).

    Scale (100 TB): events collapse to the (user, hour) aggregate
    FIRST (one shuffle, state ∝ users x span-hours, not events); the
    grid explode is row-local over the per-user span; the grid-to-agg
    join and the forward-fill window are both keyed by user, so the
    partitioning is reused.  Never a global sort, never a grid over
    the corpus time range for absent users."""
    ev = _t(spark, sf_dir, "events")
    hourly = (ev.select("user_id",
                        F.floor(F.unix_micros("ts") / 3_600_000_000)
                        .alias("h"), "value")
              .groupBy("user_id", "h")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   dsum("value", "hour_sum")))
    spans = (hourly.groupBy("user_id")
             .agg(F.min("h").alias("h0"), F.max("h").alias("h1")))
    grid = spans.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("h"))
    wff = (W.partitionBy("user_id").orderBy("h")
           .rowsBetween(W.unboundedPreceding, 0))
    return (grid.join(hourly, ["user_id", "h"], "left")
            .select("user_id",
                    (F.col("h") * 3600).alias("bucket_start"),
                    F.coalesce("n_events", F.lit(0)).alias("n_events"),
                    "hour_sum",
                    F.last("hour_sum", ignorenulls=True).over(wff)
                     .alias("filled_sum"),
                    F.col("hour_sum").isNull().alias("is_gap")))


W6_SQL = f"""
WITH hourly AS (
  SELECT user_id,
         CAST(FLOOR(EXTRACT(EPOCH FROM ts) / 3600) AS BIGINT) AS h,
         COUNT(*) AS n_events,
         {sql_dsum('value')} AS hour_sum
  FROM events GROUP BY 1, 2),
spans AS (
  SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly
  GROUP BY user_id),
grid AS (
  SELECT user_id, UNNEST(range(h0, h1 + 1)) AS h FROM spans)
SELECT g.user_id, g.h * 3600 AS bucket_start,
       COALESCE(hourly.n_events, 0) AS n_events,
       hourly.hour_sum,
       LAST_VALUE(hourly.hour_sum IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.h
         ROWS UNBOUNDED PRECEDING) AS filled_sum,
       hourly.hour_sum IS NULL AS is_gap
FROM grid g LEFT JOIN hourly ON g.user_id = hourly.user_id
                            AND g.h = hourly.h
"""


def x35_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X35: declarative data-quality audit — the expectation checks a
    pipeline runs before trusting an ingested snapshot.  Row-local
    rules (range / domain / null) compile to ONE conditional-sum scan
    per table; the referential-integrity rule is a broadcast anti-join
    (orders missing their customer).  Output is (rule, n_violations),
    so a clean table is all-zeros — and the whole audit is a fixed
    number of tiny aggregate rows regardless of data volume.
    """
    li = _t(spark, sf_dir, "lineitem")
    ord_ = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")

    def viol(cond, rule):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint"), rule

    li_rules = [
        viol(~F.col("l_quantity").between(1, 50), "lineitem_quantity_range"),
        viol(~F.col("l_discount").between(0.0, 0.1),
             "lineitem_discount_range"),
        viol(F.col("l_shipdate").isNull(), "lineitem_shipdate_null"),
        viol(F.col("l_extendedprice") <= 0, "lineitem_price_positive"),
    ]
    ord_rules = [
        viol(~F.col("o_orderstatus").isin("O", "F", "P"),
             "orders_status_domain"),
        viol(F.col("o_totalprice") <= 0, "orders_totalprice_positive"),
    ]
    li_audit = li.agg(*[c.alias(r) for c, r in li_rules]).unpivot(
        [], [r for _, r in li_rules], "rule", "n_violations")
    ord_audit = ord_.agg(*[c.alias(r) for c, r in ord_rules]).unpivot(
        [], [r for _, r in ord_rules], "rule", "n_violations")
    orphans = (ord_.join(cust, ord_.o_custkey == cust.c_custkey,
                         "left_anti")
               .agg(F.count(F.lit(1)).alias("n_violations"))
               .select(F.lit("orders_custkey_fk").alias("rule"),
                       "n_violations"))
    return li_audit.unionByName(ord_audit).unionByName(orphans)


X35_SQL = """
SELECT 'lineitem_quantity_range' AS rule,
       CAST(SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(SUM(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.1
                THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'lineitem_shipdate_null',
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) FROM lineitem
UNION ALL
SELECT 'lineitem_price_positive',
       CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
            AS BIGINT) FROM lineitem
UNION ALL
SELECT 'orders_status_domain',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders_totalprice_positive',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
            AS BIGINT) FROM orders
UNION ALL
SELECT 'orders_custkey_fk',
       CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
"""


def a15_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 (r5): EXPLICIT grouping sets through the Spark 4
    ``DataFrame.groupingSets`` API — the arbitrary-sets form that
    rollup (a6) and cube (a6) are special cases of: here
    ((returnflag, linestatus), (linestatus), ()) — a mix no
    rollup/cube can express.  Same 2-phase aggregate shape as A6;
    the expansion factor is the number of sets, applied map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
        "l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("l_quantity").cast("long").alias("qty"),
             F.grouping_id().cast("long").alias("gid")))


A15_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(l_quantity) AS BIGINT) AS qty,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""


def w9_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 (r5): RUNNING DISTINCT COUNT — per user ordered by time,
    how many distinct event types the user has touched so far (the
    journey-breadth signal).  ``count(distinct) OVER`` an expanding
    frame is unsupported in both engines; the declared rewrite is
    the first-occurrence trick: a row_number over (user, type) marks
    each type's first appearance, and a running SUM of those flags
    over the user's (ts, event_id) order IS the distinct count —
    two windows over ONE user-keyed shuffle (the second partitions
    on a subset-prefixed key), exact integers throughout."""
    ev = _t(spark, sf_dir, "events")
    first_seen = (F.row_number().over(
        W.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")) == 1).cast("long")
    d = ev.select("event_id", "user_id", "ts",
                  first_seen.alias("_f"))
    running = F.sum("_f").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow))
    return d.select("event_id", "user_id",
                    running.cast("long").alias("n_types_so_far"))


W9_SQL = """
WITH f AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS fs
  FROM events)
SELECT event_id, user_id,
       CAST(SUM(fs) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_types_so_far
FROM f
"""


def a17_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 (r5): MODE per group with a DETERMINISTIC tie-break —
    the most frequent quantity per returnflag.  Spark's ``mode()``
    and DuckDB's ``MODE()`` both break frequency ties
    engine-arbitrarily, so neither builtin can hash-match; the
    declared operator is the count + ranked-window rewrite (highest
    count, then smallest value), which is exact on both engines and
    is also the plan you want at scale: the (group, value) count is
    ONE data-scale shuffle with map-side combine, and the ranking
    window runs over the aggregated frame (rows per group = distinct
    values, a bounded domain), never the raw relation."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = (li.groupBy("l_returnflag",
                      F.col("l_quantity").cast("long").alias("q"))
           .agg(F.count(F.lit(1)).alias("n")))
    w = W.partitionBy("l_returnflag").orderBy(F.col("n").desc(), "q")
    return (cnt.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("l_returnflag", F.col("q").alias("mode_qty"),
                    F.col("n").alias("mode_count")))


A17_SQL = """
WITH c AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)),
r AS (
  SELECT l_returnflag, q, n,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, q) AS rk
  FROM c)
SELECT l_returnflag, q AS mode_qty, n AS mode_count
FROM r WHERE rk = 1
"""


def w7_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 (r5): the distribution-rank window family — ntile(4),
    percent_rank, cume_dist per event_type over (value, event_id)
    total order (the tie-break makes every rank deterministic).
    Completes the W inventory beyond ranking/offsets/frames."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id", "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"))


W7_SQL = """
SELECT event_id, event_type,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


def w8_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 (r5): burst-collapse DEBOUNCE — per (user, event_type),
    chain consecutive events each within 60 s of the PREVIOUS event
    into a burst and keep only the burst leader (the leading-edge
    debounce every event-ingest pipeline runs against double-fires
    and retry storms).  Pure window algebra: the gap flag starts a
    burst, a running sum names it, a per-burst rank keeps the leader
    and a count reports the collapsed size — two passes over one
    (user, type)-keyed shuffle, no state, no recurrence (the
    TRAILING-edge variant, gap-from-last-KEPT, is the X49-style
    per-key recurrence; this form is the one plain windows can
    express exactly).  Total order (ts, event_id) makes every burst
    id deterministic."""
    ev = _t(spark, sf_dir, "events")
    wo = W.partitionBy("user_id", "event_type") \
          .orderBy("ts", "event_id")
    gap_ms = (F.unix_millis(F.col("ts"))
              - F.unix_millis(F.lag("ts").over(wo)))
    new_burst = (F.lag("ts").over(wo).isNull()
                 | (gap_ms > 60_000)).cast("long")
    d = (ev.select("event_id", "user_id", "event_type", "ts")
         .withColumn("_nb", new_burst)
         .withColumn("burst_id", F.sum("_nb").over(
             wo.rowsBetween(W.unboundedPreceding, W.currentRow))))
    wb = W.partitionBy("user_id", "event_type", "burst_id")
    d = (d.withColumn("_rk", F.row_number().over(
            wb.orderBy("ts", "event_id")))
         .withColumn("burst_len", F.count(F.lit(1)).over(wb)))
    return (d.filter(F.col("_rk") == 1)
            .select("event_id", "user_id", "event_type",
                    F.col("burst_id").cast("long").alias("burst_id"),
                    F.col("burst_len").cast("long").alias("burst_len")))


W8_SQL = """
WITH g AS (
  SELECT event_id, user_id, event_type, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 60000
              THEN 1 ELSE 0 END AS nb
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type
               ORDER BY ts, event_id)),
b AS (
  SELECT event_id, user_id, event_type, ts,
         SUM(nb) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS burst_id
  FROM g),
r AS (
  SELECT event_id, user_id, event_type, burst_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type, burst_id
                            ORDER BY ts, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY user_id, event_type, burst_id)
           AS burst_len
  FROM b)
SELECT event_id, user_id, event_type,
       CAST(burst_id AS BIGINT) AS burst_id,
       CAST(burst_len AS BIGINT) AS burst_len
FROM r WHERE rk = 1
"""


QUERIES: dict[str, tuple] = {
    "a15_grouping_sets": (a15_grouping_sets, A15_SQL),
    "a17_mode": (a17_mode, A17_SQL),
    "w8_debounce": (w8_debounce, W8_SQL),
    "w9_running_distinct": (w9_running_distinct, W9_SQL),
    "w7_distribution_ranks": (w7_distribution_ranks, W7_SQL),
    "a1_pricing_summary": (a1_pricing_summary, A1_SQL),
    "a2_global_agg": (a2_global_agg, A2_SQL),
    "a3_count_distinct": (a3_count_distinct, A3_SQL),
    "a4_stddev_var": (a4_stddev_var, A4_SQL),
    "a5_having": (a5_having, A5_SQL),
    "a6_rollup": (a6_rollup, A6_SQL),
    "a6_cube": (a6_cube, A6_CUBE_SQL),
    "a7_argmax": (a7_argmax, A7_SQL),
    "a8_collect_list": (a8_collect_list, A8_SQL),
    "a9_percentile": (a9_percentile, A9_SQL),
    "a10_approx_distinct": (a10_approx_distinct, A10_SQL),
    "a11_approx_percentile": (a11_approx_percentile, A11_SQL),
    "a12_two_phase": (a12_two_phase, A12_SQL),
    "a13_corr_covar": (a13_corr_covar, A13_SQL),
    "q1_project_compute": (q1_project_compute, Q1_SQL),
    "q2_cast": (q2_cast, Q2_SQL),
    "q3_filter": (q3_filter, Q3_SQL),
    "q4_distinct": (q4_distinct, Q4_SQL),
    "j1_inner_join": (j1_inner_join, J1_SQL),
    "j2_left_join": (j2_left_join, J2_SQL),
    "j2_full_outer": (j2_full_outer, J2_FULL_SQL),
    "j3_semi_anti": (j3_semi_anti, J3_SQL),
    "j4_cross_join": (j4_cross_join, J4_SQL),
    "j5_broadcast_join": (j5_broadcast_join, J5_SQL),
    "j6_theta_join": (j6_theta_join, J6_SQL),
    "j7_range_join": (j7_range_join, J7_SQL),
    "j8_asof_join": (j8_asof_join, J8_SQL),
    "j8b_asof_forward": (j8b_asof_forward, J8B_SQL),
    "j8c_asof_tolerance": (j8c_asof_tolerance, J8C_SQL),
    "j14_asof_nearest": (j14_asof_nearest, J14_SQL),
    "j15_multi_asof": (j15_multi_asof, J15_SQL),
    "j16_lateral_topk": (j16_lateral_topk, J16_SQL),
    "j9_star_join": (j9_star_join, J9_SQL),
    "j10_fuzzy_join": (j10_fuzzy_join, J10_SQL),
    "x35_quality_audit": (x35_quality_audit, X35_SQL),
    "w1_ranking": (w1_ranking, W1_SQL),
    "w2_lag_lead": (w2_lag_lead, W2_SQL),
    "w3_running_frames": (w3_running_frames, W3_SQL),
    "w4_range_frame": (w4_range_frame, W4_SQL),
    "w5_first_last": (w5_first_last, W5_SQL),
    "w6_gapfill": (w6_gapfill, W6_SQL),
    "w11_groups_frame": (w11_groups_frame, W11_SQL),
    "t1_multi_sort": (t1_multi_sort, T1_SQL),
    "t3_global_topk": (t3_global_topk, T3_SQL),
    "t4_topk_per_group": (t4_topk_per_group, T4_SQL),
    "u1_union": (u1_union, U1_SQL),
    "u2_intersect": (u2_intersect, U2_SQL),
    "u3_except": (u3_except, U3_SQL),
    "u4_union_by_name": (u4_union_by_name, U4_SQL),
    "a16_conditional_aggs": (a16_conditional_aggs, A16_SQL),
    "x110_revenue_concentration": (x110_revenue_concentration,
                                   X110_SQL),
    "x111_fulfillment_lag": (x111_fulfillment_lag, X111_SQL),
    "t6_pagination": (t6_pagination, T6_SQL),
}
