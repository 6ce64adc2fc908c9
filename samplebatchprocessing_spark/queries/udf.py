"""UDF / UDAF / UDTF surface (SURVEY §2B D1-D6) — the generalization
of the reference's arbitrary per-file ``command`` (GetJobs.py:51-53).

Every declared UDF body is a pure function mirrored as a DuckDB SQL
expression, so these stay oracle-checkable.  Performance discipline:
D1 exists to DECLARE row-at-a-time UDFs work, but every other entry
is Arrow-vectorized (pandas_udf / applyInPandas / mapInPandas) — the
only sanctioned Python hot paths at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table


def d1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: row-at-a-time Python UDF (declared pure: length % 97)."""
    @F.udf(T.IntegerType())
    def len_mod(s: str) -> int:
        return len(s) % 97

    doc = load_table(spark, sf_dir, "documents")
    return doc.select("doc_id", len_mod("text").alias("len_mod97"))


D1_SQL = "SELECT doc_id, CAST(LENGTH(text) % 97 AS INT) AS len_mod97 FROM documents"


def d2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: vectorized Series->Series pandas UDF (Arrow batches).
    net = price * (1 - discount): same IEEE double ops as SQL."""
    @F.pandas_udf(T.DoubleType())
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net"))


D2_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net
FROM lineitem
"""


def d3_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: grouped-map transform — per-user event normalization
    (delta from the user's min value; order index by (ts, event_id)).
    Exact arithmetic only (min/subtract/cumcount) so the oracle is a
    window rewrite."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value")

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        pdf["delta_from_min"] = pdf["value"] - pdf["value"].min()
        pdf["seq"] = range(1, len(pdf) + 1)
        return pdf[["event_id", "user_id", "delta_from_min", "seq"]]

    return ev.groupBy("user_id").applyInPandas(
        per_user,
        "event_id long, user_id long, delta_from_min double, seq long")


D3_SQL = """
SELECT event_id, user_id,
       value - MIN(value) OVER (PARTITION BY user_id) AS delta_from_min,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events
"""


def d4_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: per-batch transform (the direct heir of the reference's
    per-file command, R7): filter + computed columns."""
    ord_ = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")

    def op(batches):
        for pdf in batches:
            out = pdf[pdf["o_totalprice"] > 100000].copy()
            out["half_price"] = out["o_totalprice"] * 0.5
            out["status_lower"] = out["o_orderstatus"].str.lower()
            yield out[["o_orderkey", "half_price", "status_lower"]]

    return ord_.mapInPandas(
        op, "o_orderkey long, half_price double, status_lower string")


D4_SQL = """
SELECT o_orderkey, o_totalprice * 0.5 AS half_price,
       LOWER(o_orderstatus) AS status_lower
FROM orders WHERE o_totalprice > 100000
"""


def d5_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: one-row-to-many via a UDF-produced array + explode
    (plain whitespace split, distinct from L2's regex pipeline)."""
    @F.udf(T.ArrayType(T.StringType()))
    def ws_split(s: str) -> list[str]:
        return s.split(" ")

    doc = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100)
    return (doc.select("doc_id",
                       F.explode(ws_split("text")).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n")))


D5_SQL = """
SELECT token, COUNT(*) AS n
FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
      FROM documents WHERE doc_id < 100)
GROUP BY token
"""


def d6_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: UDAF via applyInPandas reduction — per event_type ratio of
    integer sums (exact int accumulation -> deterministic)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"))

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        k_sum = int(pdf["k"].sum())
        n = len(pdf)
        return pd.DataFrame({
            "event_type": [pdf["event_type"].iloc[0]],
            "k_sum": [k_sum],
            "n": [n],
            "k_mean": [k_sum / n],
        })

    return ev.groupBy("event_type").applyInPandas(
        reduce_group, "event_type string, k_sum long, n long, k_mean double")


D6_SQL = """
SELECT event_type,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_sum,
       COUNT(*) AS n,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS DOUBLE)
         / COUNT(*) AS k_mean
FROM events GROUP BY event_type
"""


def d7_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 (r5): Spark 4 POLYMORPHIC UDTF with a TABLE argument — the
    ``analyze()`` method declares the input-table contract itself
    (partition by source, order by n_chars DESC / doc_id), so the
    planner routes each source's rows, pre-sorted, through one UDTF
    instance and the Python body is a trivial streaming top-k
    counter.  This is the Spark-4-native form of "run custom logic
    per group in a declared order" — no manual repartition, no
    window function, requirements live WITH the function.

    Scale: partitioning is declared, so the exchange is one hash
    shuffle on source; per-instance state is k rows.  Oracle: the
    equivalent ranked window."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import (AnalyzeArgument, AnalyzeResult,
                                  OrderingColumn, PartitioningColumn)

    @udtf
    class TopDocsPerSource:
        def __init__(self):
            self._seen = 0

        @staticmethod
        def analyze(arg: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                schema=T.StructType()
                .add("source", T.StringType())
                .add("doc_id", T.LongType())
                .add("n_chars", T.LongType())
                .add("rk", T.IntegerType()),
                partitionBy=[PartitioningColumn("source")],
                orderBy=[OrderingColumn("n_chars", ascending=False),
                         OrderingColumn("doc_id")])

        def eval(self, row):
            if self._seen < 2:
                self._seen += 1
                yield (row["source"], row["doc_id"], row["n_chars"],
                       self._seen)

    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "d7_documents")
    spark.udtf.register("d7_top_docs", TopDocsPerSource)
    return spark.sql(
        "SELECT * FROM d7_top_docs(TABLE(SELECT source, doc_id, n_chars"
        " FROM d7_documents))")


D7_SQL = """
SELECT source, doc_id, n_chars, CAST(rk AS INTEGER) AS rk
FROM (SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents)
WHERE rk <= 2
"""


def d8_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 (r5): Arrow-OPTIMIZED Python scalar UDF (Spark 4
    ``useArrow=True``) — same row-at-a-time authoring surface as D1,
    but the exchange with the Python worker rides Arrow batches
    instead of pickled rows (the migration path for legacy row UDFs
    that can't be rewritten as pandas UDFs wholesale).  The function
    body is deliberately non-vectorizable control flow (per-row
    branching checksum) so the row surface is honest; the oracle
    replays the same integer arithmetic in SQL."""
    from pyspark.sql.functions import udf

    @udf("long", useArrow=True)
    def branchy_checksum(key: int, qty) -> int:
        q = int(qty)
        acc = (key * 31 + q) % 1000003
        if q % 3 == 0:
            acc = (acc * 7 + 1) % 1000003
        elif q % 3 == 1:
            acc = (acc * 11 + 2) % 1000003
        else:
            acc = (acc * 13 + 3) % 1000003
        return acc

    li = load_table(spark, sf_dir, "lineitem")
    return (li.select((F.col("l_orderkey") * 8 + F.col("l_linenumber"))
                      .alias("k"),
                      F.col("l_quantity").cast("int").alias("q"))
            .select(branchy_checksum("k", "q").alias("cs"))
            .groupBy((F.col("cs") % 10).cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("cs").cast("long").alias("cs_sum")))


D8_SQL = """
WITH b AS (
  SELECT l_orderkey * 8 + l_linenumber AS k,
         CAST(l_quantity AS INTEGER) AS q
  FROM lineitem),
c AS (
  SELECT CASE WHEN q % 3 = 0
              THEN (((k * 31 + q) % 1000003) * 7 + 1) % 1000003
              WHEN q % 3 = 1
              THEN (((k * 31 + q) % 1000003) * 11 + 2) % 1000003
              ELSE (((k * 31 + q) % 1000003) * 13 + 3) % 1000003
         END AS cs
  FROM b)
SELECT CAST(cs % 10 AS INTEGER) AS bucket, COUNT(*) AS n,
       CAST(SUM(cs) AS BIGINT) AS cs_sum
FROM c GROUP BY cs % 10
"""


def d9_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 (r6): ``mapInArrow`` — the LOWEST-overhead Python boundary:
    the worker receives raw ``pyarrow.RecordBatch`` objects and
    answers with RecordBatches, no pandas materialization at all
    (the surface for Arrow-native kernels and zero-copy handoffs to
    C++/Rust libraries).  The batch kernel computes an exact integer
    line-value checksum with ``pyarrow.compute`` vector ops —
    integer arithmetic, so accumulation grouping is
    order-irrelevant and the SQL twin replays it exactly.

    Completes the D ladder: D1 pickled rows -> D8 Arrow-batched row
    UDF -> D2 pandas series -> D3/D4 pandas frames -> D9 raw Arrow.

    Scale: one pass, no shuffle before the declared rollup; Arrow
    batches avoid the pandas conversion cost the other surfaces
    pay."""
    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        def mod(x, m):   # pyarrow.compute has no modulo kernel;
            s = pa.scalar(m, pa.int64())   # x >= 0, so trunc == floor
            return pc.subtract(x, pc.multiply(pc.divide(x, s), s))

        for rb in batches:
            t = pa.Table.from_batches([rb])
            k = pc.add(pc.multiply(t.column("l_orderkey"),
                                   pa.scalar(8, pa.int64())),
                       pc.cast(t.column("l_linenumber"), pa.int64()))
            q = pc.cast(t.column("l_quantity"), pa.int64())
            cs = mod(pc.add(pc.multiply(k, pa.scalar(31, pa.int64())),
                            q), 1000003)
            out = pa.table({"bucket": pc.cast(mod(cs, 10), pa.int32()),
                            "cs": cs})
            yield from out.to_batches()

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity")
    mapped = li.mapInArrow(kernel, "bucket int, cs long")
    return (mapped.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("cs").cast("long").alias("cs_sum")))


D9_SQL = """
WITH b AS (
  SELECT ((l_orderkey * 8 + l_linenumber) * 31
          + CAST(l_quantity AS BIGINT)) % 1000003 AS cs
  FROM lineitem)
SELECT CAST(cs % 10 AS INT) AS bucket, COUNT(*) AS n,
       CAST(SUM(cs) AS BIGINT) AS cs_sum
FROM b GROUP BY 1
"""


def d10_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10 (r9): COGROUPED grouped-map — the one Pandas-UDF API shape
    D1–D9 left uncovered (``groupBy().cogroup().applyInPandas``,
    public PySpark API): per-user LAST-TOUCH ATTRIBUTION, pairing
    each purchase event with the user's most recent click at or
    before it (``pd.merge_asof`` per cogroup — the canonical use:
    both sides of a keyed pair arrive as aligned pandas frames
    WITHOUT a pre-join).

    Determinism: clicks are sorted (ts, event_id) so the backward
    as-of tie-break on equal ts is max event_id; the lag is exact
    integer microseconds.  Purchases with no prior click are dropped
    (inner as-of), keeping every output column scalar non-null.

    Scale (100 TB): cogroup shuffles BOTH sides once on user_id and
    streams each key's pair of Arrow batches; no all-pairs join, no
    driver materialization.  The j8-family as-of joins express the
    same semantics relationally — this row certifies the cogroup
    PLUMBING (schema, dual-frame signature, empty-side behavior)
    against that relational truth."""
    # Each cogroup side gets its OWN load_table lineage: self-cogroup
    # of two filters over ONE DataFrame hits a Spark analyzer
    # attribute-dedup hazard when the source carries a derived column
    # (the nanos-fixture ts normalization) — the right side arrives in
    # the Python worker pruned to just the grouping key (observed at
    # sf0.1; tests/test_invariants.py locks the fix at that scale).
    purch = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type").filter(
        F.col("event_type") == "purchase")
    clicks = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type").filter(
        F.col("event_type") == "click")

    def last_touch(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = ["purchase_id", "user_id", "click_id", "lag_us"]
        if not len(left) or not len(right):
            return pd.DataFrame(columns=cols)
        left = left.sort_values(["ts", "event_id"])
        # merge_asof CONSUMES the on-column, so carry the click ts
        # under its own name for the lag arithmetic
        right = (right.sort_values(["ts", "event_id"])
                 .assign(cts=lambda r: r["ts"]))
        m = pd.merge_asof(left, right, on="ts", direction="backward",
                          suffixes=("", "_c"))
        m = m[m["event_id_c"].notna()]
        out = pd.DataFrame({
            "purchase_id": m["event_id"],
            "user_id": m["user_id"],
            "click_id": m["event_id_c"].astype("int64"),
            # unit-explicit (r10, ADVICE): dividing by a Timedelta is
            # exact microseconds at ANY Arrow timestamp resolution,
            # where .astype('int64')//1000 silently assumed ns
            "lag_us": ((m["ts"] - m["cts"])
                       // pd.Timedelta(microseconds=1)).astype("int64"),
        })
        return out[cols]

    return (purch.groupBy("user_id")
            .cogroup(clicks.groupBy("user_id"))
            .applyInPandas(last_touch,
                           "purchase_id long, user_id long, "
                           "click_id long, lag_us long"))


D10_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
     c AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
     j AS (SELECT p.event_id AS purchase_id, p.user_id,
                  c.event_id AS click_id,
                  CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT)
                    AS lag_us,
                  ROW_NUMBER() OVER (PARTITION BY p.event_id
                                     ORDER BY c.ts DESC, c.event_id DESC)
                    AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
SELECT purchase_id, user_id, click_id, lag_us FROM j WHERE rn = 1
"""


def d11_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11 (r10): GROUPED-MAP Arrow — ``groupBy().applyInArrow``
    (public PySpark 4 API), the last uncovered cell of the
    UDF-surface matrix: D3 is the grouped map through pandas, D9 the
    ungrouped map through raw Arrow; this is the grouped map with NO
    pandas materialization — each group arrives as one
    ``pyarrow.Table`` and the kernel answers with a Table, all
    arithmetic in ``pyarrow.compute`` vector ops (the surface for
    handing whole groups to Arrow-native C++/Rust kernels).

    Per (l_returnflag, l_linestatus) group: exact integer stats —
    row count, quantity scaled to a cent grid and summed as int64
    (both engines floor the same IEEE product), max order key.
    Declared as an API-certification row (the d10 discipline): the
    same aggregate is expressible relationally, so the oracle pins
    the Arrow plumbing — group batching, Table signature, schema
    mapping — not new semantics.  Scale: at 100 TB you'd write this
    aggregation with built-ins (map-side combine beats shipping
    groups to Python); the grouped-Arrow surface is for kernels
    built-ins CAN'T express, and those inherit exactly this shuffle
    shape (one hash partition on the group key, each group streamed
    once)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_orderkey")

    def gstats(table):
        import pyarrow as pa
        import pyarrow.compute as pc
        cents = pc.cast(pc.floor(pc.multiply(
            table.column("l_quantity"), pa.scalar(100.0))), pa.int64())
        return pa.table({
            "l_returnflag": [table.column("l_returnflag")[0].as_py()],
            "l_linestatus": [table.column("l_linestatus")[0].as_py()],
            "n": pa.array([table.num_rows], pa.int64()),
            "qty_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
            "max_orderkey": pa.array(
                [pc.max(table.column("l_orderkey")).as_py()], pa.int64()),
        })

    return (li.groupBy("l_returnflag", "l_linestatus")
            .applyInArrow(gstats,
                          "l_returnflag string, l_linestatus string, "
                          "n long, qty_cents long, max_orderkey long"))


D11_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS qty_cents,
       MAX(l_orderkey) AS max_orderkey
FROM lineitem GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "d1_scalar_udf": (d1_scalar_udf, D1_SQL),
    "d2_pandas_udf": (d2_pandas_udf, D2_SQL),
    "d3_apply_in_pandas": (d3_apply_in_pandas, D3_SQL),
    "d4_map_in_pandas": (d4_map_in_pandas, D4_SQL),
    "d5_udtf_explode": (d5_udtf_explode, D5_SQL),
    "d6_udaf_grouped": (d6_udaf_grouped, D6_SQL),
    "d7_udtf_table_arg": (d7_udtf_table_arg, D7_SQL),
    "d8_arrow_udf": (d8_arrow_udf, D8_SQL),
    "d9_map_in_arrow": (d9_map_in_arrow, D9_SQL),
    "d10_cogrouped_pandas": (d10_cogrouped_pandas, D10_SQL),
    "d11_apply_in_arrow": (d11_apply_in_arrow, D11_SQL),
}
