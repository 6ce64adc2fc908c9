"""Scalar function surface (SURVEY §2B F1-F8), exercised over real
fixture columns.  All JVM-side built-ins (whole-stage codegen) — the
Python process never touches a row.

Dialect notes encoded here (and mirrored in the oracle SQL):
- DuckDB ``strpos`` == Spark ``instr`` (1-based, 0 when absent)
- DuckDB rounds double->int casts, Spark truncates -> use FLOOR
- ``pmod`` has no DuckDB twin -> ``((a % b) + b) % b``
- libm functions (exp/ln/log10) can differ in the last ulp across
  runtimes -> rounded to 6 dp
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def f1_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string functions over documents.text / customer names."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head10_upper"),
        F.length("text").alias("n_chars"),
        F.length(F.trim(F.lit("  pad  "))).alias("trim_len"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.instr("text", "spark").alias("spark_pos"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.rpad("source", 6, ".").alias("source_pad"),
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.substring("text", 1, 20), r"[aeiou]", "*")
         .alias("devoweled"),
        F.col("text").startswith("key").alias("starts_key"),
        F.replace(F.col("lang"), F.lit("en"), F.lit("EN")).alias("lang_repl"),
    )


F1_SQL = """
SELECT doc_id,
       UPPER(SUBSTRING(text, 1, 10)) AS head10_upper,
       LENGTH(text) AS n_chars,
       LENGTH(TRIM('  pad  ')) AS trim_len,
       LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
       STRPOS(text, 'spark') AS spark_pos,
       lang || ':' || source AS lang_source,
       LPAD(lang, 5, '_') AS lang_pad,
       RPAD(source, 6, '.') AS source_pad,
       REGEXP_EXTRACT(text, '([a-z]+)', 1) AS first_word,
       REGEXP_REPLACE(SUBSTRING(text, 1, 20), '[aeiou]', '*', 'g') AS devoweled,
       STARTS_WITH(text, 'key') AS starts_key,
       REPLACE(lang, 'en', 'EN') AS lang_repl
FROM documents
"""


def f2_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date/time functions over orders/events timestamps."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day_bucket"),
        F.to_date("ts").alias("as_date"),
        F.date_add(F.to_date("ts"), 30).alias("plus30"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
         .alias("days_since_epoch0"),
        F.unix_micros(F.col("ts")).alias("epoch_us"),
        F.make_date(F.year("ts"), F.month("ts"), F.lit(1)).alias("month_start"),
    )


F2_SQL = """
SELECT event_id,
       YEAR(ts) AS y, MONTH(ts) AS m, DAY(ts) AS d,
       HOUR(ts) AS h, MINUTE(ts) AS mi,
       CAST(DATE_TRUNC('day', ts) AS DATE) AS day_bucket,
       CAST(ts AS DATE) AS as_date,
       CAST(ts AS DATE) + 30 AS plus30,
       DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_epoch0,
       EPOCH_US(ts) AS epoch_us,
       MAKE_DATE(YEAR(ts), MONTH(ts), 1) AS month_start
FROM events
"""


def f3_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math functions over lineitem numerics."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("abs_dev"),
        # NOT round(x/1000, 2): Spark rounds the shortest decimal repr
        # (HALF_UP on "64.835"), DuckDB rounds the binary value
        # (64.834999... -> 64.83) — truncate via floor instead.
        (F.floor(F.col("l_extendedprice") / 10) / 100).alias("price_k"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 6).alias("disc_sq"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.log10(F.col("l_extendedprice")), 6).alias("log10_price"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("sign_dev"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


F3_SQL = """
SELECT l_orderkey, l_linenumber,
       ABS(l_quantity - 25) AS abs_dev,
       FLOOR(l_extendedprice / 10) / 100 AS price_k,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
       ROUND(SQRT(l_quantity), 6) AS sqrt_qty,
       ROUND(POW(l_discount + 1, 2), 6) AS disc_sq,
       ROUND(EXP(l_discount), 6) AS exp_disc,
       ROUND(LN(l_extendedprice), 6) AS ln_price,
       ROUND(LOG10(l_extendedprice), 6) AS log10_price,
       ((l_orderkey % 7) + 7) % 7 AS key_mod7,
       CAST(SIGN(l_quantity - 25) AS INT) AS sign_dev,
       GREATEST(l_discount, l_tax) AS max_rate,
       LEAST(l_discount, l_tax) AS min_rate
FROM lineitem
"""


def f4_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: coalesce / nullif / nvl / CASE / isnan over injected nulls."""
    ord_ = load_table(spark, sf_dir, "orders")
    maybe_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return ord_.select(
        "o_orderkey",
        maybe_null.alias("status_or_null"),
        F.coalesce(maybe_null, F.lit("PENDING")).alias("status_filled"),
        F.nvl(maybe_null, F.lit("?")).alias("status_nvl"),
        F.when(maybe_null.isNull(), "was_p").otherwise("not_p").alias("p_flag"),
        F.isnan(F.when(F.col("o_orderkey") % 2 == 0, F.lit(float("nan")))
                .otherwise(F.col("o_totalprice"))).alias("nan_check"),
        F.isnull(maybe_null).alias("is_null"),
    )


F4_SQL = """
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
       COALESCE(NULLIF(o_orderstatus, 'P'), '?') AS status_nvl,
       CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 'was_p' ELSE 'not_p' END AS p_flag,
       ISNAN(CASE WHEN o_orderkey % 2 = 0 THEN 'NaN'::DOUBLE ELSE o_totalprice END) AS nan_check,
       NULLIF(o_orderstatus, 'P') IS NULL AS is_null
FROM orders
"""


def f5_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: array functions + higher-order transform/filter/aggregate
    over tokenized document text."""
    doc = load_table(spark, sf_dir, "documents")
    # r15 (row-level staging, the r14 lang_id discipline): the raw
    # split() expression was referenced 8x per row — stage it once
    doc = doc.select("doc_id", F.split("text", " ").alias("__toks"))
    toks = F.col("__toks")
    return doc.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.to_json(F.slice(F.array_sort(F.array_distinct(toks)), 1, 5))
         .alias("first5_sorted"),
        F.element_at(toks, 1).alias("tok1"),
        F.element_at(toks, -1).alias("tok_last"),
        F.to_json(F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)))
         .alias("head3_upper"),
        F.to_json(F.filter(toks, lambda x: F.length(x) > 4))
         .alias("long_tokens"),
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
         .alias("total_token_chars"),
    )


F5_SQL = """
SELECT doc_id,
       LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
       LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS has_spark,
       LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct_tokens,
       CAST(TO_JSON(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' ')))[1:5]) AS VARCHAR) AS first5_sorted,
       STRING_SPLIT(text, ' ')[1] AS tok1,
       STRING_SPLIT(text, ' ')[-1] AS tok_last,
       CAST(TO_JSON(LIST_TRANSFORM(STRING_SPLIT(text, ' ')[1:3], x -> UPPER(x))) AS VARCHAR) AS head3_upper,
       CAST(TO_JSON(LIST_FILTER(STRING_SPLIT(text, ' '), x -> LENGTH(x) > 4)) AS VARCHAR) AS long_tokens,
       CAST(LIST_AGGREGATE(LIST_TRANSFORM(STRING_SPLIT(text, ' '), x -> LENGTH(x)), 'sum')
            AS BIGINT) AS total_token_chars
FROM documents
"""


def f6_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: struct/map construction + field access; the one array
    output (map_keys) is JSON-serialized per the §2B protocol."""
    nat = load_table(spark, sf_dir, "nation")
    st = F.struct(F.col("n_name").alias("name"),
                  F.col("n_regionkey").alias("rk"))
    mp = F.create_map(F.lit("nk"), F.col("n_nationkey").cast("long"),
                      F.lit("rk"), F.col("n_regionkey").cast("long"))
    return nat.select(
        "n_nationkey",
        st.getField("name").alias("struct_name"),
        (st.getField("rk") + 100).alias("struct_rk_plus"),
        F.to_json(F.sort_array(F.map_keys(mp))).alias("mkeys"),
        F.element_at(mp, "nk").alias("m_nk"),
        F.size(mp).alias("m_size"),
    )


F6_SQL = """
SELECT n_nationkey,
       STRUCT_PACK(name := n_name, rk := n_regionkey).name AS struct_name,
       STRUCT_PACK(name := n_name, rk := n_regionkey).rk + 100 AS struct_rk_plus,
       CAST(TO_JSON(LIST_SORT(MAP_KEYS(MAP(['nk','rk'], [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)])))) AS VARCHAR) AS mkeys,
       MAP(['nk','rk'], [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)])['nk'][1] AS m_nk,
       CARDINALITY(MAP(['nk','rk'], [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)])) AS m_size
FROM nation
"""


def f7_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: JSON extraction from events.props — path extract, typed
    from_json, and an aggregation over the extracted value."""
    ev = load_table(spark, sf_dir, "events")
    k_int = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k_int.alias("k"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("k").alias("k_sum"),
             F.min("k").alias("k_min"),
             F.max("k").alias("k_max"))
    )


F7_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
       MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS k_min,
       MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS k_max
FROM events GROUP BY event_type
"""


def f11_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 (r9): the Spark 4 VARIANT type (``parse_json`` /
    ``variant_get`` / ``schema_of_variant`` — public, the
    semi-structured flagship of Spark 4.0): parse events.props ONCE
    into the binary variant encoding, then do typed extraction and
    schema inspection on the variant value — distinct from F7, which
    re-parses the JSON STRING per path via get_json_object.  At
    100 TB the difference is real: variant parses each value once at
    ingest/scan and every later ``variant_get`` is a binary-offset
    read, where string-path extraction re-tokenizes the JSON for
    every path touched.

    Declared output: per event_type counts/sums over
    ``variant_get($.k, 'int')`` plus the inferred variant schema
    string (a constant on this fixture — evidence the variant
    inference really ran).  Oracle: DuckDB JSON extraction computes
    identical values; the schema string is a literal."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    return (v.select(
        "event_type",
        F.variant_get("v", "$.k", "int").alias("k"),
        F.schema_of_variant(F.col("v")).alias("sch"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("k").cast("bigint").alias("k_sum"),
             F.max("k").alias("k_max"),
             F.max("sch").alias("variant_schema")))


F11_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT))
            AS BIGINT) AS k_sum,
       MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS k_max,
       'OBJECT<k: BIGINT>' AS variant_schema
FROM events GROUP BY event_type
"""


def f8_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: cryptographic hashes (hex, lowercase in both engines)."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.md5(F.concat_ws("|", "lang", "source")).alias("md5_meta"),
    )


F8_SQL = """
SELECT doc_id,
       MD5(text) AS md5_hex,
       SHA256(text) AS sha256_hex,
       MD5(lang || '|' || source) AS md5_meta
FROM documents
"""


def f9_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 (r5): the bitwise family — row-level AND/OR/XOR/NOT,
    shifts, popcount, and the BIT_AND/BIT_OR/BIT_XOR aggregates
    (flag-mask rollups — 'which permission bits are set anywhere /
    everywhere in the group').  Exact int64 semantics are identical
    across engines; shifts use literal counts (both dialects)."""
    li = load_table(spark, sf_dir, "lineitem")
    k = (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
    d = li.select(
        F.col("l_returnflag").alias("g"),
        k.alias("k"),
        k.bitwiseAND(F.lit(255)).alias("lo"),
        k.bitwiseOR(F.lit(4096)).alias("hi"),
        k.bitwiseXOR(F.col("l_partkey")).alias("x"),
        F.bit_count(k).alias("pc"),
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"))
    return d.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_and("lo").alias("and_lo"),
        F.bit_or("lo").alias("or_lo"),
        F.bit_xor("x").alias("xor_all"),
        F.sum("pc").cast("long").alias("popcount_sum"),
        F.sum("shl").cast("long").alias("shl_sum"),
        F.sum("shr").cast("long").alias("shr_sum"),
        F.sum("hi").cast("long").alias("hi_sum"))


F9_SQL = """
WITH d AS (
  SELECT l_returnflag AS g,
         l_orderkey * 8 + l_linenumber AS k,
         (l_orderkey * 8 + l_linenumber) & 255 AS lo,
         (l_orderkey * 8 + l_linenumber) | 4096 AS hi,
         xor(l_orderkey * 8 + l_linenumber, l_partkey) AS x,
         BIT_COUNT(l_orderkey * 8 + l_linenumber) AS pc,
         (l_orderkey * 8 + l_linenumber) << 3 AS shl,
         (l_orderkey * 8 + l_linenumber) >> 2 AS shr
  FROM lineitem)
SELECT g, COUNT(*) AS n,
       CAST(BIT_AND(lo) AS BIGINT) AS and_lo,
       CAST(BIT_OR(lo) AS BIGINT) AS or_lo,
       CAST(BIT_XOR(x) AS BIGINT) AS xor_all,
       CAST(SUM(pc) AS BIGINT) AS popcount_sum,
       CAST(SUM(shl) AS BIGINT) AS shl_sum,
       CAST(SUM(shr) AS BIGINT) AS shr_sum,
       CAST(SUM(hi) AS BIGINT) AS hi_sum
FROM d GROUP BY g
"""


def f10_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 (r6): the REGEX family — count / first-capture / global
    replace / boolean match / regex split, the text-wrangling surface
    every log or scraped-corpus pipeline leans on.  Functions pair as
    Spark `regexp_count`/`regexp_extract`/`regexp_replace` (global by
    default)/`rlike`/`split` vs DuckDB `LEN(REGEXP_EXTRACT_ALL)`/
    `REGEXP_EXTRACT(..., 1)`/`REGEXP_REPLACE(..., 'g')` (per-match
    flag REQUIRED — the classic dialect trap)/`REGEXP_MATCHES`/
    `STRING_SPLIT_REGEX`.  Both engines run RE2-class engines over
    the same ASCII corpus, so counts and captures are exact.

    Scale: all row-local expressions — whole-stage codegen, no
    shuffle besides the declared rollup."""
    doc = load_table(spark, sf_dir, "documents")
    return (doc.select(
        "source",
        F.regexp_count("text", F.lit("scan")).alias("n_scan"),
        F.regexp_extract("text", r"([a-z]{6,})", 1).alias("first6"),
        F.length(F.regexp_replace("text", "[aeiou]", ""))
        .alias("novowel_len"),
        F.col("text").rlike("stream [a-z]+ batch").cast("int")
        .alias("has_sb"),
        (F.size(F.split("text", "join")) - 1).alias("n_join"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_scan").cast("long").alias("scan_hits"),
             F.count_distinct("first6").alias("n_first6"),
             F.sum("novowel_len").cast("long").alias("novowel_total"),
             F.sum("has_sb").cast("long").alias("n_has_sb"),
             F.sum("n_join").cast("long").alias("join_hits")))


F10_SQL = """
WITH d AS (
  SELECT source,
         LEN(REGEXP_EXTRACT_ALL(text, 'scan')) AS n_scan,
         REGEXP_EXTRACT(text, '([a-z]{6,})', 1) AS first6,
         LENGTH(REGEXP_REPLACE(text, '[aeiou]', '', 'g'))
           AS novowel_len,
         CASE WHEN REGEXP_MATCHES(text, 'stream [a-z]+ batch')
              THEN 1 ELSE 0 END AS has_sb,
         LEN(STRING_SPLIT_REGEX(text, 'join')) - 1 AS n_join
  FROM documents)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_scan) AS BIGINT) AS scan_hits,
       COUNT(DISTINCT first6) AS n_first6,
       CAST(SUM(novowel_len) AS BIGINT) AS novowel_total,
       CAST(SUM(has_sb) AS BIGINT) AS n_has_sb,
       CAST(SUM(n_join) AS BIGINT) AS join_hits
FROM d GROUP BY source
"""


QUERIES: dict[str, tuple] = {
    "f1_string": (f1_string, F1_SQL),
    "f2_datetime": (f2_datetime, F2_SQL),
    "f3_math": (f3_math, F3_SQL),
    "f4_conditional": (f4_conditional, F4_SQL),
    "f5_array": (f5_array, F5_SQL),
    "f6_struct_map": (f6_struct_map, F6_SQL),
    "f7_json": (f7_json, F7_SQL),
    "f8_hash": (f8_hash, F8_SQL),
    "f9_bitwise": (f9_bitwise, F9_SQL),
    "f10_regex": (f10_regex, F10_SQL),
    "f11_variant": (f11_variant, F11_SQL),
}
