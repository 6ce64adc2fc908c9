"""Corpus-curation operators for LLM training-data pipelines
(north-star mandate, beyond SURVEY §2B): PII redaction, markup
stripping, mixture weighting, and benchmark-contamination checks.

Scale design (100 TB):
- redaction/stripping are row-local regexp expressions — JVM-side,
  whole-stage codegen, no Python, no shuffle;
- mixture weights aggregate to one row per SOURCE (dozens), then a
  single tiny window over sources — state is O(sources), never rows;
- contamination is a shingle equi-join: eval-set shingles (small by
  contract) de-duplicated then joined against corpus shingles on the
  shingle hash — the blocking key is the shingle itself, so the plan
  is a hash join, never a scan product.  At 100 TB precompute the
  corpus shingle index once and broadcast the eval shingles.

The fixture corpus contains no real PII/markup, so the paired
queries INJECT deterministic synthetic patterns (derived from
doc_id/source) before scrubbing — both engines build the same input,
so redaction counts and scrubbed hashes stay hash-matchable while
the operators run for real.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2- and Java-regex-compatible patterns (no backrefs, no lookaround)
EMAIL_RE = r"[a-z0-9._+-]+@[a-z0-9-]+\.[a-z0-9.-]+"
PHONE_RE = r"\+1-555-[0-9]{4}"
TAG_RE = r"<[^>]*>"
WS_RE = r"  +"


def redact_pii(text: Column) -> dict[str, Column]:
    """Row-local PII scrub: count then redact emails and phone
    numbers.  Returns the scrubbed column and per-type counts —
    everything a downstream filter/audit needs, all codegen-side."""
    n_emails = F.regexp_count(text, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(text, F.lit(PHONE_RE))
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"),
        PHONE_RE, "<PHONE>")
    return {"scrubbed": scrubbed, "n_emails": n_emails,
            "n_phones": n_phones}


def strip_markup(text: Column) -> Column:
    """Remove tags, collapse runs of spaces, trim — the standard
    HTML-ish boilerplate scrub, as one codegen expression chain."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(text, TAG_RE, " "), WS_RE, " "))


def mixture_weights(df: DataFrame, group_col: str = "source",
                    alpha: float = 0.5,
                    sample_budget: int = 100_000) -> DataFrame:
    """Temperature-based mixture weighting: source s with share p_s
    of the corpus gets weight ∝ p_s^alpha (alpha<1 upsamples rare
    sources — the standard multilingual/multi-source trick), plus the
    resulting document budget per source.  One aggregation to
    O(sources) rows, then a single tiny window for normalization
    (bounded_part key: the frame is groups-sized, and the constant
    non-foldable partition key keeps it an ordinary hash-partitioned
    window instead of the warn-logging no-partition WindowExec)."""
    from pyspark.sql import Window as W

    from ..exprs import bounded_part
    per = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = W.partitionBy(bounded_part("n_docs"))
    frac = F.col("n_docs") / F.sum("n_docs").over(total)
    raw_w = F.pow(frac, F.lit(alpha))
    weight = raw_w / F.sum(raw_w).over(total)
    return (per.select(
        group_col, "n_docs",
        F.round(weight, 6).alias("mix_weight"),
        F.round(weight * sample_budget, 2).alias("doc_budget"))
    )


def _word_ngrams(toks, n: int):
    """Order-preserving word n-grams of a token array (empty when the
    doc is shorter than n — guards Spark's descending sequence()).

    ``array_join(slice(...))`` with ONE ``toks`` reference per lambda,
    never n ``element_at`` refs: Catalyst substitutes the argument
    expression into every reference, so an unstaged ``tokenize``
    passed here would re-run its regex n times PER POSITION (r14,
    guide §1.2 "per-task work": the element_at form cost x55
    83 s tree CPU at sf0.1; slice + a caller-staged token column
    runs the identical explode in ~1 s).  Callers must still stage
    ``tokenize`` into a column first — see ``ngram_contamination``."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(toks: Column,
                     max_dup_2gram: float = 0.30,
                     max_dup_3gram: float = 0.20) -> dict[str, Column]:
    """Gopher-style repetition quality signals: the fraction of
    duplicate word 2-/3-grams per document, plus the keep/drop flag at
    the given thresholds.  Pure row-local expressions — codegen, no
    shuffle, no Python.

    ``toks`` must be a STAGED token-array column (the caller projects
    ``tokenize(text)`` first — r14): these expressions reference the
    array several times per row and per n-gram position, and an
    unstaged tokenize would re-run its regex at every reference."""
    out: dict[str, Column] = {}
    for n, cap, key in ((2, max_dup_2gram, "dup_2gram_frac"),
                        (3, max_dup_3gram, "dup_3gram_frac")):
        g = _word_ngrams(toks, n)
        total = F.size(g)
        frac = F.when(
            total > 0,
            1.0 - F.size(F.array_distinct(g)).cast("double") / total
        ).otherwise(F.lit(0.0))
        out[key] = F.round(frac, 6)
    out["keep"] = ((out["dup_2gram_frac"] <= max_dup_2gram)
                   & (out["dup_3gram_frac"] <= max_dup_3gram))
    return out


def chunk_tokens(df: DataFrame, *, window: int = 64, stride: int = 48,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Context-window chunking: split each document's token stream
    into windows of ``window`` tokens advancing by ``stride``
    (overlap = window - stride), the standard LM pre-training shape.
    One explode per doc — row-local, no shuffle; the chunk text is
    re-materialized so downstream tokenize/pack operators compose."""
    from .text import tokenize
    # Stage the token array first (r14): the start sequence and the
    # chunk projection reference it three times per row, and an
    # unstaged tokenize re-runs its regex at every reference.
    staged = df.select(id_col, tokenize(F.col(text_col)).alias("toks"))
    starts = F.when(F.size("toks") > 0,
                    F.sequence(F.lit(1), F.size("toks"), F.lit(stride))
                    ).otherwise(F.array().cast("array<int>"))
    exploded = staged.select(
        id_col, "toks",
        F.posexplode(starts).alias("chunk_idx", "start"))
    chunk = F.slice(F.col("toks"), F.col("start"), window)
    return exploded.select(
        id_col, "chunk_idx",
        F.size(chunk).alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"))


def ngram_contamination(corpus: DataFrame, eval_pred,
                        n: int = 8,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Benchmark-contamination check: for every non-eval document,
    count distinct word n-grams it shares with the EVAL subset
    (eval_pred).  The n-gram string is the join key — a plain hash
    equi-join; eval shingles are distinct-reduced first (small by
    contract -> broadcast at scale)."""
    from .text import tokenize
    # Stage the token array into its own projection before the
    # n-gram transform (the ngram_shingle_sets discipline): an
    # unstaged tokenize gets substituted into the lambda and its
    # regex re-runs per slice reference.  Measured r14 at sf0.1:
    # 83 s -> ~1 s tree CPU for the identical 235k-row explode.
    staged = corpus.select(F.col(id_col),
                           eval_pred.alias("is_eval"),
                           tokenize(F.col(text_col)).alias("_tk"))
    shingles = F.array_distinct(_word_ngrams(F.col("_tk"), n))
    sh = staged.select(
        id_col, F.explode(shingles).alias("shingle"), "is_eval")
    ev = sh.filter("is_eval").select("shingle").distinct()
    train = sh.filter(~F.col("is_eval"))
    return (train.join(ev, "shingle")
            .groupBy(id_col)
            .agg(F.count_distinct("shingle").alias("n_shared_ngrams")))


def source_overlap_matrix(df: DataFrame, window: int = 10,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          source_col: str = "source") -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources
    (unordered, including a source with itself), the number of
    document pairs that share at least one duplicated ``window``-token
    substring — the "who copied whom" rollup that decides which
    source to drop when near-dup rates spike.

    Never enumerates document pairs: per duplicated window it counts
    docs per source (``c``), then combines counts arithmetically
    (``c_a*c_b`` across sources, ``c*(c-1)/2`` within).  The
    combination is a ROW-LOCAL expression over each window's
    collected (source, count) list — sources are deployment-constant
    (dozens), so the list is tiny and no self-join ever runs.  ONE
    scan, four key-chained shuffles (pair distinct, per-source count,
    per-window collect, final source-pair rollup), all state bounded
    by |windows| x |sources|.  NOTE: a doc pair sharing k windows is
    counted k times (per-window evidence mass, by design — the exact
    doc-pair distinct count is a join over candidates, which L5/L6
    already provide)."""
    from .text import tokenize
    toks = (df.select(id_col, source_col,
                      tokenize(F.col(text_col)).alias("t"))
            .filter(F.size("t") >= window))
    # Shuffle the window's 64-bit xxhash64, not the string — all
    # three window-keyed shuffles move 8-byte keys (see
    # dedup.dup_window_stats for the collision-odds note).
    wd = (toks.select(
        id_col, source_col,
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("t") - window + 1),
            lambda i: F.array_join(F.slice("t", i, window), " ")))
        .alias("w0"))
        .select(id_col, source_col, F.xxhash64("w0").alias("win"))
        .distinct())
    per_win = (wd.groupBy("win", source_col)
               .agg(F.count(F.lit(1)).alias("c"))
               .groupBy("win")
               .agg(F.collect_list(
                   F.struct(F.col(source_col).alias("s"), "c"))
                   .alias("sc"))
               .filter(F.expr(
                   "aggregate(sc, 0L, (acc, x) -> acc + x.c) >= 2")))
    # All unordered source pairs of one window, with their doc-pair
    # mass, as a pure array expression (distinct list entries have
    # distinct sources, so a.s = b.s only pairs an entry with itself).
    pair_mass = (
        "filter(flatten(transform(sc, a -> transform(sc, b -> "
        "CASE WHEN a.s < b.s THEN"
        " named_struct('sa', a.s, 'sb', b.s,"
        "              'm', CAST(a.c * b.c AS DOUBLE)) "
        "WHEN a.s = b.s AND a.c >= 2 THEN"
        " named_struct('sa', a.s, 'sb', b.s,"
        "              'm', a.c * (a.c - 1) / 2) "
        "ELSE NULL END))), x -> x IS NOT NULL)")
    return (per_win.select(F.explode(F.expr(pair_mass)).alias("p"))
            .groupBy(F.col("p.sa").alias("source_a"),
                     F.col("p.sb").alias("source_b"))
            .agg(F.sum("p.m").cast("long")
                  .alias("n_shared_window_doc_pairs")))


def source_drift(df: DataFrame, *, group_col: str = "source",
                 value_col: str = "n_chars",
                 lo: float = 0.0, width: float = 200.0,
                 n_buckets: int = 8) -> DataFrame:
    """Mixture-distribution monitor: per-source total-variation
    distance between the source's ``value_col`` histogram and the
    whole-corpus histogram — the drift signal a training-data
    pipeline watches to catch a source whose content shifted between
    snapshots.

    Determinism: TVD = Σ_b |c_sb·N − C_b·n_s| / (2·n_s·N) is computed
    with an EXACT integer numerator (counts only; order-independent),
    then one double division — no float summation anywhere, so both
    engines hash-match.  At corpus scales where c_sb·N overflows
    int64 (~>3·10⁹ docs), widen the products to decimal(38,0); the
    shape is unchanged.

    Scale: one scan to (source, bucket) counts — everything after is
    arithmetic on a sources×buckets grid (deployment-constant rows).
    The zero-count grid cells a join would drop are restored with a
    crossJoin of the two tiny key sets (TVD needs the |0 − C_b·n_s|
    terms).
    """
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0),
                   F.floor((F.col(value_col) - lo) / width).cast("int")
                   )).alias("bucket")
    sb = (df.select(F.col(group_col).alias("source"), bucket)
          .groupBy("source", "bucket")
          .agg(F.count(F.lit(1)).alias("c_sb")))
    sb = sb.persist()
    s_tot = sb.groupBy("source").agg(F.sum("c_sb").alias("n_s"))
    b_tot = sb.groupBy("bucket").agg(F.sum("c_sb").alias("c_b"))
    n_tot = sb.agg(F.sum("c_sb").alias("n"))
    grid = (s_tot.crossJoin(F.broadcast(b_tot))
            .crossJoin(F.broadcast(n_tot))
            .join(sb, ["source", "bucket"], "left")
            .withColumn("c_sb", F.coalesce(F.col("c_sb"), F.lit(0))))
    num = F.abs(F.col("c_sb") * F.col("n") - F.col("c_b") * F.col("n_s"))
    return (grid.groupBy("source")
            .agg(F.max("n_s").alias("n_docs"),
                 F.round((F.sum(num) / (2.0 * F.max("n_s") * F.max("n")))
                         .cast("double"), 6).alias("tvd")))


def source_drift_sql(*, lo: float = 0.0, width: float = 200.0,
                     n_buckets: int = 8) -> str:
    """DuckDB twin of :func:`source_drift` over ``documents``."""
    return f"""
WITH base AS (
  SELECT source,
         LEAST({n_buckets - 1},
               GREATEST(0, CAST(FLOOR((n_chars - {lo}) / {width})
                               AS INT))) AS bucket
  FROM documents),
sb AS (SELECT source, bucket, COUNT(*) AS c_sb FROM base
       GROUP BY source, bucket),
s_tot AS (SELECT source, CAST(SUM(c_sb) AS BIGINT) AS n_s FROM sb
          GROUP BY source),
b_tot AS (SELECT bucket, CAST(SUM(c_sb) AS BIGINT) AS c_b FROM sb
          GROUP BY bucket),
n_tot AS (SELECT CAST(SUM(c_sb) AS BIGINT) AS n FROM sb),
grid AS (
  SELECT s_tot.source, b_tot.bucket, s_tot.n_s, b_tot.c_b, n_tot.n,
         COALESCE(sb.c_sb, 0) AS c_sb
  FROM s_tot CROSS JOIN b_tot CROSS JOIN n_tot
  LEFT JOIN sb ON sb.source = s_tot.source AND sb.bucket = b_tot.bucket)
SELECT source, MAX(n_s) AS n_docs,
       ROUND(CAST(SUM(ABS(c_sb * n - c_b * n_s)) AS DOUBLE)
             / (2.0 * MAX(n_s) * MAX(n)), 6) AS tvd
FROM grid GROUP BY source
"""


# Gopher's repetition-free quality rules (Rae et al. 2021 §A1.1,
# public), with every threshold re-stated as an INTEGER
# cross-multiplication so no engine ever compares floats:
#   R1  50 <= word_count <= 100000
#   R2  3 <= mean word length <= 10      (3W <= L <= 10W)
#   R3  symbol-to-word ratio <= 0.1      (10(#hash + #ellipsis) <= W)
#   R4  <= 90% bullet-start lines, <= 30% ellipsis-end lines
#       (10B <= 9N_lines, 10E <= 3N_lines)
#   R5  >= 80% words contain alphabetic  (5A >= 4W)
#   R6  >= 2 distinct Gopher stop words present
GOPHER_STOPS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with")


def gopher_row_flags(df: DataFrame, text_col: str = "text",
                     min_stops: int = 2,
                     keep_cols: tuple = ("doc_id",)) -> DataFrame:
    """Row-level Gopher rule flags (r1..r6 + passes_all) with
    ``keep_cols`` carried through — the shared core of the
    per-source audit (:func:`gopher_rules`), the streaming gate
    (S16), and the quality x duplication census (X106).  Row-local
    exact-integer predicates only, so it is streaming-safe."""
    from .text import tokenize
    text = F.col(text_col)
    toks = tokenize(text)
    wlen = F.expr(
        "aggregate(transform(__toks, t -> length(t)), 0L, (a, x) -> a + x)")
    alpha_w = F.expr("size(filter(__toks, t -> t rlike '[a-z]'))")
    tc = F.col(text_col)
    n_hash = F.length(tc) - F.length(F.regexp_replace(tc, r"#", ""))
    n_ell = (F.length(tc)
             - F.length(F.regexp_replace(tc, r"\.\.\.", ""))) / 3
    lines = F.split(tc, r"\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda ln: ln.startswith("- ")
                               | ln.startswith("* ")))
    n_ell_end = F.size(F.filter(lines, lambda ln: ln.endswith("...")))

    w2 = F.size(F.col("__toks"))
    stops2 = F.size(F.array_intersect(
        F.array_distinct(F.col("__toks")),
        F.array(*[F.lit(s) for s in GOPHER_STOPS])))
    d = (df.select(*keep_cols, toks.alias("__toks"),
                   text.alias(text_col))
         .select(
             *keep_cols,
             ((w2 >= 50) & (w2 <= 100000)).alias("r1"),
             ((3 * w2 <= wlen) & (wlen <= 10 * w2)).alias("r2"),
             ((10 * (n_hash + F.floor(n_ell).cast("long"))) <= w2)
             .alias("r3"),
             ((10 * n_bullet <= 9 * n_lines)
              & (10 * n_ell_end <= 3 * n_lines)).alias("r4"),
             (5 * alpha_w >= 4 * w2).alias("r5"),
             (stops2 >= min_stops).alias("r6"),
         ))
    return d.withColumn(
        "passes_all", F.col("r1") & F.col("r2") & F.col("r3")
        & F.col("r4") & F.col("r5") & F.col("r6"))


def gopher_rules(df: DataFrame, text_col: str = "text",
                 min_stops: int = 2) -> DataFrame:
    """Per-source Gopher quality audit: document counts passing each
    published rule, plus the all-rules count — the corpus-curation
    dashboard before a pretraining run.  Every predicate is row-local
    exact-integer arithmetic (scale-free), and the rollup is one
    source-keyed aggregate."""
    d = gopher_row_flags(df, text_col=text_col, min_stops=min_stops,
                         keep_cols=("source",))
    agg = [F.count(F.lit(1)).alias("n_docs")]
    for r in ("r1", "r2", "r3", "r4", "r5", "r6"):
        agg.append(F.sum(F.col(r).cast("long")).alias(f"n_pass_{r}"))
    agg.append(F.sum(F.col("passes_all").cast("long"))
               .alias("n_pass_all"))
    return d.groupBy("source").agg(*agg)


def gopher_flags_cte(table: str = "documents",
                     min_stops: int = 2,
                     key_col: str = "source") -> str:
    """The shared d/r CTE body of the Gopher twin, parameterized on
    the carried key column — reused by the per-source audit twin and
    X106's per-document census twin."""
    from .text import tokenize_sql
    toks = tokenize_sql("text")
    return f"""
WITH d AS (
  SELECT {key_col},
         LEN(t.toks) AS w,
         CAST(LIST_SUM(LIST_TRANSFORM(t.toks, x -> LENGTH(x)))
              AS BIGINT) AS wlen,
         LEN(LIST_FILTER(t.toks, x -> REGEXP_MATCHES(x, '[a-z]')))
           AS alpha_w,
         LENGTH(text) - LENGTH(REPLACE(text, '#', '')) AS n_hash,
         (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3
           AS n_ell,
         LEN(STRING_SPLIT(text, CHR(10))) AS n_lines,
         LEN(LIST_FILTER(STRING_SPLIT(text, CHR(10)),
             ln -> LEFT(ln, 2) = '- ' OR LEFT(ln, 2) = '* '))
           AS n_bullet,
         LEN(LIST_FILTER(STRING_SPLIT(text, CHR(10)),
             ln -> RIGHT(ln, 3) = '...')) AS n_ell_end,
         LEN(LIST_INTERSECT(LIST_DISTINCT(t.toks),
             {list(GOPHER_STOPS)!r})) AS n_stops
  FROM (SELECT {key_col}, text, {toks} AS toks FROM {table}) t),
r AS (
  SELECT {key_col},
         w >= 50 AND w <= 100000 AS r1,
         3 * w <= wlen AND wlen <= 10 * w AS r2,
         10 * (n_hash + n_ell) <= w AS r3,
         10 * n_bullet <= 9 * n_lines
           AND 10 * n_ell_end <= 3 * n_lines AS r4,
         5 * alpha_w >= 4 * w AS r5,
         n_stops >= {min_stops} AS r6
  FROM d)"""


def gopher_rules_sql(table: str = "documents",
                     min_stops: int = 2) -> str:
    """DuckDB twin of :func:`gopher_rules` — the same integer
    cross-multiplied predicates over the same tokenization."""
    return gopher_flags_cte(table, min_stops, "source") + """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_r1,
       CAST(SUM(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_r2,
       CAST(SUM(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_r3,
       CAST(SUM(CASE WHEN r4 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_r4,
       CAST(SUM(CASE WHEN r5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_r5,
       CAST(SUM(CASE WHEN r6 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_r6,
       CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 AND r6
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM r GROUP BY source
"""


def c4_rules(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """C4 cleaning-rule audit (Raffel et al. 2020 §2.2) — the LINE-
    level complement to the document-level :func:`gopher_rules`: keep
    only lines that end in terminal punctuation, have >= 5 words, and
    don't mention javascript; drop whole pages containing "lorem
    ipsum" or a curly brace; a page survives with >= 3 kept lines
    (sentences).

    The fixture text is flat, so — the x10/x11 injection discipline —
    the page structure C4 operates on is CONSTRUCTED deterministically
    and identically on both engines: 12-token lines, terminal '.' on
    lines where (doc_id + i) % 3 != 0, "lorem ipsum " prefixed on
    doc_id % 41 = 0, " {{" on line 1 of doc_id % 53 = 0, and
    " javascript" on line 0 of doc_id % 59 = 0.  The DETECTORS are
    the real C4 predicates run against that text; every count is an
    exact integer.

    Scale (100 TB): page assembly and all line predicates are
    row-local array expressions (no explode, no shuffle until the one
    source-keyed rollup)."""
    from .text import tokenize
    lines_expr = """
transform(sequence(0, (__w + 11) div 12 - 1), i ->
  concat(
    CASE WHEN __d % 41 = 0 AND i = 0 THEN 'lorem ipsum ' ELSE '' END,
    concat_ws(' ', slice(__toks, 1 + 12 * i, 12)),
    CASE WHEN __d % 59 = 0 AND i = 0 THEN ' javascript' ELSE '' END,
    CASE WHEN __d % 53 = 0 AND i = 1 THEN ' {' ELSE '' END,
    CASE WHEN (__d + i) % 3 != 0 THEN '.' ELSE '' END))
"""
    kept_pred = ("ln -> right(ln, 1) = '.' AND size(split(ln, ' ')) >= 5"
                 " AND NOT contains(ln, 'javascript')")
    d = (df.select("source", F.col(id_col).alias("__d"),
                   tokenize(F.col(text_col)).alias("__toks"))
         .withColumn("__w", F.size("__toks"))
         .withColumn("__lines", F.expr(lines_expr))
         .select(
             "source",
             F.expr("size(__lines)").alias("n_lines"),
             F.expr(f"size(filter(__lines, {kept_pred}))")
             .alias("n_kept"),
             F.expr("size(filter(__lines,"
                    " ln -> contains(ln, 'javascript')))").alias("n_js"),
             F.expr("exists(__lines, ln -> contains(ln, 'lorem ipsum'))")
             .alias("has_lorem"),
             F.expr("exists(__lines, ln -> contains(ln, '{'))")
             .alias("has_brace")))
    keep = (~F.col("has_lorem") & ~F.col("has_brace")
            & (F.col("n_kept") >= 3))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("has_lorem").cast("long")).alias("n_docs_lorem"),
        F.sum(F.col("has_brace").cast("long")).alias("n_docs_brace"),
        F.sum("n_js").cast("long").alias("n_js_lines"),
        F.sum("n_lines").cast("long").alias("n_lines_total"),
        F.sum("n_kept").cast("long").alias("n_lines_kept"),
        F.sum(keep.cast("long")).alias("n_docs_kept"))


def c4_rules_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`c4_rules` — identical page construction
    and identical line predicates."""
    from .text import tokenize_sql
    toks = tokenize_sql("text")
    return f"""
WITH t AS (
  SELECT source, doc_id AS d, {toks} AS toks,
         LEN({toks}) AS w
  FROM {table}),
pg AS (
  SELECT source,
         LIST_TRANSFORM(RANGE(0, (w + 11) // 12), i ->
           (CASE WHEN d % 41 = 0 AND i = 0
                 THEN 'lorem ipsum ' ELSE '' END) ||
           ARRAY_TO_STRING(toks[12 * i + 1 : 12 * i + 12], ' ') ||
           (CASE WHEN d % 59 = 0 AND i = 0
                 THEN ' javascript' ELSE '' END) ||
           (CASE WHEN d % 53 = 0 AND i = 1 THEN ' {{' ELSE '' END) ||
           (CASE WHEN (d + i) % 3 != 0 THEN '.' ELSE '' END))
           AS lines
  FROM t),
r AS (
  SELECT source,
         LEN(lines) AS n_lines,
         LEN(LIST_FILTER(lines, ln -> RIGHT(ln, 1) = '.'
             AND LEN(STRING_SPLIT(ln, ' ')) >= 5
             AND NOT CONTAINS(ln, 'javascript'))) AS n_kept,
         LEN(LIST_FILTER(lines, ln -> CONTAINS(ln, 'javascript')))
           AS n_js,
         LEN(LIST_FILTER(lines, ln -> CONTAINS(ln, 'lorem ipsum'))) > 0
           AS has_lorem,
         LEN(LIST_FILTER(lines, ln -> CONTAINS(ln, '{{'))) > 0
           AS has_brace
  FROM pg)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN has_lorem THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_lorem,
       CAST(SUM(CASE WHEN has_brace THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_brace,
       CAST(SUM(n_js) AS BIGINT) AS n_js_lines,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines_total,
       CAST(SUM(n_kept) AS BIGINT) AS n_lines_kept,
       CAST(SUM(CASE WHEN NOT has_lorem AND NOT has_brace AND n_kept >= 3
                THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept
FROM r GROUP BY source
"""


def pack_offsets(df: DataFrame, n_tok_col: str = "n_tok",
                 id_col: str = "doc_id", seq_len: int = 128,
                 n_parts: int | None = None,
                 base_off: int = 0) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-2/LLaMA
    pretraining layout: every document's tokens are concatenated in
    one fixed global order (``id_col``) and the stream is cut every
    ``seq_len`` tokens into training sequences.  Emits one row per
    input row with the document's global token ``start_off`` and the
    ``[first_seq, last_seq]`` training-sequence span it lands in
    (``n_seqs = 0`` for empty documents, which occupy no tokens but
    keep the offset where they would begin).

    The global running sum is the textbook SinglePartition window
    trap (the r6-verdict class).  This is the DISTRIBUTED two-phase
    prefix sum instead:

    1. range-repartition by the order key — RangePartitioning
       guarantees partition INDEX order == KEY order, the only
       property the split relies on (AQE merges only ADJACENT
       shuffle partitions, which preserves it);
    2. per-partition running sums via a window KEYED BY
       ``spark_partition_id()`` — parallel across partitions, each
       window partition is exactly one data partition;
    3. per-partition totals — ``n_parts`` rows, the
       bounded-by-construction metadata collect class (the IVF
       probed-cell-list precedent) — cumulated on the driver and
       broadcast-joined back as each partition's base offset.

    At 100 TB this is one range shuffle + one pid-keyed window pass
    + one metadata aggregate; no task ever sees more than one
    partition's rows.  ``id_col`` must be unique (ties would make
    the within-partition running sum order-ambiguous).

    ``base_off`` starts the stream at a nonzero global offset — the
    INCREMENTAL maintenance hook (x125): a delta snapshot whose ids
    all sort after the packed corpus extends the manifest by packing
    only the delta with ``base_off`` = the previous token total,
    never touching existing rows (the x87/x121 frozen-prefix
    discipline applied to the packing manifest)."""
    from pyspark.sql import Window as W
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_parts is None:
        # Scale-adaptive split count (r14, guide §2.5): one range
        # partition per upstream scan split instead of a constant 32
        # — locally a 5k-row input is 1-2 splits (the old constant
        # meant 156-row tasks, pure per-task fixed cost), at 100 TB
        # the scan is thousands of splits and the range shuffle
        # keeps that width.  Results are n_parts-invariant
        # (tests/test_operators.py::test_pack_offsets_n_parts_invariance).
        n_parts = max(1, df.rdd.getNumPartitions())
    if n_parts < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    if base_off < 0:
        raise ValueError(f"base_off must be >= 0, got {base_off}")
    d = (df.repartitionByRange(n_parts, F.col(id_col))
           .withColumn("_pid", F.spark_partition_id())
           .localCheckpoint(eager=True))   # totals + main pass both read it
    totals = {r["_pid"]: r["_tot"] for r in
              d.groupBy("_pid")
               .agg(F.sum(n_tok_col).alias("_tot")).collect()}
    base, offs = base_off, []
    for pid in sorted(totals):
        offs.append((pid, base))
        base += int(totals[pid])
    spark = df.sparkSession
    from ..exprs import local_df
    off_df = local_df(spark, offs, "_pid int, _base bigint")
    within = (W.partitionBy("_pid").orderBy(id_col)
              .rowsBetween(W.unboundedPreceding, -1))
    start = (F.col("_base")
             + F.coalesce(F.sum(n_tok_col).over(within), F.lit(0)))
    d = (d.join(F.broadcast(off_df), "_pid")
          .withColumn("start_off", start.cast("bigint")))
    first = F.expr(f"start_off div {seq_len}")
    last = F.expr(
        f"(start_off + greatest(cast({n_tok_col} as bigint), 1L) - 1L) "
        f"div {seq_len}")
    return (d.withColumn("first_seq", first.cast("bigint"))
             .withColumn("last_seq", last.cast("bigint"))
             .withColumn(
                 "n_seqs",
                 F.when(F.col(n_tok_col) == 0, F.lit(0))
                  .otherwise(F.col("last_seq") - F.col("first_seq") + 1)
                  .cast("bigint"))
             .drop("_pid", "_base"))
