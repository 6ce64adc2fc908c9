"""Dataset-management operators for training-data pipelines:
deterministic splits, stratified samples, and sequence packing.

Everything here is engineered for reproducibility at 100 TB:
- splits key on a PORTABLE integer hash of the stable id (Knuth
  multiplicative mixing in exact int64 arithmetic — identical in any
  engine, no RNG, no engine-specific hash function), so the same doc
  lands in the same split on every run, every cluster, every engine;
- sampling is rank-based over a hashed order (row_number window) —
  deterministic and rebalance-safe, unlike ``df.sample`` whose output
  depends on partitioning;
- packing is a window cumulative sum — one shuffle per shard key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# Knuth multiplicative hash constants: exact int64 arithmetic,
# portable across engines (no overflow: id * A is reduced mod 2^31).
_MIX_A = 2654435761
_MIX_M = (1 << 31) - 1


def hash_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer id.
    The id is reduced mod 2^31-1 BEFORE mixing so the product stays
    below 2^62 for any int64 id — no overflow at any corpus size."""
    reduced = F.pmod(id_col, F.lit(_MIX_M))
    return F.pmod(F.pmod(reduced * F.lit(_MIX_A), F.lit(_MIX_M)),
                  F.lit(n_buckets))


def hash_bucket_sql(expr: str, n_buckets: int = 100) -> str:
    """DuckDB twin (same exact integer arithmetic)."""
    red = f"(({expr}) % {_MIX_M} + {_MIX_M}) % {_MIX_M}"
    inner = f"(({red} * {_MIX_A}) % {_MIX_M} + {_MIX_M}) % {_MIX_M}"
    return f"(({inner}) % {n_buckets} + {n_buckets}) % {n_buckets}"


def train_val_test_split(df: DataFrame, id_col: str = "doc_id",
                         train_pct: int = 80,
                         val_pct: int = 10) -> DataFrame:
    """Stable 3-way split: bucket < 80 -> train, < 90 -> val, else
    test.  Row-local (no shuffle); adding documents never moves an
    existing document between splits."""
    b = hash_bucket(F.col(id_col))
    split = (F.when(b < train_pct, "train")
             .when(b < train_pct + val_pct, "val")
             .otherwise("test"))
    return df.withColumn("split", split)


def stratified_sample(df: DataFrame, strata_col: str, k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows within each
    stratum by (hash of id, id) and keep the first k.  One shuffle
    keyed by the stratum; at scale strata are the partition key, so
    the window never sees more than one stratum per task."""
    order = W.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(id_col), 1 << 30), F.col(id_col))
    return (df.withColumn("rn", F.row_number().over(order))
            .filter(F.col("rn") <= k)
            .drop("rn"))


def pack_sequences(df: DataFrame, budget: int,
                   shard_col: str = "lang",
                   id_col: str = "doc_id",
                   token_count: Column | None = None) -> DataFrame:
    """Sequence packing: assign documents (ordered by id within a
    shard) to contiguous context-window bins of ~``budget`` tokens —
    bin = floor((cumulative tokens - own tokens) / budget) over the
    id order.  The declared semantics are contiguous-cumulative
    packing (deterministic, windowed, one shuffle per shard), the
    standard scalable approximation of greedy bin packing.
    """
    from .text import tokenize
    toks = token_count if token_count is not None \
        else F.size(tokenize(F.col("text")))
    w = (W.partitionBy(shard_col).orderBy(id_col)
         .rowsBetween(W.unboundedPreceding, 0))
    cum = F.sum("n_tokens").over(w)
    return (df.withColumn("n_tokens", toks)
            .withColumn("bin",
                        F.floor((cum - F.col("n_tokens"))
                                / F.lit(budget)).cast("long"))
            .select(id_col, shard_col, "n_tokens", "bin"))


def quota_sample(df: DataFrame, quota: int = 100,
                 by_col: str = "source",
                 id_col: str = "doc_id") -> DataFrame:
    """Mixture REALIZATION: downsample each group (source/domain) to
    at most ``quota`` documents, chosen by deterministic pseudo-random
    rank — the portable hash orders each group uniformly, so taking
    the ``quota`` smallest hashes IS a uniform sample that is stable
    across runs, engines, and appends of OTHER groups.  Integer
    arithmetic end-to-end: no float keep-fraction boundary to diverge
    on.

    Scale (100 TB): one shuffle keyed by the group column; the rank
    window is a top-k per group, which Spark executes with
    WindowGroupLimit — partial limits run map-side BEFORE the
    exchange, so a group's surplus never travels."""
    w = (W.partitionBy(by_col)
         .orderBy(hash_bucket(F.col(id_col), 1_000_000), id_col))
    return (df.withColumn("_qr", F.row_number().over(w))
            .filter(F.col("_qr") <= quota).drop("_qr"))


def quota_sample_sql(quota: int = 100, by_col: str = "source",
                     id_col: str = "doc_id") -> str:
    """DuckDB twin ORDER BY expression fragment for quota_sample's
    window rank (same portable hash, same tie-break)."""
    return (f"ROW_NUMBER() OVER (PARTITION BY {by_col} "
            f"ORDER BY {hash_bucket_sql(id_col, 1_000_000)}, {id_col})")


def weighted_bernoulli_sample(df: DataFrame, weight: Column,
                              max_weight: int,
                              id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted (Poisson/Bernoulli) sampling: include a
    row with probability ``weight / max_weight``, realized EXACTLY in
    integer arithmetic — ``hash_bucket(id, 2^20) * max_weight <
    weight * 2^20`` — so there is no float keep-fraction boundary to
    diverge on across engines, runs, or appends (the per-id decision
    never changes).  This is the sampling scheme mixture-weighted
    pretraining pipelines actually use for per-document up/down-
    weighting (quality-proportional keep rates, per-source mixture
    realization in expectation).

    Scale (100 TB): entirely row-local — no shuffle, no window, no
    state; composes with any downstream quota/pack stage."""
    lhs = hash_bucket(F.col(id_col), 1 << 20) * F.lit(max_weight)
    return df.filter(lhs < weight.cast("long") * F.lit(1 << 20))


def weighted_bernoulli_sql(weight_expr: str, max_weight: int,
                           id_col: str = "doc_id") -> str:
    """DuckDB twin WHERE-clause fragment (same exact integers)."""
    return (f"{hash_bucket_sql(id_col, 1 << 20)} * {max_weight} "
            f"< ({weight_expr}) * {1 << 20}")


def mixture_realize(df: DataFrame, weight: Column, tokens: Column,
                    budget_num: int, budget_den: int,
                    by_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Token-budget mixture realization — the pretraining data-mixing
    primitive: given a per-group mixture WEIGHT and a global token
    budget of ``budget_num/budget_den`` of the corpus, allocate each
    group ``B_g = budget * w_g / W`` target tokens and keep each of
    the group's documents with probability ``min(1, B_g / T_g)``
    (T_g = the group's token mass).  Every quantity is an exact
    integer and the per-document decision is the same portable hash
    compare as :func:`weighted_bernoulli_sample` —
    ``hash * T_g < B_g * 2^20`` — so the realized sample is
    bit-stable across engines and reruns.  Over-budgeted groups
    (B_g >= T_g) keep everything, which IS min(1, p).  The compare
    runs in decimal(38,0) (Spark) / HUGEINT (DuckDB): hash < 2^20 is
    7 digits and either int64 factor is <= 19, so the 26-digit
    products are exact for EVERY int64 input — no silent int64 wrap
    at hash * T_g > 2^63 (~8.8e12 group tokens), which a 100 TB
    corpus (~2.5e13 tokens) would otherwise hit (ADVICE r4).

    Returns one row per group — including groups whose budget
    realizes ZERO kept documents (n_kept = kept_tokens = 0), so an
    under-budgeted group cannot silently vanish from the audit report
    (ADVICE r4): token mass, target, realized doc and token counts.

    Scale (100 TB): one shuffle for the per-group token mass (a
    groups-sized frame), a broadcast join of that frame back onto the
    corpus, a row-local keep decision, one final per-group aggregate.
    No global sort, no window over the corpus."""
    w_int = weight.cast("long")
    stats = (df.groupBy(by_col)
             .agg(F.sum(tokens).alias("t_tokens"),
                  F.max(w_int).alias("w")))
    # groups-sized frame: a global window is semantically right, but
    # the non-foldable constant key keeps it hash-partitioned instead
    # of the warn-logging no-partition WindowExec (bounded_part
    # discipline, r7).
    from ..exprs import bounded_part
    g = W.partitionBy(bounded_part("w"))
    stats = (stats
             .withColumn("_total", F.sum("t_tokens").over(g))
             .withColumn("_W", F.sum("w").over(g))
             # decimal(38,0) intermediates on this GROUPS-sized frame:
             # total*num (<=22 digits) and budget*w (<=38 digits) both
             # stay exact; each DIV lands back in int64 range (budget
             # <= total and w <= W), so no int64 wrap for any int64
             # token mass / weight (ADVICE r4).
             .withColumn("b_target", F.expr(
                 f"CAST(CAST(CAST(_total AS DECIMAL(38,0)) "
                 f"* {budget_num} DIV {budget_den} AS DECIMAL(38,0)) "
                 f"* w DIV _W AS LONG)"))
             .select(by_col, "t_tokens", "b_target"))
    keep = (F.col("_hb").cast("decimal(38,0)") * F.col("t_tokens")
            < F.col("b_target").cast("decimal(38,0)") * F.lit(1 << 20))
    kept = (df.withColumn("_hb", hash_bucket(F.col(id_col), 1 << 20))
            .join(F.broadcast(stats), by_col)
            .filter(keep))
    kept_agg = (kept.groupBy(by_col)
                .agg(F.count(F.lit(1)).alias("n_kept"),
                     F.sum(tokens).alias("kept_tokens")))
    return (stats.join(kept_agg, by_col, "left")
            .select(by_col, "t_tokens", "b_target",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("kept_tokens", F.lit(0).cast("long"))
                    .alias("kept_tokens")))


def mixture_realize_sql(weight_expr: str, tokens_expr: str,
                        budget_num: int, budget_den: int,
                        by_col: str = "source",
                        id_col: str = "doc_id",
                        table: str = "documents") -> str:
    """DuckDB twin of :func:`mixture_realize` (same exact integers)."""
    hb = hash_bucket_sql(id_col, 1 << 20)
    return f"""
WITH s AS (SELECT {by_col}, SUM({tokens_expr}) AS t_tokens,
                  MAX(CAST({weight_expr} AS BIGINT)) AS w
           FROM {table} GROUP BY {by_col}),
g AS (SELECT SUM(t_tokens) AS total, SUM(w) AS W FROM s),
b AS (SELECT {by_col}, t_tokens,
             ((SELECT total FROM g) * {budget_num} // {budget_den})
               * w // (SELECT W FROM g) AS b_target
      FROM s),
k AS (SELECT d.{by_col},
             COUNT(*) AS n_kept, SUM({tokens_expr}) AS kept_tokens
      FROM {table} d JOIN b ON d.{by_col} = b.{by_col}
      WHERE CAST({hb} AS HUGEINT) * b.t_tokens
            < CAST(b.b_target AS HUGEINT) * {1 << 20}
      GROUP BY d.{by_col})
SELECT b.{by_col}, CAST(b.t_tokens AS BIGINT) AS t_tokens,
       CAST(b.b_target AS BIGINT) AS b_target,
       COALESCE(k.n_kept, 0) AS n_kept,
       CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM b LEFT JOIN k ON b.{by_col} = k.{by_col}
"""


def deterministic_shuffle(df: DataFrame, seed: int = 7,
                          n_buckets: int = 1024,
                          id_col: str = "doc_id") -> DataFrame:
    """Reproducible global training-order shuffle: every row gets a
    position ``(bucket, pos)`` derived only from ``(id, seed)`` —
    identical on every run, cluster, and engine, unlike
    ``df.orderBy(rand())``.  Reading buckets in order, each sorted by
    ``pos``, yields the full shuffled epoch; a different ``seed``
    yields an independent permutation.

    Scale (100 TB): a single global ``row_number`` would funnel the
    corpus through ONE partition — instead the md5 key is split into
    a bucket prefix (the shuffle/write partition) and a within-bucket
    rank, so the only window function runs per-bucket (corpus/1024
    rows of state, embarrassingly parallel).  Lexicographic
    ``(bucket, pos)`` IS the global order."""
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                          F.lit(str(seed))))
    bucket = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
              % F.lit(n_buckets))
    w = W.partitionBy("shuffle_bucket").orderBy("_h", id_col)
    return (df.select(id_col, h.alias("_h"),
                      bucket.alias("shuffle_bucket"))
            .withColumn("shuffle_pos", F.row_number().over(w))
            .drop("_h"))


def deterministic_shuffle_sql(seed: int = 7, n_buckets: int = 1024,
                              id_col: str = "doc_id",
                              table: str = "documents") -> str:
    """DuckDB twin of :func:`deterministic_shuffle`."""
    return f"""
WITH keyed AS (
  SELECT {id_col},
         MD5(CAST({id_col} AS VARCHAR) || ':' || '{seed}') AS h
  FROM {table}),
b AS (
  SELECT {id_col}, h,
         ('0x' || SUBSTRING(h, 1, 4))::INTEGER % {n_buckets}
           AS shuffle_bucket
  FROM keyed)
SELECT {id_col}, shuffle_bucket,
       CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_bucket
                               ORDER BY h, {id_col}) AS BIGINT)
         AS shuffle_pos
FROM b
"""


def shard_pack(df: DataFrame, budget: int, tokens: Column, *,
               seed: int = 7, n_buckets: int = 32,
               source_col: str = "source",
               id_col: str = "doc_id") -> DataFrame:
    """Token-budget training-shard assignment: within each source,
    documents fill shard 0 until ``budget`` tokens, then shard 1, …
    — the corpus -> fixed-size-training-files packing step.  The fill
    order is the x23 deterministic-shuffle order (md5(id:seed)), so
    shards are reproducible across runs and engines, and adding a
    source never perturbs another source's shards.

    A document's shard is decided by its START offset in the
    source's token stream (greedy sequential fill; a doc may straddle
    the boundary — standard, and exact-integer deterministic).

    Scale (100 TB): a naive per-source running sum is ONE window task
    per source — a giant source serializes.  Instead the x27/x23
    two-pass cumulative sum: the within-window sort runs per
    (source, bucket) — corpus/(sources*buckets) rows of state — and
    bucket offsets come from a window over the (source, bucket)
    totals frame (sources x ``n_buckets`` rows, broadcast back).
    Returns one row per (source, shard_id): doc and token counts."""
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                          F.lit(str(seed))))
    bucket = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
              % F.lit(n_buckets))
    base = df.select(source_col, F.col(id_col).alias("_id"),
                     tokens.cast("long").alias("_tok"),
                     h.alias("_h"), bucket.alias("_bkt"))
    win = (W.partitionBy(source_col, "_bkt").orderBy("_h", "_id")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    base = base.withColumn("_cum_in", F.sum("_tok").over(win))
    btot = (base.groupBy(source_col, "_bkt")
            .agg(F.sum("_tok").alias("_btot")))
    woff = (W.partitionBy(source_col).orderBy("_bkt")
            .rowsBetween(W.unboundedPreceding, -1))
    off = (btot.withColumn(
        "_off", F.coalesce(F.sum("_btot").over(woff), F.lit(0)))
        .select(source_col, "_bkt", "_off"))
    packed = (base.join(F.broadcast(off), [source_col, "_bkt"])
              .withColumn("_start", F.col("_off") + F.col("_cum_in")
                          - F.col("_tok"))
              .withColumn("shard_id",
                          F.expr(f"_start div {budget}").cast("long")))
    return (packed.groupBy(source_col, "shard_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_tok").alias("shard_tokens")))


def shard_pack_sql(budget: int, tokens_expr: str, *, seed: int = 7,
                   n_buckets: int = 32, source_col: str = "source",
                   id_col: str = "doc_id",
                   table: str = "documents") -> str:
    """DuckDB twin of :func:`shard_pack` — structurally different
    (one straight per-source window over the same total order), same
    exact integers."""
    return f"""
WITH keyed AS (
  SELECT {source_col} AS src, {id_col} AS id,
         CAST({tokens_expr} AS BIGINT) AS tok,
         MD5(CAST({id_col} AS VARCHAR) || ':' || '{seed}') AS h
  FROM {table}),
b AS (
  SELECT src, id, tok, h,
         ('0x' || SUBSTRING(h, 1, 4))::INTEGER % {n_buckets} AS bkt
  FROM keyed),
c AS (
  SELECT src, tok,
         SUM(tok) OVER (PARTITION BY src ORDER BY bkt, h, id
                        ROWS UNBOUNDED PRECEDING) - tok AS start
  FROM b)
SELECT src AS {source_col},
       CAST(start // {budget} AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS shard_tokens
FROM c GROUP BY src, start // {budget}
"""
