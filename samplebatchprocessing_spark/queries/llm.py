"""LLM-data-pipeline queries (SURVEY §2B L1-L10 + the north-star
text-analysis operators), over the documents/embeddings fixtures.

The implementations live in operators/{text,dedup,similarity}.py;
these wrappers pin the declared parameters (thresholds, k, blocking
keys — part of the semantics) and pair each with its DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import sql_davg
from ..operators import dedup, similarity, text
from ..operators.text import token_set_sql, tokenize_sql


def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(doc)


def l2_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: normalization + tokenization (order-preserving list plus
    canonical sorted set), serialized to JSON strings per the §2B
    canonicalization protocol (driver comparator needs scalar cells).
    ``operators.text.tokenize`` remains the raw-array API."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.to_json(text.tokenize(F.col("text"))).alias("tokens"),
        F.to_json(text.token_set(F.col("text"))).alias("token_set"),
        F.size(text.tokenize(F.col("text"))).alias("n_tokens"),
    )


L2_SQL = f"""
SELECT doc_id,
       CAST(TO_JSON({tokenize_sql('text')}) AS VARCHAR) AS tokens,
       CAST(TO_JSON({token_set_sql('text')}) AS VARCHAR) AS token_set,
       LEN({tokenize_sql('text')}) AS n_tokens
FROM documents
"""


def l3_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return text.token_counts(doc)


def l4_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return text.tfidf(doc)


def l5_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(doc, threshold=0.8, band_width=10)


L5_SQL = f"""
WITH s AS (SELECT doc_id, {token_set_sql('text')} AS toks FROM documents),
b AS (SELECT doc_id, toks, CAST(FLOOR(LEN(toks) / 10) AS INT) AS band FROM s)
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       CAST(LEN(LIST_INTERSECT(a.toks, c.toks)) AS DOUBLE)
         / (LEN(a.toks) + LEN(c.toks) - LEN(LIST_INTERSECT(a.toks, c.toks)))
         AS jaccard
FROM b a JOIN b c ON a.band = c.band AND a.doc_id < c.doc_id
WHERE CAST(LEN(LIST_INTERSECT(a.toks, c.toks)) AS DOUBLE)
      / (LEN(a.toks) + LEN(c.toks) - LEN(LIST_INTERSECT(a.toks, c.toks))) >= 0.8
"""


def l5_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(doc, n=2, threshold=0.6, band_width=10)


_NGRAMS = (f"LIST_SORT(LIST_DISTINCT(LIST_TRANSFORM("
           f"RANGE(1, LEN({tokenize_sql('text')})), "
           f"i -> {tokenize_sql('text')}[i] || ' ' || {tokenize_sql('text')}[i+1])))")

L5_NGRAM_SQL = f"""
WITH s AS (SELECT doc_id, {_NGRAMS} AS toks FROM documents),
b AS (SELECT doc_id, toks, CAST(FLOOR(LEN(toks) / 10) AS INT) AS band FROM s)
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       CAST(LEN(LIST_INTERSECT(a.toks, c.toks)) AS DOUBLE)
         / (LEN(a.toks) + LEN(c.toks) - LEN(LIST_INTERSECT(a.toks, c.toks)))
         AS jaccard
FROM b a JOIN b c ON a.band = c.band AND a.doc_id < c.doc_id
WHERE CAST(LEN(LIST_INTERSECT(a.toks, c.toks)) AS DOUBLE)
      / (LEN(a.toks) + LEN(c.toks) - LEN(LIST_INTERSECT(a.toks, c.toks))) >= 0.6
"""


def l6_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: deterministic (fixed seeds) but engine-specific hashing ->
    rows-only driver check; recall/precision property-tested in
    tests/test_operators.py against L5 ground truth."""
    doc = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(doc)


def l6_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (Arrow/numpy path) — rows-only check."""
    doc = load_table(spark, sf_dir, "documents")
    return dedup.simhash(doc)


def l7_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, F.col("vec_id") % 50 == 0, k=5)


_COS_QC = similarity.cosine_sql_expr("q.embedding", "c.embedding")

L7_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, c.vec_id,
         {_COS_QC.replace('q.embedding', 'q.embedding').replace('c.embedding', 'c.embedding')} AS cosine
  FROM q, embeddings c WHERE c.vec_id <> q.query_id
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


def l7_topk_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 scale path (Arrow numpy kernel) — rows-only driver check;
    equality to the exact operator property-tested in pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk_numpy(
        emb, F.col("vec_id") % 50 == 0, k=5)


def l7_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 ANN variant (hyperplane-LSH bucketing) — rows-only check,
    recall property-tested vs exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, F.col("vec_id") % 50 == 0, k=5)


def l8_sim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.sim_join(emb, threshold=0.3, block_col="label")


_COS_AB = similarity.cosine_sql_expr("a.embedding", "b.embedding")

L8_SQL = f"""
SELECT a.label AS blk, a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_COS_AB}, 6) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_COS_AB} >= 0.3
"""


def l9_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9/P5: multimodal binary ingest — every fixture parquet file
    as an opaque blob with typed metadata (reference semantics R1/R6:
    files are byte blobs, content never inspected — SendJobs.py:16,
    GetJobs.py:48-50).  md5(content) parity vs python hashlib is
    asserted in tests (DuckDB 1.0 cannot hash blobs)."""
    # pathGlobFilter, not a literal glob path: a glob in load() makes
    # the streaming-sink metadata probe log a WARN+stack (noise).
    bf = (spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.parquet")
          .load(sf_dir.rstrip("/")))
    return bf.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("file_name"),
        F.col("length").alias("size"),
    )


L9_SQL = """
SELECT parse_filename(filename) AS file_name, size
FROM read_blob('/root/testdata/sf0.01/*.parquet')
"""


def l11_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L11 (beyond the survey list): duplicate-cluster assignment —
    connected components over the Jaccard>=0.9 near-dup graph.
    Iterative (label propagation) -> non-SQL-expressible, rows-only
    driver check; union-find equality in tests."""
    doc = load_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(doc, threshold=0.9)
    return dedup.dedup_clusters(pairs)


def l10_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return (
        doc.filter(F.col("lang").isin("es", "de", "fr"))
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.round(F.avg("n_chars"), 6).alias("avg_chars"))
    )


L10_SQL = """
SELECT lang, source, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
       ROUND(AVG(n_chars), 6) AS avg_chars
FROM documents WHERE lang IN ('es', 'de', 'fr')
GROUP BY lang, source
"""


def l7_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 ANN variant 2: IVF cell-probed cosine top-k — rows-only
    driver check; planted-neighbor recall property-tested."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, F.col("vec_id") % 50 == 0, k=5,
                               n_cells=16, n_probe=4)


def l12_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (north-star dedup family),
    blocked by label.  Threshold 0.4 is calibrated to the fixture
    (uniform-ish vectors, max pair cosine ~0.51)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_pairs(emb, threshold=0.4,
                                         block_col="label")


_COS_ND = similarity.cosine_sql_expr("a.embedding", "b.embedding")

L12_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_COS_ND}, 6) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND({_COS_ND}, 6) >= 0.4
"""


def x5_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish regex path (north-star text analysis)."""
    doc = load_table(spark, sf_dir, "documents")
    return text.bpe_token_counts(doc)


def x6_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split + per-split corpus stats
    (training-data management; same doc -> same split on any run,
    cluster, or engine)."""
    from ..operators import sampling
    doc = load_table(spark, sf_dir, "documents")
    split = sampling.train_val_test_split(doc)
    return (split.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.length("text")).alias("total_chars"),
                 F.countDistinct("lang").alias("n_langs")))


def _x6_sql() -> str:
    from ..operators.sampling import hash_bucket_sql
    b = hash_bucket_sql("doc_id")
    return f"""
SELECT CASE WHEN {b} < 80 THEN 'train'
            WHEN {b} < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       SUM(LENGTH(text)) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents GROUP BY 1
"""


def x7_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-per-language stratified sample."""
    from ..operators import sampling
    doc = load_table(spark, sf_dir, "documents")
    return (sampling.stratified_sample(doc, "lang", k=5)
            .select("doc_id", "lang", "source"))


def _x7_sql() -> str:
    from ..operators.sampling import hash_bucket_sql
    h = hash_bucket_sql("doc_id", 1 << 30)
    return f"""
SELECT doc_id, lang, source
FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {h}, doc_id) <= 5
"""


def x8_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: contiguous-cumulative 2048-token context
    bins per language shard."""
    from ..operators import sampling
    doc = load_table(spark, sf_dir, "documents")
    return sampling.pack_sequences(doc, budget=2048)


X8_SQL = f"""
WITH t AS (SELECT doc_id, lang,
                  LEN({tokenize_sql('text')}) AS n_tokens
           FROM documents)
SELECT doc_id, lang, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) / 2048.0) AS BIGINT) AS bin
FROM t
"""


def x9_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline — the composition a training-data
    run actually executes: quality gate -> exact-dedup keep-first ->
    per-(split, lang) corpus stats.  One pass of row-local scoring,
    one dedup shuffle, one stats shuffle."""
    from ..operators import sampling
    doc = load_table(spark, sf_dir, "documents")
    q = text.quality_features(doc).filter(F.col("keep"))
    kept = (doc.join(q.select("doc_id"), "doc_id")
            .withColumn("content_hash", F.md5("text")))
    w = W.partitionBy("content_hash").orderBy("doc_id")
    deduped = (kept.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1))
    split = sampling.train_val_test_split(deduped)
    return (split.groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.length("text")).alias("total_chars")))


def _x9_sql() -> str:
    from ..operators.sampling import hash_bucket_sql
    b = hash_bucket_sql("doc_id")
    return f"""
WITH q AS (
  SELECT doc_id FROM documents
  WHERE LEN({tokenize_sql('text')}) BETWEEN 10 AND 1000
    AND CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        / LENGTH(text) > 0.5),
kept AS (
  SELECT d.* FROM documents d JOIN q USING (doc_id)),
deduped AS (
  SELECT * FROM kept
  QUALIFY ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) = 1)
SELECT CASE WHEN {b} < 80 THEN 'train'
            WHEN {b} < 90 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs, SUM(LENGTH(text)) AS total_chars
FROM deduped GROUP BY 1, 2
"""


def mm1_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: binary image column -> decoded features via
    mapInPandas (deterministic stub decoder; rows-only check,
    shape/determinism pytest-verified)."""
    from ..operators import multimodal as mm
    media = mm.media_table_from_fixture(spark, sf_dir, "image")
    return mm.image_features(media)


def mm2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: video frame sampling over typed metadata."""
    from ..operators import multimodal as mm
    vid = mm.media_table_from_fixture(spark, sf_dir, "video")
    return mm.frame_sample(vid, every_n=10)


def mm3_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: PCM-interpreted audio stats via mapInPandas."""
    from ..operators import multimodal as mm
    media = mm.media_table_from_fixture(spark, sf_dir, "image")
    return mm.audio_features(media)


def x4_text_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance text similarity (dedup adjunct): levenshtein
    between each doc's head and its source tag; self-joins on tiny
    prefixes stay bounded."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.levenshtein(F.substring("text", 1, 20),
                      F.substring("text", 11, 20)).alias("head_shift_dist"),
        F.levenshtein("lang", "source").alias("lang_src_dist"),
    )


X4_SQL = """
SELECT doc_id,
       LEVENSHTEIN(SUBSTRING(text, 1, 20), SUBSTRING(text, 11, 20)) AS head_shift_dist,
       LEVENSHTEIN(lang, source) AS lang_src_dist
FROM documents
"""


def x1_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return text.lang_id(doc)


def x2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return text.quality_features(doc)


def x3_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        text.fingerprint(F.col("text")).alias("fp"),
        (text.fingerprint(F.col("text")) % 1024).alias("fp_shard"),
    )


X3_SQL = f"""
SELECT doc_id,
       {text.FINGERPRINT_SQL_EXPR} AS fp,
       {text.FINGERPRINT_SQL_EXPR} % 1024 AS fp_shard
FROM documents
"""


QUERIES: dict[str, tuple] = {
    "l1_exact_dedup": (l1_exact_dedup, dedup.EXACT_DEDUP_SQL),
    "l2_tokenize": (l2_tokenize, L2_SQL),
    "l3_token_counts": (l3_token_counts, text.TOKEN_COUNTS_SQL),
    "l4_tfidf": (l4_tfidf, text.TFIDF_SQL),
    "l5_jaccard_pairs": (l5_jaccard_pairs, L5_SQL),
    "l5_ngram_jaccard": (l5_ngram_jaccard, L5_NGRAM_SQL),
    "l6_minhash_lsh": (l6_minhash_lsh, None),
    "l6_simhash": (l6_simhash, None),
    "l7_cosine_topk": (l7_cosine_topk, L7_SQL),
    "l7_topk_numpy": (l7_topk_numpy, None),
    "l7_topk_lsh": (l7_topk_lsh, None),
    "l8_sim_join": (l8_sim_join, L8_SQL),
    "l9_binary_ingest": (l9_binary_ingest, L9_SQL),
    "l10_lang_stats": (l10_lang_stats, L10_SQL),
    "l11_dedup_clusters": (l11_dedup_clusters, None),
    "l7_topk_ivf": (l7_topk_ivf, None),
    "l12_embedding_neardup": (l12_embedding_neardup, L12_SQL),
    "x5_bpe_token_counts": (x5_bpe_token_counts, text.BPE_COUNTS_SQL),
    "x6_train_split": (x6_train_split, _x6_sql()),
    "x7_stratified_sample": (x7_stratified_sample, _x7_sql()),
    "x8_pack_sequences": (x8_pack_sequences, X8_SQL),
    "x9_corpus_curation": (x9_corpus_curation, _x9_sql()),
    "mm1_image_features": (mm1_image_features, None),
    "mm2_frame_sample": (mm2_frame_sample, None),
    "mm3_audio_features": (mm3_audio_features, None),
    "x4_text_distance": (x4_text_distance, X4_SQL),
    "x1_lang_id": (x1_lang_id, text.LANG_ID_SQL),
    "x2_quality_score": (x2_quality_score, text.QUALITY_SQL),
    "x3_fingerprint": (x3_fingerprint, X3_SQL),
}
