"""samplebatchprocessing_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of danilop/SampleBatchProcessing (an
S3+SQS+EC2 file-granular batch pipeline, see /root/reference) as an
idiomatic Spark DataFrame/SQL engine, and extends it with the
relational + LLM-data-pipeline operator surface declared in SURVEY.md §2B.

Layout:
- ``session``   — SparkSession builder (AQE on, UTC, arrow on)
- ``catalog``   — fixture-table loading / temp-view registration
- ``exprs``     — determinism helpers (exact decimal sums, rounding)
- ``operators`` — reusable composite operators (dedup, similarity,
                  text analysis, as-of join, sessionization, top-k)
- ``pipeline``  — the reference's manifest pipeline semantics (P8):
                  manifest DF -> per-file transform -> idempotent sink
- ``streaming`` — Structured Streaming jobs (S1-S8)
- ``queries``   — the declared query registry keyed by SURVEY §2B ids,
                  each with a DuckDB oracle SQL twin
"""

__version__ = "0.1.0"
