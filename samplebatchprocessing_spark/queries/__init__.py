"""Declared query registry, keyed by SURVEY.md §2B operator ids.

Each entry: name -> (spark_fn, oracle_sql_or_None) where
``spark_fn(spark, sf_dir) -> DataFrame`` and the SQL twin is ANSI SQL
runnable by DuckDB over the pre-registered fixture views.  Entries
with ``None`` oracle are property/parity-checked ops (sketches,
streaming internals) that get the driver's rows-only check.

Determinism contract (SURVEY §2B canonicalization): every output
column is int/str/bool/date/exact-double/array-thereof; all summing
aggregates use exact decimal arithmetic (see ``exprs``); every
LIMIT/window ordering carries a total-order tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]
Entry = tuple[SparkFn, str | None]

# The driver's CORRECTNESS gate samples the FIRST 50 registry entries
# (dict order).  Through round 4 the registry was composed module-first,
# so that window was 41x relational queries and the P/S/D/L operator
# families never received a driver-green row.  DRIVER_WINDOW pins a
# curated, family-interleaved first 50: one anchor per SURVEY §2B
# family up front (so even a smaller window stays representative),
# then depth on the families that previously lacked driver evidence
# (P, S, D, L), then extended-inventory breadth (dedup clusters,
# multimodal, curation, TPC-H, maintenance).  The invariant — exactly
# 50 names, all present in the registry, all 11 §2B families covered —
# is locked by tests/test_registry_order.py.
DRIVER_WINDOW: tuple[str, ...] = (
    # one anchor per §2B family: P Q J A W T U F S D L
    "p1_parquet_scan", "q1_project_compute", "j1_inner_join",
    "a1_pricing_summary", "w1_ranking", "t3_global_topk", "u1_union",
    "f1_string", "s2_tumbling_batch", "d2_pandas_udf", "l2_tokenize",
    # depth on P/S/D/L (+ the new a12 contract row), round-robin
    "p2_csv_roundtrip", "s1_stream_scan", "d1_scalar_udf", "l4_tfidf",
    "p3_csv_infer", "s2_tumbling_window", "d3_apply_in_pandas",
    "l5_jaccard_pairs",
    "p4_json_roundtrip", "s3_sliding_window", "d4_map_in_pandas",
    "l7_cosine_topk",
    "p6_parquet_sink", "s4_session_window", "d5_udtf_explode",
    "l1_exact_dedup",
    "p7_partitioned_sink", "s5_watermark_append", "d6_udaf_grouped",
    "l3_token_counts",
    "p8_manifest_pipeline", "s6_stream_dedup", "a12_two_phase",
    "l6_minhash_lsh",
    "l9_binary_ingest", "s7_stateful_agg", "l8_sim_join",
    "l10_lang_stats", "s8_foreach_batch_sink",
    # extended-inventory breadth (r5: x47/x48 replace x19/x6 — the
    # heavy-hitter and plain-split rows are strictly subsumed by the
    # k-means report and the cluster-aware split, which carry the
    # round's new first-class evidence; r5 wave 2 swaps the thin
    # lang-ID row for the DSIR flagship, whose lambda-table +
    # integer-dot-product chain is the round's widest new surface —
    # x1's predicate is fully exercised inside x9/x20 anyway)
    "l11_dedup_clusters", "mm1_image_features", "x65_dsir_weights",
    "x48_cluster_safe_split", "x13_contamination", "v8_tpch_q3",
    "m1_upsert", "x47_kmeans_clusters", "x20_pretrain_pipeline",
    "x25_funnel",
)


def registry() -> dict[str, Entry]:
    from . import (analytics, llm, relational, scalar_funcs, sources,
                   sqlapi, streaming, udf)

    merged: dict[str, Entry] = {}
    for mod in (relational, scalar_funcs, llm, udf, sources, streaming,
                sqlapi, analytics):
        for name, entry in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = entry

    out: dict[str, Entry] = {}
    for name in DRIVER_WINDOW:  # KeyError here = window names a missing query
        out[name] = merged.pop(name)
    out.update(merged)
    return out
